package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Deterministic sampling pack. RNG-based `df.sample` is
  * non-reproducible across engines, partitionings and reruns — useless
  * for auditable pipeline cuts. Universe (hash) sampling instead keeps
  * a row iff a stable hash of its key lands under a threshold:
  * reproducible everywhere, consistent across tables (the same key
  * always samples in or out — joins between sampled tables stay
  * coherent), and embarrassingly parallel (a pushed-down filter, no
  * shuffle, no coordination). md5 is the hash because every engine
  * agrees on it bit-for-bit.
  */
object Sampling {

  /** Keep rows whose md5(key) first hex digit is strictly below the
    * (possibly per-row) hex-digit threshold — rate = threshold/16.
    */
  def universeFilter(key: Column, hexThreshold: Column): Column =
    substring(md5(key), 1, 1) < hexThreshold

  /** Fixed-rate form: keep `hexSixteenths`/16 of rows (1..15 — 0 and
    * 16 have no single-hex-digit representation; use the full table or
    * an empty filter instead).
    */
  def universeFilter(key: Column, hexSixteenths: Int): Column = {
    require(hexSixteenths >= 1 && hexSixteenths <= 15,
      s"rate must be 1..15 sixteenths, got $hexSixteenths")
    universeFilter(key, lit(Integer.toHexString(hexSixteenths)))
  }

  /** Stratified universe sample of lineitem on the line's stable key
    * with per-stratum rates (A: 4/16, N: 2/16, R: 1/16), verified by
    * aggregating the kept rows per stratum. The rate lookup is a CASE
    * on the stratum column — still one pushable filter, no shuffle
    * until the audit aggregation.
    */
  def stratified(s: SparkSession, dir: String): DataFrame = {
    val key = concat_ws("-", col("l_orderkey"), col("l_linenumber"))
    val threshold = when(col("l_returnflag") === "A", lit("4"))
      .when(col("l_returnflag") === "N", lit("2"))
      .otherwise(lit("1"))
    load(s, dir, "lineitem")
      .filter(universeFilter(key, threshold))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_sampled"),
        round(sum(col("l_extendedprice")), 2).as("sampled_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Deterministic train/val/test split — the holdout boundary every
    * training pipeline fixes before any model sees data. The same
    * universe-hash argument as the samplers: a row's split is a pure
    * function of its key (`md5` first hex digit: `0..d` train = 14/16,
    * `e` val = 1/16, `f` test = 1/16), so membership is reproducible
    * on any engine, stable under re-partitioning and re-runs, and a
    * document can never migrate between splits when the corpus grows —
    * the property RNG splits lose. Per-doc assignment is a narrow
    * codegen'd projection (no shuffle); the audit aggregation is the
    * oracled query.
    */
  def splitAssign(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        when(substring(md5(col("doc_id").cast("string")), 1, 1) < "e",
          "train")
          .when(substring(md5(col("doc_id").cast("string")), 1, 1) === "e",
            "val")
          .otherwise("test").as("split"))

  /** (split, n_docs, n_chars): the split manifest a pipeline records
    * next to the corpus snapshot.
    */
  def splitAudit(s: SparkSession, dir: String): DataFrame =
    splitAssign(s, dir)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy(col("split"))

  /** Temporal split cutoff (days since 2024-01-01) and embargo width
    * for [[temporalSplit]].
    */
  val TemporalCut = 20L
  val TemporalEmbargo = 3L

  /** Time-based train/test split with an EMBARGO gap (graded
    * `split_temporal`): train = days before [[TemporalCut]], test =
    * days at or after cut + [[TemporalEmbargo]], and the embargo rows
    * between are assigned to NEITHER — the quarantine that stops
    * boundary leakage (a model must not train on the minutes before
    * its eval window; autocorrelated series leak across a sharp cut,
    * the standard protocol in financial ML backtests). The graded
    * report is the split audit a pipeline logs: per split, event and
    * user counts and the day range actually realized — the overlap
    * check (max train day < min test day, gap ≥ embargo) is then one
    * glance. Complements [[leakageSafeSplit]]: that one keys the
    * split on CONTENT (near-dup clusters), this one on TIME.
    *
    * Exactness: day indices and counts are exact integers
    * (count(DISTINCT user) included). One map-side-combinable
    * aggregation over a 3-way integer bucketing — no joins, 3 rows out.
    */
  def temporalSplit(s: SparkSession, dir: String): DataFrame =
    graft.Tables.events(s, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .cast("long").as("d"))
      .withColumn("split",
        when(col("d") < TemporalCut, "train")
          .when(col("d") < TemporalCut + TemporalEmbargo, "embargo")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("d")).as("min_day"), max(col("d")).as("max_day"))
      .orderBy(col("split"))

  /** Exact-quota sampling: exactly k rows per stratum, the rows whose
    * md5(key) ranks lowest — a deterministic reservoir. Rate-based
    * sampling (above) can't promise "give me exactly 25 eval rows per
    * segment"; this can, stays engine-reproducible, and its plan is the
    * top-k-per-group shape (partial WindowGroupLimit inside each scan
    * partition before the single shuffle), not a global sort.
    */
  val QuotaK = 25

  def quotaSample(s: SparkSession, dir: String): DataFrame = {
    val key = col("o_orderkey").cast("string")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority")).orderBy(col("h"), col("o_orderkey"))
    load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        md5(key).as("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= QuotaK)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
        col("o_custkey"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  /** The leakage problem `splitAssign` has and this fixes: hashing the
    * DOC id sends near-duplicate documents to independent splits, so a
    * model evaluated on `val` has effectively seen its near-twins in
    * `train` — the contamination that inflates held-out metrics (the
    * published dedup pipelines split AFTER clustering for exactly this
    * reason). Here the split is a pure function of the near-dup
    * CLUSTER representative (min doc_id of the J ≥ 0.5 component;
    * singletons represent themselves), so an entire cluster moves as
    * one unit and near-twins can never straddle a split boundary —
    * while keeping every universe-hash property (reproducible, stable
    * under corpus growth, no RNG).
    *
    * Scale shape: the cluster labels come from the Hash-to-Min CC
    * loop (all equi-joins); the join-back to docs is an equi-join on
    * doc_id against the only-docs-with-edges label frame (≪ corpus);
    * the split CASE is the same narrow codegen projection as
    * `splitAssign`. Nothing new shuffles the corpus.
    */
  def leakageSafeSplitFrom(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val rep = docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster"), col("doc_id")))
    rep.select(col("doc_id"), col("rep"),
      when(substring(md5(col("rep").cast("string")), 1, 1) < "e", "train")
        .when(substring(md5(col("rep").cast("string")), 1, 1) === "e", "val")
        .otherwise("test").as("split"))
  }

  /** Per-doc leakage-safe manifest over the corpus (oracled as
    * `split_leakage_safe`).
    */
  def leakageSafeSplit(s: SparkSession, dir: String): DataFrame =
    leakageSafeSplitFrom(
      load(s, dir, "documents").select(col("doc_id")),
      Dedup.clusters(s, dir))
      .orderBy(col("doc_id"))

  /** Deterministic weighted sampling without replacement (Efraimidis–
    * Spirakis 2006): each row draws u from ITS OWN md5 (the first 13
    * hex digits over 2⁵², an exact power-of-two division, so u is
    * bit-identical on any engine) and the k rows with the smallest
    * key = −ln(u)/w win — inclusion probability ∝ weight, here
    * n_chars, the "sample long documents proportionally more" knob a
    * curator uses for importance-weighted eval sets. Same universe-
    * hash virtues as the unweighted samplers: reproducible, stable
    * under re-partitioning, no RNG state.
    *
    * ln is ~1-ulp across engines, which can only flip the SELECTED
    * set if two keys collide to within that ulp (astronomically
    * unlikely over md5 draws); the OUTPUT columns are exact integers,
    * so the query hash-oracles. u is clamped to the smallest positive
    * double before the log: an all-zero 13-hex md5 prefix (~2e-16 per
    * doc) would give u=0, where Spark's log(0) is NULL (sorts FIRST
    * ascending → wrongly selected at rank 1) while DuckDB's -ln(0)/w
    * is +inf (sorts last) — the clamp makes both engines rank such a
    * doc by the same astronomically-large finite key. Plan: narrow
    * projection + TakeOrderedAndProject (partial per-partition top-k,
    * no global sort).
    */
  val WeightedK = 50

  /** Smallest positive double — the u=0 clamp floor; 5e-324 parses to
    * the identical denormal in DuckDB's oracle SQL.
    */
  private val UFloor = java.lang.Double.MIN_VALUE

  def weightedSample(s: SparkSession, dir: String): DataFrame = {
    val u = greatest(
      conv(substring(md5(col("doc_id").cast("string")), 1, 13),
        16, 10).cast("long").cast("double") / lit(4503599627370496.0), // 2^52
      lit(UFloor))
    load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .withColumn("es_key", -log(u) / col("n_chars"))
      .orderBy(col("es_key"), col("doc_id"))
      .limit(WeightedK)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("es_key"), col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("n_chars"))
  }

  /** Per-stratum weighted quota: [[weightedSample]]'s selection rule
    * applied within each language — exactly k docs per lang, chosen
    * with probability ∝ n_chars. The grouped form matters at scale
    * because its plan is the top-k-per-group shape (partial
    * WindowGroupLimit inside each scan partition BEFORE the single
    * hash shuffle on lang), not a global sort — the same shape
    * `sample_quota` pins.
    */
  val WeightedGroupK = 10

  def weightedQuota(s: SparkSession, dir: String): DataFrame = {
    val u = greatest(
      conv(substring(md5(col("doc_id").cast("string")), 1, 13),
        16, 10).cast("long").cast("double") / lit(4503599627370496.0),
      lit(UFloor))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("es_key"), col("doc_id"))
    load(s, dir, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars"),
        (-log(u) / col("n_chars")).as("es_key"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= WeightedGroupK)
      .select(col("lang"), col("rank"), col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("rank"))
  }

  /** The contamination MEASUREMENT the leakage-safe split removes:
    * how many near-dup pairs (J ≥ 0.5) the naive doc-id split lets
    * straddle each split boundary. (train,val) and (train,test) rows
    * here are exactly the pairs that inflate held-out metrics;
    * same-split rows are harmless. Both split columns come from the
    * NAIVE assignment on purpose — run next to `split_leakage_safe`
    * (where every cross-split count is zero by construction) to see
    * what switching buys.
    *
    * Scale: the pair frame is the shingle-index equi-join (already
    * bucketed, never all-pairs); the two split lookups are narrow
    * md5 projections joined by doc id; output is ≤ 6 rows.
    */
  def splitContamination(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(s, dir)
      .select(col("id_a"), col("id_b"))
    val splits = splitAssign(s, dir).select(col("doc_id"), col("split"))
    pairs
      .join(splits.toDF("doc_id", "split_of_a"), col("id_a") === col("doc_id"))
      .drop("doc_id")
      .join(splits.toDF("doc_id", "split_of_b"), col("id_b") === col("doc_id"))
      .select(least(col("split_of_a"), col("split_of_b")).as("split_a"),
        greatest(col("split_of_a"), col("split_of_b")).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("split_a"), col("split_b"))
  }
}
