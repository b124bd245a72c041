package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Data mixing — the source-weighting step that turns a curated pool
  * into a training mixture: each source gets a token budget from a
  * target weight profile, and documents are admitted per source in a
  * deterministic priority order until the budget fills. This is the
  * "sample the mixture" stage every pretraining pipeline runs after
  * curation (the per-source weights are the tuned knob); no analog in
  * the reference (§2.3 beyond-reference territory).
  *
  * Semantics (all integer-exact, so the SQL oracle reproduces the
  * admission set bit-for-bit):
  *
  *   - weight of `srcK` = max(10 − K, 1) — a linearly decaying integer
  *     profile standing in for the tuned mixture (the operator is
  *     agnostic to the profile; only determinism matters here);
  *   - source budget = corpus_tokens × weight ∕ (2 × Σweights), in
  *     INTEGER arithmetic (the ∕2 is the global 50% take);
  *   - priority = md5(doc_id) — a deterministic corpus-stable shuffle;
  *   - a doc is admitted while the tokens admitted BEFORE it are under
  *     budget; the doc crossing the boundary is kept (concat-then-cut
  *     mixing never wastes a partial window), then the source closes.
  *
  * Shape at scale: one map-side-combinable aggregation for per-source
  * totals (broadcast back — the budget table has one row per SOURCE),
  * then ONE GLOBAL range-partitioned prefix sum over the total order
  * (source, priority, doc_id) via [[DistributedPrefix.exclusiveSum]],
  * REBASED per source by subtracting each source's start offset (the
  * exclusive prefix of per-source totals in source order — a
  * source-count-sized frame, broadcast with the budgets). A
  * `Window.partitionBy(source)` would cap parallelism at the number
  * of sources: a real pretraining mix where one crawl source holds
  * 40% of 100 TB would serialize that source's entire token stream
  * through one task. The range partitioner splits INSIDE a huge
  * source (boundaries are (source, pri) samples), so the hot source
  * spreads across the cluster; the rebase is a broadcast equi-join.
  * Per-source cumsum ≡ global cumsum − source base, exactly, in
  * integer arithmetic. Pinned in PlanSpec: the executed plan carries
  * no window partitioned by `source`/`lang`.
  */
object Mix {

  /** Weight of source `srcK`: max(10 − K, 1). */
  private def weight(src: org.apache.spark.sql.Column) =
    greatest(lit(10) - regexp_extract(src, "[0-9]+", 0).cast("int"), lit(1))
      .cast("long")

  def mixSources(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string").cast("binary")).as("pri"))
    // per-source weights; Σweights and corpus total as 1-row frames.
    // srcs is source-count-sized — cached so its two consumers
    // (totals, budgets) don't each re-scan the corpus to rebuild it
    val srcs = docs.groupBy(col("source"))
      .agg(sum("n_tokens").as("src_tokens"))
      .withColumn("w", weight(col("source")))
      .cache()
    val totals = srcs.agg(sum("w").as("wsum"),
      sum("src_tokens").as("corpus_tokens"))
    // integer budget: corpus × w div (2 × wsum) — `div`, not `/`
    // (Spark's `/` is DOUBLE division; past 2^53 tokens it would
    // corrupt budgets). corpus_tokens × w stays far under 2^63 for
    // any real corpus (100 TB ≈ 2.5e13 tokens × weight ≤ 10).
    // src_base = tokens in all earlier sources (source asc), so the
    // GLOBAL prefix below rebases to a per-source cumsum; the window
    // here runs over the source-count-sized frame, never the corpus.
    val bySrc = Window.orderBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val budgets = srcs.crossJoin(broadcast(totals))
      .select(col("source"), col("src_tokens"),
        expr("corpus_tokens * w div (2 * wsum)").as("budget"),
        coalesce(sum(col("src_tokens")).over(bySrc), lit(0L))
          .as("src_base"))
    DistributedPrefix.exclusiveSum(docs,
        Seq(col("source"), col("pri"), col("doc_id")),
        col("n_tokens"), "global_cum")
      .join(broadcast(budgets), "source")
      .withColumn("cum_before", col("global_cum") - col("src_base"))
      .filter(col("cum_before") < col("budget"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("budget"), col("cum_before"))
      .orderBy(col("doc_id"))
  }

  /** Fixed per-source token budget for the ARRIVAL-TIME mixer (a
    * stream cannot know corpus totals up front, so the budget is the
    * configured knob rather than a derived share).
    */
  val ArrivalBudget = 1000L

  /** Arrival-order admission — the batch form of the streaming mixer
    * ([[graft.streaming.MixStream]]): docs arrive in doc_id order and
    * a source admits while its running token total is under the fixed
    * budget (the doc crossing the boundary is kept, then the source
    * closes — the same boundary rule as [[mixSources]]). This batch
    * twin is the oracle contract the stateful streaming operator must
    * reproduce exactly.
    */
  def mixArrival(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    // same rebased-global-prefix shape as [[mixSources]]: the window
    // runs only over the source-count-sized totals frame
    val bySrc = Window.orderBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = docs.groupBy(col("source"))
      .agg(sum("n_tokens").as("src_tokens"))
      .select(col("source"),
        coalesce(sum(col("src_tokens")).over(bySrc), lit(0L))
          .as("src_base"))
    DistributedPrefix.exclusiveSum(docs,
        Seq(col("source"), col("doc_id")), col("n_tokens"), "global_cum")
      .join(broadcast(bases), "source")
      .withColumn("cum_before", col("global_cum") - col("src_base"))
      .filter(col("cum_before") < lit(ArrivalBudget))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_before"))
      .orderBy(col("doc_id"))
  }

  /** Temperature-based mixture weights over LANGUAGE pools — the
    * multilingual rebalancing scheme of XLM-R (Conneau et al., 2020)
    * and the Gopher/PaLM data recipes: sampling probability
    * p_i ∝ n_i^α with α = ½ lifts low-resource pools above their
    * natural share and damps the dominant one (on this corpus: en
    * falls 0.43 → 0.30, each ~0.14 pool rises to ~0.17) without the
    * degenerate extremes of α = 0 (uniform) or α = 1 (natural).
    *
    * Every number is cross-engine exact: α = ½ is computed via
    * `sqrt` (correctly-rounded IEEE on both engines — a general
    * `pow` is NOT, which is why the exponent is fixed), the weight
    * normalizer sums 6-decimal-quantized weights as DECIMAL
    * (order-free), and the budget is one double multiply + floor of
    * the take (2× corpus tokens — a data-constrained regime, so the
    * upsampling path is exercised: rare pools run > 2 epochs, the
    * dominant one ~1.4, cf. Muennighoff et al. 2023 on multi-epoch
    * training under data constraints).
    *
    * Scale shape: one map-side-combinable aggregation to pool sizes
    * (5-row frame), one 1-row normalizer, broadcast back — the corpus
    * is scanned once.
    */
  def mixTemperature(s: SparkSession, dir: String): DataFrame =
    tempBudgets(s, dir)
      .select(col("lang"), col("pool_tokens"), col("nat_share"),
        col("sample_p"), col("budget"),
        round(col("budget").cast("double") / col("pool_tokens"), 6)
          .as("epochs"))
      .orderBy(col("lang"))

  /** Per-language temperature budgets (shared by [[mixTemperature]]
    * and [[mixUpsample]]): (lang, pool_tokens, nat_share, sample_p,
    * budget). The pools frame is language-count-sized; every
    * consumer broadcasts it.
    */
  private def tempBudgets(s: SparkSession, dir: String): DataFrame = {
    val pools = load(s, dir, "documents")
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy(col("lang"))
      .agg(sum("n_tokens").as("pool_tokens"))
      .withColumn("w", round(sqrt(col("pool_tokens").cast("double")), 6))
      .cache()
    val totals = pools.agg(
      sum(col("w").cast("decimal(38,6)")).as("wsum"),
      sum("pool_tokens").as("corpus_tokens"))
    pools.crossJoin(broadcast(totals))
      .select(col("lang"), col("pool_tokens"),
        round(col("pool_tokens").cast("double") / col("corpus_tokens"), 6)
          .as("nat_share"),
        round(col("w") / col("wsum").cast("double"), 6).as("sample_p"),
        floor(col("corpus_tokens").cast("double") * lit(2)
          * (col("w") / col("wsum").cast("double"))).as("budget"))
  }

  /** The upsampled training manifest [[mixTemperature]]'s budgets
    * imply: each document of pool i appears `budget_i div n_i` times
    * in full, plus once more for the md5-priority prefix filling the
    * remainder (same deterministic priority and keep-the-boundary-doc
    * rule as [[mixSources]]) — the repetition list a data-constrained
    * run feeds the loader, with `epoch` numbering the copies. The
    * explode is by n_copies (≤ ⌈max epochs⌉, a small constant), so
    * output scales as epochs × corpus, never combinatorially.
    */
  def mixUpsample(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string").cast("binary")).as("pri"))
    // rebased global prefix, as in [[mixSources]] — pool_tokens in
    // the broadcast budgets frame gives each lang's base for free
    val byLang = Window.orderBy(col("lang"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val budgets = tempBudgets(s, dir)
      .withColumn("lang_base",
        coalesce(sum(col("pool_tokens")).over(byLang), lit(0L)))
    DistributedPrefix.exclusiveSum(docs,
        Seq(col("lang"), col("pri"), col("doc_id")),
        col("n_tokens"), "global_cum")
      .join(broadcast(budgets), "lang")
      .withColumn("cum_before", col("global_cum") - col("lang_base"))
      .withColumn("n_copies", expr("budget div pool_tokens") +
        when(col("cum_before") < col("budget") % col("pool_tokens"), 1L)
          .otherwise(0L))
      .filter(col("n_copies") >= 1)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("n_copies"),
        explode(sequence(lit(0L), col("n_copies") - 1)).as("epoch"))
      .orderBy(col("doc_id"), col("epoch"))
  }

  /** The mixture audit: realized vs requested share per source — what
    * a pipeline logs to confirm the mix landed (admitted tokens per
    * source, its budget, and the fill ratio). The ratio is one double
    * division of two exact integers — correctly rounded IEEE, so both
    * engines produce the identical bit pattern (an integer-ppm form
    * would overflow int64 at 100 TB: admitted × 10^6 ≈ 10^19).
    */
  def mixAudit(s: SparkSession, dir: String): DataFrame =
    mixSources(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("admitted_tokens"),
        first(col("budget")).as("budget"))
      .select(col("source"), col("n_docs"), col("admitted_tokens"),
        col("budget"),
        round(col("admitted_tokens").cast("double") / col("budget"), 6)
          .as("fill_ratio"))
      .orderBy(col("source"))
}
