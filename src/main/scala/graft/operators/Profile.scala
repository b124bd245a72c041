package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Column profiling — the `ANALYZE TABLE` a pipeline runs before
  * trusting a new dataset: per-column row count, distinct count,
  * min/max, mean and sample standard deviation, in ONE corpus pass.
  *
  * Cross-engine exactness for a VARIANCE profile (the reason this is
  * hash-oracled where engines' built-in `stddev` disagrees in final
  * bits): every value is scaled to an integer (×10⁴ covers the
  * table's ≤ 4 fractional digits) and summed as scale-0 DECIMAL —
  * exact in both engines — so n·Σx² − (Σx)² is an exact integer.
  * Mean and stddev then each take the SAME short chain of
  * correctly-rounded IEEE ops (one cast, two divisions, sqrt) on
  * both engines, and 6-decimal rounding closes the gap.
  *
  * Scale shape: one aggregation, map-side combinable. The four
  * `count(DISTINCT)`s are the only cost to watch — Spark plans them
  * as one Expand (×5 rows) feeding partial aggregates, still one
  * shuffle of (column, value) pairs; [[profileNumericScale]] is the
  * 100 TB relaxation when exactness isn't required.
  *
  * Row-count bound of the exact identity: n·Σx² − (Σx)² on
  * decimal(38,0) with micro-unit values ≈ 1e9 overflows 38 digits
  * near ~1e10 rows, where non-ANSI Spark yields NULL (loud, never
  * silently wrong — overflow on scale-0 decimal nulls, it does not
  * round). Beyond that, profile per-partition/per-day and combine
  * moments, or accept double-precision stddev; the exact form is the
  * ORACLE-GRADE profile, sized for audit slices, not the full lake.
  */
object Profile {

  private val Cols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** x scaled to exact micro-units as a LONG: all profiled columns
    * carry ≤ 4 fractional digits and |x| < 2·10⁵, so v = round(x·10⁴)
    * < 2·10⁹ and v² < 4·10¹⁸ BOTH fit int64 — per-row arithmetic
    * stays in long registers (the previous decimal(38,0) form made
    * the per-row v·v multiply a wide-decimal op, the scan's dominant
    * cost: ~4.4 s of the sf0.1 bench). Only the SUMS are decimal,
    * where overflow is real (10¹² rows × 10¹⁸ ≫ int64); the summed
    * integers are identical, so the hash-oracled output is unchanged.
    */
  private def vint(c: String): Column =
    round(col(c) * 10000, 0).cast("long")

  /** The exact decimal sum of a long column (cast per row — one
    * widening, not a wide multiply). */
  private def dsum(c: Column): Column = sum(c.cast("decimal(38,0)"))

  /** The moment aggregates all three numeric-profile forms share:
    * count + per-column min/max and exact decimal Σx, Σx² over the
    * `v_<col>` fixed-point projections. ONE definition — the cert
    * (profileScaleCert) certifies the same pipeline the profiles
    * run, which is only true while they aggregate the same
    * expressions.
    */
  private def momentAggs: Seq[Column] =
    count(lit(1)).as("n") +: Cols.flatMap { c =>
      Seq(
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c"),
        dsum(col(s"v_$c")).as(s"sx_$c"),
        dsum(col(s"v_$c") * col(s"v_$c")).as(s"sxx_$c"))
    }

  /** The per-column output struct those forms share — exact moments
    * rendered as mean/stddev, with the form-specific distinct field
    * (and any trailing extras) injected by the caller.
    */
  private def statsRow(c: String, distinctField: Column,
      extra: Column*): Column = {
    val n = col("n")
    val sx = col(s"sx_$c")
    val sxx = col(s"sxx_$c")
    struct(Seq(
      lit(c).as("col_name"), n.as("n"),
      distinctField,
      col(s"min_$c").as("min_val"), col(s"max_$c").as("max_val"),
      round(sx.cast("double") / n / lit(10000.0), 6).as("mean"),
      round(sqrt((n * sxx - sx * sx).cast("double")
        / (n * (n - lit(1))) / lit(100000000.0)), 6).as("stddev")) ++
      extra: _*)
  }

  def profileNumeric(s: SparkSession, dir: String): DataFrame = {
    // Two 1-row aggregations crossed at the end, NOT one combined
    // agg: a multi-column countDistinct plans through Expand (every
    // input row replicated once per distinct column), and a combined
    // agg drags the moment sums through that ×5 replication — each
    // replica re-evaluates the decimal widenings, which measured
    // SLOWER than the pre-Expand decimal projection it replaced. The
    // split leaves the moment pass Expand-free and whole-stage
    // codegen'd (long multiply + one widening per row) and the
    // distinct pass replicating only the four source columns.
    val base = load(s, dir, "lineitem").select(Cols.map(col): _*)
    val projected = base
      .select(Cols.map(col) ++ Cols.map(c => vint(c).as(s"v_$c")): _*)
    val ma = momentAggs
    val distinctAggs = Cols.map(c => countDistinct(col(c)).as(s"nd_$c"))
    val a = projected.agg(ma.head, ma.tail: _*)
      .crossJoin(broadcast(
        base.agg(distinctAggs.head, distinctAggs.tail: _*)))
    // one row per column out of the single aggregate row: an inline'd
    // struct array, so the aggregation runs once (not once per column)
    val rows = Cols.map(c =>
      statsRow(c, col(s"nd_$c").as("n_distinct")))
    a.select(inline(array(rows: _*))).orderBy(col("col_name"))
  }

  /** The 100 TB form of [[profileNumeric]]: identical exact moments
    * (count/min/max/mean/stddev from the same scale-0 decimal sums)
    * but `approx_count_distinct` (HLL++, rsd 1%) in place of the four
    * exact `count(DISTINCT)`s. The exact form's only scale cost is
    * the ×5 Expand the multi-distinct planning requires — every input
    * row is replicated once per distinct column before the shuffle;
    * the sketch form aggregates each column into O(1)-state HLL
    * registers instead, so the plan is ONE pass with NO Expand
    * (ProfileSpec pins the node's absence) and the shuffle carries a
    * single combined row per partition. The nd column is
    * engine-specific sketch output, so the query is rows-only by
    * design; ProfileSpec pins it within the configured error of the
    * exact counts, and every other column is pinned equal to the
    * hash-oracled exact profile.
    */
  def profileNumericScale(s: SparkSession, dir: String): DataFrame = {
    // Same two-pass split as [[profileNumeric]], for a different
    // reason: HLL++ is an imperative aggregate, and one imperative
    // function in the agg knocks the WHOLE moment scan out of
    // whole-stage codegen. Separated, the moment pass is the same
    // codegen'd long-arithmetic scan as the exact profile's, and the
    // sketch pass reads only the four source columns into O(1)
    // registers.
    val base = load(s, dir, "lineitem").select(Cols.map(col): _*)
    val projected = base
      .select(Cols.map(col) ++ Cols.map(c => vint(c).as(s"v_$c")): _*)
    val ma = momentAggs
    // graft.functions.HllDistinct = approx_count_distinct with a
    // single-field buffer: bit-identical estimates (HllDistinctSpec),
    // but without the builtin's 1,639-long-column aggregation buffer,
    // whose per-task codegen string assembly dominated this query
    // (~3.2 s of the sf0.1 bench; see OPTIMIZATION_r16.md)
    val sketchAggs = Cols.map(c =>
      graft.functions.HllDistinct.fp(col(c), 0.01).as(s"nd_$c"))
    val a = projected.agg(ma.head, ma.tail: _*)
      .crossJoin(broadcast(
        base.agg(sketchAggs.head, sketchAggs.tail: _*)))
    val rows = Cols.map(c =>
      statsRow(c, col(s"nd_$c").as("n_distinct_approx")))
    a.select(inline(array(rows: _*))).orderBy(col("col_name"))
  }

  /** Pinned relative tolerance of the HLL distinct sketch vs the
    * exact count in [[profileScaleCert]]: `approx_count_distinct` at
    * rsd 0.01 is a ~1σ estimator, so 0.05 is a 5σ envelope — measured
    * error on these columns is well under 2% (ProfileSpec prints it).
    * A sketch regression (wrong rsd wiring, register corruption)
    * lands far outside it.
    */
  val NdTol = 0.05

  /** Graded `profile_scale_cert`: the `within_tol` recipe (the
    * `media_video_decode` / converged-cert discipline) applied to the
    * scale-mode profile — the one query class that was "rows-only by
    * design" because its HLL distinct column is engine-specific
    * sketch output. The cert grades per column:
    *
    *   - every EXACT statistic (n, n_distinct, min, max, mean,
    *     stddev) — the oracle recomputes all of them, so the moment
    *     pipeline both profile modes share is hash-checked;
    *   - `nd_within_tol` — |HLL estimate − exact| ≤ [[NdTol]]·exact,
    *     a boolean the LIVE sketch must earn (the oracle cannot run
    *     HLL++ and simply expects TRUE): a sketch drifting out of its
    *     error envelope flips the column and fails the driver
    *     compare, which is exactly the regression
    *     `profile_numeric_scale`'s rows-only standing couldn't catch.
    *
    * Cost note: this is a CERT, not the serving path — it runs both
    * the exact multi-distinct (Expand) and the sketch pass to compare
    * them. Production profiling at 100 TB runs
    * [[profileNumericScale]] alone (no Expand); the cert exists to
    * hash-grade that form's sketch against ground truth at testable
    * scale.
    */
  def profileScaleCert(s: SparkSession, dir: String): DataFrame = {
    val base = load(s, dir, "lineitem").select(Cols.map(col): _*)
    val projected = base
      .select(Cols.map(col) ++ Cols.map(c => vint(c).as(s"v_$c")): _*)
    val ma = momentAggs
    val distinctAggs = Cols.map(c => countDistinct(col(c)).as(s"nd_$c"))
    // same compact-buffer HLL as [[profileNumericScale]] — the cert
    // must grade the estimator the serving form actually runs
    val sketchAggs = Cols.map(c =>
      graft.functions.HllDistinct.fp(col(c), 0.01).as(s"nda_$c"))
    val a = projected.agg(ma.head, ma.tail: _*)
      .crossJoin(broadcast(
        base.agg(distinctAggs.head, distinctAggs.tail: _*)))
      .crossJoin(broadcast(
        base.agg(sketchAggs.head, sketchAggs.tail: _*)))
    val rows = Cols.map { c =>
      val nd = col(s"nd_$c")
      statsRow(c, nd.as("n_distinct"),
        (abs(col(s"nda_$c") - nd).cast("double")
          <= lit(NdTol) * nd.cast("double")).as("nd_within_tol"))
    }
    a.select(inline(array(rows: _*))).orderBy(col("col_name"))
  }

  /** Categorical columns profiled by [[profileCategorical]]. */
  private val CatCols = Seq("lang", "source")

  /** Top values reported per categorical column. */
  val TopValues = 5

  /** The categorical half of ANALYZE — per string column: total rows,
    * distinct values, and the top-[[TopValues]] values with exact
    * counts and mass fractions (ties by value). The first question a
    * curator asks of a new corpus ("what languages? which sources
    * dominate?"), and the skew report a partitioner reads before
    * keying anything by the column.
    *
    * Scale shape: ONE corpus scan explodes each row into (column,
    * value) pairs — a ×|cols| narrow fanout map-side combined into a
    * values-sized count table; the distinct counts and the top-k
    * window then run on that table, never the corpus. frac is one
    * IEEE division of two exact integers (hash-oracled).
    */
  def profileCategorical(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val pairs = docs.select(explode(array(CatCols.map(c =>
        struct(lit(c).as("col_name"), col(c).as("value"))): _*)).as("kv"))
      .select(col("kv.col_name").as("col_name"), col("kv.value").as("value"))
    val counts = pairs.groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("cnt"))
    val perCol = counts.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_distinct"), sum(col("cnt")).as("n"))
    val w = Window.partitionBy(col("col_name"))
      .orderBy(col("cnt").desc, col("value"))
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopValues)
      .join(broadcast(perCol), "col_name")
      .select(col("col_name"), col("rank"), col("value"), col("cnt"),
        col("n_distinct"), col("n"),
        round(col("cnt").cast("double") / col("n"), 6).as("frac"))
      .orderBy(col("col_name"), col("rank"))
  }

  /** Graded `profile_mutual_info`: mutual information (in bits)
    * between two categorical columns — the dependence measure a
    * feature-selection / leakage audit runs where correlation only
    * sees numerics: MI(X;Y) = Σ p(x,y)·log₂(p(x,y)/(p(x)p(y))),
    * here between `documents.lang` and `documents.source` (is
    * language distribution independent of the crawl source?). Emits
    * the per-cell decomposition (the analyst's readout: WHICH
    * (x, y) cell carries the dependence) plus each cell's PMI and
    * contribution; the MI total is the contributions' sum, recovered
    * by the reader or a trailing agg.
    *
    * Exactness: all counts exact integers off ONE corpus pass;
    * p(x,y) is one IEEE division; the log argument n_xy·N/(n_x·n_y)
    * is ONE division of two exactly-converted integer products
    * (DECIMAL, so the products never overflow long at any scale);
    * ln parity between engines is established precedent (tf-idf,
    * LM-score oracles) and /ln2 rescales to bits. Each output value
    * is a fixed scalar chain → deterministic both engines; rounding
    * closes at 6.
    *
    * Scale shape: one map-side-combinable groupBy over (x, y); the
    * marginals are re-aggregations of the CELL table (vocab-sized,
    * broadcast both ways), so the corpus is read exactly once.
    */
  def mutualInfo(s: SparkSession, dir: String): DataFrame =
    mutualInfoFor(load(s, dir, "documents")
      .select(col("lang").as("x"), col("source").as("y")))

  /** [[mutualInfo]]'s algebra over any (x, y) pair frame — the seam
    * the planted independence/determinism specs drive. */
  private[operators] def mutualInfoFor(pairs: DataFrame): DataFrame = {
    // engine-evaluated like Drift's: both sides compute ln(2) with
    // their own libm rather than one engine inlining a Scala constant
    val ln2 = log(lit(2.0))
    val cells = pairs
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n_xy"))
    val mx = cells.groupBy(col("x")).agg(sum(col("n_xy")).as("n_x"))
    val my = cells.groupBy(col("y")).agg(sum(col("n_xy")).as("n_y"))
    val tot = cells.agg(sum(col("n_xy")).as("n"))
    // cast operands to DECIMAL BEFORE multiplying — long×long would
    // overflow silently in non-ANSI mode at large N
    val num = (col("n_xy").cast("decimal(38,0)")
      * col("n").cast("decimal(38,0)")).cast("double")
    val den = (col("n_x").cast("decimal(38,0)")
      * col("n_y").cast("decimal(38,0)")).cast("double")
    val pmi = log(num / den) / ln2
    cells.join(broadcast(mx), "x").join(broadcast(my), "y")
      .crossJoin(broadcast(tot))
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        round(pmi, 6).as("pmi_bits"),
        round((col("n_xy").cast("double") / col("n").cast("double"))
          * pmi, 6).as("mi_contrib_bits"))
      .orderBy(col("x"), col("y"))
  }

  /** Graded `profile_gini`: the Gini concentration coefficient of
    * customer spend per nation — the inequality profile a curation /
    * marketplace-health dashboard tracks (is revenue concentrating
    * into a few whales?). Closed form over the per-group sorted
    * order: G = (2·Σ rᵢ·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) with rᵢ the
    * 1-based rank of xᵢ within its nation — Σ terms exact DECIMAL
    * over integer cents, one double division + round at the end.
    * Equal spends permute freely within tied ranks without changing
    * Σ r·x, so the tiebreak (custkey) is for determinism only.
    *
    * Scale discipline — the rank is NOT a per-nation window: with
    * ~25 nations a `Window.partitionBy(nation)` serializes ~1/25 of
    * a billion-customer frame through single tasks (the r11
    * `orders_rfm` defect class). Instead ONE global
    * [[DistributedPrefix]] exclusive rank over the total order
    * (nation, cents, cust) plus a broadcast 25-row per-nation offset
    * subtraction yields the in-nation rank with the range exchange as
    * the only corpus-wide movement.
    */
  def giniSpend(s: SparkSession, dir: String): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val spend = load(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
        .as("cents"))
    val x = spend.join(load(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nation"),
        col("cents"), col("o_custkey").as("cust"))
    // the ..AndRel form hands back the CACHED ranged frame, so the
    // 25-row nation counts aggregate THAT instead of re-running the
    // whole orders aggregation + customer join a second time (the
    // exact auxiliary-aggregate case the helper's doc prescribes)
    val (ranked, rel) = DistributedPrefix.exclusiveSumsAndRel(x,
      Seq(col("nation"), col("cents"), col("cust")),
      Seq((lit(1L), "rk0")))
    val offw = Window.orderBy(col("nation"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // 25-row frame: the unpartitioned window is over nation COUNTS
    val offs = rel.groupBy(col("nation"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("nation"),
        coalesce(sum(col("cnt")).over(offw), lit(0L)).as("noff"))
    ranked.join(broadcast(offs), Seq("nation"))
      .withColumn("r", col("rk0") - col("noff") + 1)
      .groupBy(col("nation"))
      .agg(count(lit(1)).as("n_cust"),
        sum(dec(col("cents"))).as("sx"),
        sum(dec(col("r")) * dec(col("cents"))).as("srx"))
      .select(col("nation"), col("n_cust"),
        round((lit(2) * col("srx") - (col("n_cust") + 1) * col("sx"))
            .cast("double")
          / (col("n_cust") * col("sx")).cast("double"), 6).as("gini"))
      .orderBy(col("nation"))
  }
}
