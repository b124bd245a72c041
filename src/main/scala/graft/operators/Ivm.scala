package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Incremental view maintenance — the counting algorithm (Gupta &
  * Mumick's classic delta rules) for materialized GROUP-BY aggregates:
  * given the maintained view V = γ_keys(count, sums)(base) and a
  * change batch of rows with multiplicity m ∈ {+1, −1}
  * (insert/delete), the new view is
  *
  *   V' = γ_keys(Σn, Σs)(V ∪ γ_keys(Σm, Σm·x)(delta))  filtered n > 0
  *
  * — groups whose net count reaches zero VANISH (the retraction case
  * a naive "merge sums" misses), never-seen keys appear, and the base
  * table is NEVER rescanned.
  *
  * Why this matters at 100 TB: the view is |groups| rows and the delta
  * is batch-sized, so maintenance cost is O(|V| + |Δ|) — re-running
  * the aggregation over the base fact table costs O(100 TB) per
  * refresh. Count and sum are the self-maintainable aggregates
  * (min/max are NOT retractable without per-group state — out of
  * scope by design, documented here rather than half-supported).
  *
  * Exactness: counts and value sums are exact integers (cents), so
  * the maintained view is bit-identical to a from-scratch recompute —
  * the graded row `ivm_maintain` pins exactly that identity against
  * DuckDB recomputing over (base ∖ deletes) ∪ inserts. The delta is a
  * pure md5 function of `orders` (~10% deletes, ~5% inserts, a
  * quarter of inserts landing on brand-new keys), so both engines see
  * the same batch.
  *
  * Scale shape: one map-side-combinable aggregation over the delta,
  * one union with the view, one shuffled re-aggregation on the key —
  * no join, no base scan, no broadcast.
  */
object Ivm {

  /** Maintain a (keys, n, sums...) view under a delta of
    * (keys, m, values...) rows — `m` is +1 insert / −1 delete, value
    * columns must be named exactly like the view's sum columns and are
    * multiplied by m before folding in. Groups with net n = 0 drop;
    * net n < 0 — a delta retracting more rows than the view holds —
    * is a CORRUPT FEED and fails loudly (`raise_error` inside the
    * kept `n` column, so pruning cannot elide the check), per the
    * pack's fail-loud-over-silently-wrong discipline.
    */
  def maintain(view: DataFrame, delta: DataFrame, keys: Seq[String],
      sums: Seq[String]): DataFrame = {
    val dAgg = delta.groupBy(keys.map(col): _*)
      .agg(sum(col("m")).as("n"),
        sums.map(c => sum(col("m") * col(c)).as(c)): _*)
    view.select((keys :+ "n").map(col) ++ sums.map(col): _*)
      .unionByName(dAgg.select((keys :+ "n").map(col) ++ sums.map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sums.map(c => sum(col(c)).as(c)): _*)
      .withColumn("n", when(col("n") >= 0, col("n"))
        .otherwise(raise_error(concat(
          lit("ivm maintain: net count "), col("n").cast("string"),
          lit(" < 0 — the delta retracts rows the view does not hold " +
            "(corrupt feed)")))))
      .filter(col("n") > 0)
  }

  private def hex4(e: Column): Column =
    conv(substring(md5(e), 1, 4), 16, 10).cast("long")

  private def cents(c: Column): Column =
    round(c * 100, 0).cast("decimal(38,0)")

  /** Per-customer order view over the base table. */
  private[operators] def baseView(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "orders")
      .select(col("o_custkey").cast("long").as("cust"),
        cents(col("o_totalprice")).as("s"))
      .groupBy(col("cust"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("s"))

  /** The md5 change batch: ~10% of orders deleted (their exact rows
    * retracted), ~5% re-inserted with a shifted price, a quarter of
    * those landing on a brand-new key (cust + 10,000,000) so the
    * maintained view must also CREATE groups.
    */
  private[operators] def deltaBatch(s: SparkSession, dir: String): DataFrame = {
    val o = load(s, dir, "orders").select(
      col("o_orderkey").cast("string").as("ok"),
      col("o_custkey").cast("long").as("cust"),
      cents(col("o_totalprice")).as("s"))
    val dels = o.filter(hex4(concat(col("ok"), lit("#del"))) < 6554)
      .select(col("cust"), lit(-1L).as("m"), col("s"))
    val ins = o.filter(hex4(concat(col("ok"), lit("#ins"))) < 3277)
      .select(
        when(hex4(concat(col("ok"), lit("#new"))) < 16384,
          col("cust") + 10000000L).otherwise(col("cust")).as("cust"),
        lit(1L).as("m"),
        (col("s") + 12345).as("s"))
    dels.unionByName(ins)
  }

  /** Graded `ivm_maintain`: the maintained per-customer view after the
    * md5 delta, against DuckDB recomputing from scratch over
    * (base ∖ deletes) ∪ inserts — the IVM identity itself is the
    * oracle.
    */
  def ivmMaintain(s: SparkSession, dir: String): DataFrame =
    maintain(baseView(s, dir), deltaBatch(s, dir), Seq("cust"), Seq("s"))
      .select(col("cust"), col("n"),
        col("s").cast("long").as("sum_cents"),
        round(col("s").cast("double") / col("n").cast("double"), 6)
          .as("avg_cents"))
      .orderBy(col("cust"))
}
