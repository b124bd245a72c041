package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Rule-based data-quality expectations (the Great-Expectations /
  * Deequ check class): each check is one aggregation-shaped assertion
  * over a table — null rates, value ranges, uniqueness, referential
  * integrity, derived-column consistency — reported as
  * (check, n_checked, n_violations, rate). The intake gate a pipeline
  * runs BEFORE dedup/curation: a feed that suddenly violates its
  * contract should stop the run, not poison the corpus.
  *
  * Every check is exact integer counting (violation rate is the one
  * rounded division), so the whole report hash-oracles. Scale shape:
  * each check is a single map-side-combinable aggregation or one
  * anti-join (referential integrity — the only shuffle, keyed on the
  * foreign key); checks union into one report frame, and Spark runs
  * the independent branches as independent stages.
  */
object DataQuality {

  private def rate(v: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column) =
    round(v.cast("double") / n.cast("double"), 6)

  def dqChecks(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
    val orders = load(s, dir, "orders")
    val cust = load(s, dir, "customer")
    val ev = load(s, dir, "events")
    val docs = load(s, dir, "documents")

    // range contract: TPC-H quantities are 1..50
    val qty = li.agg(count(lit(1)).as("n_checked"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
        .otherwise(0L)).as("n_violations"))
      .select(lit("lineitem_qty_range").as("check"), col("n_checked"),
        col("n_violations"))

    // completeness: order dates must be present
    val odate = orders.agg(count(lit(1)).as("n_checked"),
      sum(when(col("o_orderdate").isNull, 1L).otherwise(0L))
        .as("n_violations"))
      .select(lit("orders_date_not_null").as("check"), col("n_checked"),
        col("n_violations"))

    // referential integrity: every order's customer exists (the one
    // shuffled check — a left anti-join on the foreign key)
    val orphans = orders.select(col("o_custkey"))
      .join(cust.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val ri = orders.agg(count(lit(1)).as("n_checked"))
      .crossJoin(broadcast(orphans))
      .select(lit("orders_customer_exists").as("check"), col("n_checked"),
        col("n_violations"))

    // uniqueness: customer keys must not repeat
    val uniq = cust.agg(count(lit(1)).as("n_checked"),
      (count(lit(1)) - countDistinct(col("c_custkey"))).as("n_violations"))
      .select(lit("customer_key_unique").as("check"), col("n_checked"),
        col("n_violations"))

    // domain contract: event values are non-negative
    val evv = ev.agg(count(lit(1)).as("n_checked"),
      sum(when(col("value") < 0, 1L).otherwise(0L)).as("n_violations"))
      .select(lit("events_value_nonneg").as("check"), col("n_checked"),
        col("n_violations"))

    // derived-column consistency: n_chars matches the text it describes
    val nch = docs.agg(count(lit(1)).as("n_checked"),
      sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
        .as("n_violations"))
      .select(lit("documents_nchars_consistent").as("check"),
        col("n_checked"), col("n_violations"))

    qty.unionByName(odate).unionByName(ri).unionByName(uniq)
      .unionByName(evv).unionByName(nch)
      .select(col("check"), col("n_checked"), col("n_violations"),
        rate(col("n_violations"), col("n_checked")).as("violation_rate"))
      .orderBy(col("check"))
  }

  /** Benford first-digit expectations log10(1 + 1/d), d = 1..9,
    * pinned as 6-decimal LITERALS (the identical constants appear in
    * the DuckDB oracle) — literal tables, not runtime log10, are
    * what keeps a transcendental out of the hash-graded path. */
  val BenfordExpected: Seq[Double] = Seq(
    0.301030, 0.176091, 0.124939, 0.096910, 0.079181,
    0.066947, 0.057992, 0.051153, 0.045757)

  /** Graded `dq_benford`: Benford's-law conformance of order totals —
    * the observed first-significant-digit distribution against the
    * log10(1 + 1/d) expectation, with per-digit absolute deviation
    * (the fraud/synthetic-data smell test auditors run on financial
    * columns; Nigrini 1996). Amounts enter as exact cents, the digit
    * is string head of the integer — no floating-point extraction.
    *
    * Scale shape: one narrow projection + one 9-key map-side-combined
    * count; the total joins back by broadcast. Deviation compares the
    * ROUNDED observed share against the literal expectation, so every
    * reported number is deterministic in both engines.
    */
  def benford(s: SparkSession, dir: String): DataFrame = {
    // abs() before the string head: a negative amount's head would be
    // '-', which ANSI mode refuses to cast — sign never carries
    // first-digit information anyway
    val digit = substring(
      abs(round(col("o_totalprice") * 100, 0).cast("long")).cast("string"),
      1, 1).cast("int")
    val counts = load(s, dir, "orders")
      .select(digit.as("digit"))
      // first SIGNIFICANT digit is 1..9 by definition: a zero-cent or
      // null amount has none. The oracle applies the SAME 1..9 filter
      // before ITS total, so the two denominators agree by
      // construction — not merely because totals happen to be positive
      .filter(col("digit").between(1, 9))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("n_total"))
    val pExp = BenfordExpected.zipWithIndex.foldLeft(lit(null)
        .cast("double")) { case (acc, (p, i)) =>
      when(col("digit") === (i + 1), lit(p)).otherwise(acc)
    }
    counts.crossJoin(broadcast(total))
      .withColumn("p_obs",
        round(col("n").cast("double") / col("n_total").cast("double"), 6))
      .withColumn("p_exp", pExp)
      .select(col("digit"), col("n"), col("p_obs"), col("p_exp"),
        round(abs(col("p_obs") - col("p_exp")), 6).as("abs_dev"))
      .orderBy(col("digit"))
  }
}
