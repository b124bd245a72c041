package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** k-anonymity audit (Sweeney 2002): how identifiable is a record by
  * its QUASI-identifiers alone — the privacy gate a training-data
  * release runs next to [[Pii]] scrubbing (PII regexes catch direct
  * identifiers; k-anonymity catches the combination attack, where
  * nation + segment + balance bracket singles a person out).
  *
  * The graded row reports every equivalence class over
  * (nation, market segment, account-balance bracket) smaller than
  * [[K]] — the re-identifiable population. Bracketing is exact
  * integer arithmetic (floor of cents / 100,000 ⇒ $1,000-wide bands,
  * negatives floored consistently in both engines via integer `div`
  * on the non-negative shifted value), so the report hash-oracles.
  *
  * Scale shape: one map-side-combinable groupBy over the
  * quasi-identifier tuple; the violating classes are by definition
  * the SMALL groups, so the report is tiny even when the table is
  * not.
  */
object Privacy {

  /** Anonymity threshold: classes smaller than this are reported. */
  val K = 5L

  /** Cents shift making every balance non-negative before the integer
    * div (TPC-H acctbal ≥ −999.99), so floor semantics are engine-free.
    */
  val Shift = 100000L

  def kanonAudit(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "customer")
      .select(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        expr(s"(cast(round(c_acctbal * 100, 0) as bigint) + $Shift) " +
          s"div 100000").as("bal_band"))
      .groupBy(col("nation"), col("segment"), col("bal_band"))
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < K)
      .orderBy(col("nation"), col("segment"), col("bal_band"))

  /** Distinct-value threshold for [[ldivAudit]]. */
  val L = 3L

  /** l-diversity audit (Machanavajjhala et al. 2007) — the attack
    * k-anonymity misses: a class can hold k ≥ 5 people and STILL leak
    * if they all share one sensitive value (the homogeneity attack —
    * knowing someone is in the class reveals their attribute without
    * singling them out). Graded `privacy_ldiv`: over the
    * (nation, segment) quasi-identifier classes, report every class
    * whose SENSITIVE attribute (the $1,000 balance band) takes fewer
    * than [[L]] distinct values, with the class size and its distinct
    * count. Pairs with [[kanonAudit]]: together they are the
    * class-size and class-content halves of the release gate. The
    * graded row reports EVERY class with its diversity and the
    * meets-l verdict (the full audit a release reviewer reads — on a
    * healthy corpus the violating subset is empty, which would grade
    * nothing).
    *
    * Exactness: the band is the same shifted integer `div` as kanon;
    * distinct counts are exact integers. Scale shape: one two-level
    * aggregation (distinct at (QI, band) grain collapses map-side,
    * then a count per QI) — no Expand, no joins, report sized by the
    * QI-class count.
    */
  def ldivAudit(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "customer")
      .select(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        expr(s"(cast(round(c_acctbal * 100, 0) as bigint) + $Shift) " +
          s"div 100000").as("bal_band"))
      .groupBy(col("nation"), col("segment"), col("bal_band"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("nation"), col("segment"))
      .agg(sum(col("n")).as("class_size"),
        count(lit(1)).as("n_distinct_sensitive"))
      .select(col("nation"), col("segment"), col("class_size"),
        col("n_distinct_sensitive"),
        (col("n_distinct_sensitive") >= L).as("meets_l"))
      .orderBy(col("nation"), col("segment"))

  /** Erasure-request modulus: customers with key ≡ 0 (mod this) are
    * the "forgotten" set — a deterministic stand-in for the keyset a
    * real request supplies. */
  val ErasureMod = 97L

  /** Graded `privacy_erasure`: right-to-erasure blast-radius audit —
    * given a set of subjects to forget, how many rows does the
    * cascade delete touch in EVERY table that references them
    * (customer directly, orders via custkey, lineitem via the erased
    * orders)? This is the report a GDPR/CCPA deletion job emits
    * before and after the [[Merge]]-style rewrite executes it: per
    * table, rows erased and rows kept — all exact integers.
    *
    * Scale shape: the subject set is a predicate here, but the plan
    * is written as the general form — orders resolves subjects by one
    * semi-join-shaped aggregation on custkey and lineitem cascades by
    * one equi-join on orderkey against the ERASED orders only (the
    * small side by construction: AQE broadcasts it when it fits,
    * shuffles otherwise). Full-table counts are map-side-combinable;
    * nothing corpus-sized is collected. A deletion over 100 TB runs
    * the identical two-join shape; the rewrite step that follows is
    * the [[Merge]] operator's anti-join, already graded.
    */
  def erasureAudit(s: SparkSession, dir: String): DataFrame = {
    val cust = load(s, dir, "customer")
      .select(col("c_custkey").cast("long").as("k"),
        (col("c_custkey") % ErasureMod === 0).as("erased"))
    val orders = load(s, dir, "orders")
      .select(col("o_orderkey").cast("long").as("ok"),
        (col("o_custkey") % ErasureMod === 0).as("erased"))
    val erasedOrders = orders.filter(col("erased"))
      .select(col("ok"))
    val li = load(s, dir, "lineitem")
      .select(col("l_orderkey").cast("long").as("ok"))
      .join(erasedOrders.withColumn("erased", lit(true)), Seq("ok"),
        "left")
      .select(coalesce(col("erased"), lit(false)).as("erased"))
    def audit(name: String, flagged: DataFrame): DataFrame =
      flagged.agg(
        sum(when(col("erased"), 1L).otherwise(0L)).as("rows_erased"),
        sum(when(col("erased"), 0L).otherwise(1L)).as("rows_kept"))
        .select(lit(name).as("table_name"),
          col("rows_erased"), col("rows_kept"))
    audit("customer", cust)
      .unionByName(audit("orders", orders))
      .unionByName(audit("lineitem", li))
      .orderBy(col("table_name"))
  }
}
