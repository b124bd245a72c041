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
}
