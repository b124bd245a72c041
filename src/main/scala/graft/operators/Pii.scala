package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** PII detection and redaction — the scrubbing pass every training
  * pipeline runs before text leaves curation (emails, phone numbers,
  * IP addresses → typed placeholders). No analog in the reference
  * (§2.3 beyond-reference territory, same family as the text pack).
  *
  * Shape at scale: one narrow projection — `regexp_count` for the
  * per-type hit counts and chained `regexp_replace` for the redacted
  * form, all codegen'd Catalyst expressions (no UDF), so the pass
  * scales with partition count alone and the filters commute with
  * scan pruning like any other projection.
  *
  * The synthetic corpus is lowercase word salad with no PII in it, so
  * (exactly like the synthetic `media` relation in [[Multimodal]])
  * the relation under test injects PII deterministically from
  * `doc_id`: ~half the docs gain an email, a third a phone, a fifth
  * an IPv4, with all combinations occurring. The *operator* — typed
  * regex detection + placeholder redaction — is the real one; the
  * oracle rebuilds the same injection in SQL and re-runs the same
  * expressions, so a hash match proves detection, counting, and
  * redaction byte-for-byte.
  */
object Pii {

  /** Detection patterns. Kept inside the (RE2 ∩ java.util.regex)
    * common subset so the SQL oracle runs them verbatim.
    */
  val EmailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  val PhoneRe = "\\+1-555-[0-9]{4}"
  val IpRe = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** `documents` with PII injected deterministically from doc_id:
    * emails on ids ≡ 0 (mod 2), phones on ≡ 0 (mod 3), IPs on
    * ≡ 0 (mod 5) — overlapping moduli so docs carry 0–3 PII kinds.
    */
  def withPii(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    def str(c: Column): Column = c.cast("string")
    load(s, dir, "documents").select(id,
      concat(col("text"),
        when(id % 2 === 0, concat(lit(" contact user"), str(id),
          lit("@mail"), str(id % 7), lit(".com"))).otherwise(lit("")),
        when(id % 3 === 0, concat(lit(" call +1-555-"),
          lpad(str(id % 10000), 4, "0"))).otherwise(lit("")),
        when(id % 5 === 0, concat(lit(" host 10."), str(id % 256),
          lit("."), str(shiftright(id, 8) % 256), lit("."),
          str(id % 100))).otherwise(lit(""))).as("text"))
  }

  /** Per-document PII audit: hit counts per type, a `has_pii` gate,
    * and the md5 of the redacted text (placeholders substituted in
    * email → phone → IP order; the patterns are disjoint so the
    * order is cosmetic, but it is pinned for reproducibility).
    */
  def scrub(s: SparkSession, dir: String): DataFrame =
    scrubRows(withPii(s, dir)).orderBy(col("doc_id"))

  /** The audit over ANY (doc_id, text) frame — stateless and
    * sort-free, so the identical plan runs under `readStream` in
    * append mode (streaming-parity pinned in CurationStreamSpec).
    */
  def scrubRows(docs: DataFrame): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), lit(EmailRe), lit("<EMAIL>")),
          lit(PhoneRe), lit("<PHONE>")),
        lit(IpRe), lit("<IP>"))
    docs
      .select(col("doc_id"),
        regexp_count(col("text"), lit(EmailRe)).as("n_emails"),
        regexp_count(col("text"), lit(PhoneRe)).as("n_phones"),
        regexp_count(col("text"), lit(IpRe)).as("n_ips"),
        md5(redacted.cast("binary")).as("redacted_md5"))
      .withColumn("has_pii",
        col("n_emails") + col("n_phones") + col("n_ips") > 0)
  }
}
