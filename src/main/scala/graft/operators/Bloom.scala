package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Bloom-prefiltered join — the semi-join *reduction* pattern every
  * 100 TB engine leans on (Spark's own `InjectRuntimeFilter` applies
  * it automatically above its size thresholds; here it is explicit,
  * deterministic, and oracled): build a compact Bloom filter over the
  * QUALIFYING dim keys (supplier accounts over the balance threshold —
  * a dim-proportional set), ship it to every fact-side task as a plan
  * literal, and drop non-matching fact rows BEFORE the join's
  * exchange. The filter is a few KB where a broadcast hash join's
  * build side would carry whole rows; at 100 TB the win is that the
  * shuffle (or even the scan pipeline) carries only rows that *might*
  * match — with a 1% false-positive rate, ~99% of non-matching fact
  * rows never reach the join.
  *
  * Exactness is preserved BY CONSTRUCTION: Bloom filters have no false
  * negatives, so the prefilter passes a superset of the true matches,
  * and the exact join that follows removes the false positives — the
  * query hash-matches the plain join oracle (`bloom_join`), which
  * cannot see the Bloom stage at all. Membership tests run through
  * Spark's native codegen `bloom_filter_might_contain` expression
  * (the one runtime filtering injects), not a UDF; the filter bytes
  * are deterministic for a given key set (fixed seed, order-free
  * bit-OR construction), so the plan — and the bench's plan
  * fingerprint — is run-stable.
  *
  * BloomSpec pins the parts the oracle can't state: the prefilter
  * passes every true match (no false negatives), its selectivity is
  * within the configured fpp of the true match rate, and the plan
  * places the membership test BELOW the join (the reduction actually
  * happens pre-shuffle).
  */
object Bloom {

  /** False-positive probability for the prefilter (1% — the standard
    * runtime-filter operating point: ~9.6 bits/key).
    */
  val Fpp = 0.01

  private val BuildPred: Column = col("s_acctbal") > 4000

  /** Serialized Bloom filter over the qualifying supplier keys.
    * Deterministic: fixed hash seed, bit-OR construction is
    * order-free. Sized from the build-side count (one tiny dim-side
    * job — the same count a broadcast-threshold decision would run).
    */
  private[operators] def supplierBloom(s: SparkSession,
      dir: String): Array[Byte] = {
    val keys = load(s, dir, "supplier").filter(BuildPred)
      .select(col("s_suppkey"))
    val n = keys.count()
    // an empty qualifying set is a valid (if degenerate) build side:
    // an all-zeros filter rejects everything, which IS the exact
    // semi-join result; stat.bloomFilter would NPE on empty input
    val bf =
      if (n == 0) org.apache.spark.util.sketch.BloomFilter.create(64, Fpp)
      else keys.stat.bloomFilter("s_suppkey", n, Fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** The fact side with the membership prefilter applied — split out
    * so BloomSpec can measure selectivity and superset-ness of the
    * prefiltered frame directly.
    */
  private[operators] def prefilteredLineitem(s: SparkSession,
      dir: String): DataFrame = {
    val bloom = supplierBloom(s, dir)
    load(s, dir, "lineitem")
      .filter(call_function("bloom_might_contain",
        lit(bloom), col("l_suppkey").cast("long")))
  }

  /** Revenue per qualifying supplier, bloom-prefiltered then exactly
    * joined. The oracle is the PLAIN join — the Bloom stage must be
    * semantically invisible.
    */
  def bloomJoin(s: SparkSession, dir: String): DataFrame = {
    val supp = load(s, dir, "supplier").filter(BuildPred)
      .select(col("s_suppkey"), col("s_name"))
    prefilteredLineitem(s, dir)
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("s_suppkey"))
  }
}
