package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, xxhash64}

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * `Aggregator` — the "novel sketch" class of custom aggregation
  * (SURVEY.md §2.3): bounded O(k) state per group, true partial
  * aggregation (map-side combine + associative merge), deterministic
  * output regardless of partitioning (the k smallest hashes of a set
  * are partition-order-independent).
  *
  * Estimator: keep the k smallest distinct 64-bit hashes; if fewer
  * than k distinct values were seen the count is exact; otherwise
  * `(k-1)/u_k` where `u_k` is the k-th smallest hash mapped to (0,1).
  * Relative standard error ≈ 1/√(k-2) (~6% at k=256). Spark's builtin
  * `approx_count_distinct` (HLL) is the usual choice; KMV additionally
  * supports set operations on sketches (union = merge; intersection
  * via inclusion–exclusion), which HLL sketches here don't expose.
  */
object KMVDistinct {

  /** Sorted ascending, distinct, at most k entries. */
  case class Buf(var hashes: Array[Long])

  private def reduceInto(b: Buf, h: Long, k: Int): Buf = {
    val idx = java.util.Arrays.binarySearch(b.hashes, h)
    if (idx >= 0) b // already present
    else {
      val ins = -idx - 1
      if (b.hashes.length < k) {
        val out = new Array[Long](b.hashes.length + 1)
        System.arraycopy(b.hashes, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b.hashes, ins, out, ins + 1,
          b.hashes.length - ins)
        b.hashes = out
      } else if (ins < k) {
        // drop current max, shift, insert
        System.arraycopy(b.hashes, ins, b.hashes, ins + 1, k - ins - 1)
        b.hashes(ins) = h
      }
      b
    }
  }

  private def mergeInto(a: Buf, b: Buf, k: Int): Buf = {
    val out = new Array[Long](math.min(k, a.hashes.length + b.hashes.length))
    var (i, j, o) = (0, 0, 0)
    var last = 0L; var haveLast = false
    while (o < out.length && (i < a.hashes.length || j < b.hashes.length)) {
      val takeA = j >= b.hashes.length ||
        (i < a.hashes.length && a.hashes(i) <= b.hashes(j))
      val v = if (takeA) { val x = a.hashes(i); i += 1; x }
              else { val x = b.hashes(j); j += 1; x }
      if (!haveLast || v != last) { out(o) = v; o += 1; last = v; haveLast = true }
    }
    a.hashes = if (o == out.length) out else out.take(o)
    a
  }

  def aggregator(k: Int): Aggregator[Long, Buf, Double] =
    new Aggregator[Long, Buf, Double] {
      def zero: Buf = Buf(Array.emptyLongArray)
      def reduce(b: Buf, h: Long): Buf = reduceInto(b, h, k)
      def merge(a: Buf, b: Buf): Buf = mergeInto(a, b, k)

      def finish(b: Buf): Double =
        if (b.hashes.length < k) b.hashes.length.toDouble
        else {
          // map k-th smallest signed hash to u ∈ (0,1)
          val u = b.hashes(k - 1).toDouble / 18446744073709551616.0 + 0.5
          (k - 1).toDouble / u
        }

      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** The md5-domain sibling: hashes are the first 13 hex digits of
    * md5(value) as an integer in [0, 2⁵²) — the same cross-engine
    * determinism key the weighted samplers use — and the estimate is
    * (k−1)/(h_k/2⁵²), two correctly-rounded IEEE ops on an exactly-
    * representable integer. Same bounded-state mergeable sketch as
    * [[aggregator]], but the OUTPUT is bit-identical to a DuckDB
    * replay (distinct → order → k-th min over the same md5 ints), so
    * the sketch query itself hash-oracles — the only sketch in the
    * family with an exact SQL oracle rather than an accuracy pin.
    */
  def aggregator52(k: Int): Aggregator[Long, Buf, Double] =
    new Aggregator[Long, Buf, Double] {
      def zero: Buf = Buf(Array.emptyLongArray)
      def reduce(b: Buf, h: Long): Buf = reduceInto(b, h, k)
      def merge(a: Buf, b: Buf): Buf = mergeInto(a, b, k)

      def finish(b: Buf): Double =
        if (b.hashes.length < k) b.hashes.length.toDouble
        else (k - 1).toDouble / (b.hashes(k - 1).toDouble /
          4503599627370496.0) // 2^52

      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Column form: approximate distinct count of `c` with sketch size k.
    * Usable in any groupBy: `df.groupBy(g).agg(KMVDistinct(col, 256))`.
    */
  def apply(c: Column, k: Int = 256): Column =
    udaf(aggregator(k), Encoders.scalaLong).apply(xxhash64(c))

  /** Column form of the oracle-able md5-domain sketch
    * ([[aggregator52]]).
    *
    * Null caveat: `md5(NULL)` is NULL, so a nullable column's null
    * rows reach the aggregator as an undefined input (the xxhash64
    * form hashes nulls to the seed — one extra distinct value —
    * which is also what DuckDB's DISTINCT-over-NULL replay would
    * count). Feed non-null keys (the registered query uses
    * `l_orderkey`) or pre-coalesce a sentinel; null semantics are
    * deliberately NOT papered over here because the cross-engine
    * oracle would diverge on them.
    */
  def md5Sketch(c: Column, k: Int = 256): Column = {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    udaf(aggregator52(k), Encoders.scalaLong)
      .apply(conv(substring(md5(c.cast("string")), 1, 13), 16, 10)
        .cast("long"))
  }
}
