package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** `approx_count_distinct(c, rsd)` with a COMPACT aggregation buffer —
  * bit-identical estimates, radically cheaper plumbing.
  *
  * Why this exists (guide §1/§4, measured r16): Spark's builtin
  * `HyperLogLogPlusPlus` is an `ImperativeAggregate` whose buffer is
  * `m/10 + 1` LONG COLUMNS of the aggregation row — 1,639 columns per
  * aggregate at rsd = 0.01 (p = 14, m = 16384). Every task that touches
  * such a buffer generates (not just compiles — the codegen cache only
  * caches the Janino step) the Java source for multi-thousand-field
  * UnsafeRow projections, megabytes of string assembly per task; a
  * stack-sample of the 4-column rsd-0.01 profile pass shows the
  * executors spending their time in `codegen.Block.toString` /
  * `stripMargin` / `SQLConf.<init>`, not in sketch updates
  * (~0.75 µs/row observed, vs ~0.05 µs of actual work). Packing the
  * registers into ONE opaque buffer value removes the wide schema from
  * every projection. Measured at sf0.1: the 4-column rsd-0.01 pass
  * drops ~3.2 s → ~0.3 s.
  *
  * Bit-identity with the builtin (pinned by HllDistinctSpec):
  *   - same per-value hash: `xxhash64(value)` (seed 42) — exactly
  *     `XxHash64Function.hash(v, dataType, 42)`, which is what the
  *     builtin feeds its registers; callers of [[fp]] get the same
  *     -0.0 → 0.0 / NaN canonicalization `NormalizeFloatingNumbers`
  *     applies inside the builtin's update;
  *   - same register math: p = ⌈2·log₂(1.106/rsd)⌉, idx = h ⋙ (64−p),
  *     w = nlz((h ≪ p) | 1 ≪ (p−1)) + 1, 6-bit registers packed 10 per
  *     long, max-merge;
  *   - same estimator: the final estimate is computed by Spark's own
  *     [[HyperLogLogPlusPlusHelper.query]] (bias tables included) over
  *     the identical register contents.
  *
  * NULL semantics: the builtin skips null inputs. `xxhash64(null)`
  * would return the seed (a real hash), so [[apply]] wraps the hash in
  * `when(c.isNotNull, …)` and [[aggregator]] skips null hashes.
  *
  * Scale shape: unchanged — O(m) state per group, true partial
  * aggregation, one narrow binary buffer through the shuffle instead
  * of 1,639 long columns.
  */
object HllDistinct {

  /** Packed HLL registers (the builtin's exact word layout). */
  case class Buf(var words: Array[Long])

  private val RegistersPerWord = 10
  private val RegisterSize = 6
  private val RegisterWordMask = (1L << RegisterSize) - 1

  def aggregator(rsd: Double): Aggregator[java.lang.Long, Buf, Long] =
    new Aggregator[java.lang.Long, Buf, Long] {
      private val p = math.ceil(
        2.0d * math.log(1.106d / rsd) / math.log(2.0d)).toInt
      require(p >= 4, s"rsd $rsd too imprecise")
      private val idxShift = 64 - p
      private val wPadding = 1L << (p - 1)
      private val m = 1 << p
      private val numWords = m / RegistersPerWord + 1

      def zero: Buf = Buf(new Array[Long](numWords))

      def reduce(b: Buf, h: java.lang.Long): Buf = {
        if (h != null) {
          val hash = h.longValue()
          val idx = (hash >>> idxShift).toInt
          val w = java.lang.Long.numberOfLeadingZeros(
            (hash << p) | wPadding) + 1L
          val wordOffset = idx / RegistersPerWord
          val shift = RegisterSize * (idx - wordOffset * RegistersPerWord)
          val word = b.words(wordOffset)
          val cur = (word >>> shift) & RegisterWordMask
          if (w > cur) {
            b.words(wordOffset) =
              (word & ~(RegisterWordMask << shift)) | (w << shift)
          }
        }
        b
      }

      def merge(a: Buf, b: Buf): Buf = {
        var wi = 0
        while (wi < numWords) {
          val wa = a.words(wi)
          val wb = b.words(wi)
          if (wa != wb) {
            var out = 0L
            var ri = 0
            while (ri < RegistersPerWord) {
              val shift = RegisterSize * ri
              val ra = (wa >>> shift) & RegisterWordMask
              val rb = (wb >>> shift) & RegisterWordMask
              out |= (if (ra > rb) ra else rb) << shift
              ri += 1
            }
            a.words(wi) = out
          }
          wi += 1
        }
        a
      }

      def finish(b: Buf): Long = {
        // Spark's own estimator (incl. the HLL++ empirical bias
        // tables) over our registers — identity by construction.
        val row = new GenericInternalRow(
          b.words.map(w => w: Any))
        new HyperLogLogPlusPlusHelper(rsd).query(row, 0)
      }

      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Distinct-count of a non-floating-point column (long/int/string…):
    * same estimate as `approx_count_distinct(c, rsd)`.
    */
  def apply(c: Column, rsd: Double): Column =
    udaf(aggregator(rsd), Encoders.LONG)
      .apply(when(c.isNotNull, xxhash64(c)))

  /** Distinct-count of a DOUBLE column: applies the builtin's
    * floating-point canonicalization (-0.0 → 0.0, NaN → canonical NaN)
    * before hashing, so the register contents match bit for bit.
    *
    * DOUBLE ONLY (r17, the r16 advisor's note): `c + lit(0.0)` widens
    * a FloatType input to double before xxhash64, while the builtin
    * hashes the 4-byte float representation — a float column here
    * would estimate from DIFFERENT register contents than
    * `approx_count_distinct`. All call sites (Profile's numeric
    * sketches) are double; pass a float column through the builtin,
    * or canonicalize without widening, before reusing this.
    */
  def fp(c: Column, rsd: Double): Column =
    udaf(aggregator(rsd), Encoders.LONG)
      .apply(when(c.isNotNull,
        xxhash64(nanvl(c + lit(0.0), lit(Double.NaN)))))
}
