package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit}

/** Scala-side wrappers for graft's native expressions (registered by
  * `GraftExtensions`; see each expression's scaladoc). Use these from
  * DataFrame code; SQL callers use the lowercase names directly.
  */
package object functions {

  /** Codegen dot product of two numeric arrays (VecDot). */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Cosine similarity via three vec_dots (bit-stable double folds). */
  def vecCosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    vecDot(a, b) / sqrt(vecDot(a, a)) / sqrt(vecDot(b, b))
  }

  /** Codegen squared L2 distance of two numeric arrays (VecL2Sq). */
  def vecL2Sq(a: Column, b: Column): Column = call_function("vec_l2sq", a, b)

  /** Exact set Jaccard of two SORTED long arrays via a fused merge
    * walk (SortedSetJaccard) — caller must guarantee sortedness.
    */
  def sortedSetJaccard(a: Column, b: Column): Column =
    call_function("sorted_set_jaccard", a, b)

  /** All md5-plane LSH bucket ids of an embedding in one fused pass
    * (Md5LshBuckets).
    */
  def md5LshBuckets(v: Column, bits: Int): Column =
    call_function("md5_lsh_buckets", v, lit(bits))

  /** Half-up 6-decimal rounding to exact long micro-units
    * (Round6Micros) — for bounded-group exact sums.
    */
  def round6Micros(x: Column): Column =
    call_function("round6_micros", x)

  /** One-pass MinHash signature of a string array (MinHashSig). */
  def minhashSig(shingles: Column, numPerms: Int): Column =
    call_function("minhash_sig", shingles, lit(numPerms))

  /** 64-bit SimHash of a token array (SimHash64). */
  def simhash64(tokens: Column): Column =
    call_function("simhash64", tokens)

  /** Distinct 3-token shingles of a text column (Shingles3). */
  def shingles3(text: Column): Column = call_function("shingles3", text)

  /** KMV approximate distinct count (typed Aggregator). */
  def kmvDistinct(c: Column, k: Int = 256): Column = KMVDistinct(c, k)

  /** Membership test against a serialized Bloom filter (Spark's
    * native runtime-filter expression; see operators/Bloom.scala).
    */
  def bloomMightContain(filter: Column, key: Column): Column =
    call_function("bloom_might_contain", filter, key)
}
