package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Product quantization (Jégou/Douze/Schmid, TPAMI 2011) — the
  * compression half of a production IVF-PQ vector index, complementing
  * the IVF cell-probing half ([[Similarity.ivfTopK]]): each 64-dim
  * vector splits into [[M]] 8-dim subvectors, each subvector is
  * replaced by the id of its nearest sub-centroid from a [[K]]-entry
  * per-subspace codebook, and the whole vector compresses to M codes —
  * 8 nibbles, a 64× memory cut, which is what makes billion-vector
  * search fit RAM at all. Queries then rank candidates with
  * ASYMMETRIC distance (ADC): the query stays exact, each neighbor is
  * approximated by its sub-centroids, so the scan needs only the codes
  * plus a per-query 8×16 lookup table of subspace distances.
  *
  * The codebook here is DETERMINISTIC (the 16 smallest-id vectors with
  * vec_id % 29 == 3, sliced per subspace) — the same seed-quantizer
  * trade as [[Similarity.centroids]]: a k-means-trained codebook drops
  * in via [[KMeans]] exactly as it does for IVF, but the seed form
  * makes `pq_codes` expressible in oracle SQL, so the ENCODING — the
  * part with a right answer — is hash-verified, while ADC ranking
  * (whose value is recall, not exactness) is measured in `PqSpec`.
  *
  * Scale shapes: encoding is corpus × broadcast(128 codebook rows),
  * argmin folded by `max_by` at the (vector, subspace) grain — the
  * shuffle carries M rows per vector, never the M×K scored pairs.
  * ADC is codes × broadcast(query LUTs) — an equi-join on
  * (subspace, code) — then one map-side-combinable sum per
  * (query, vector) and a WindowGroupLimit top-k: the raw embedding
  * column is never read by the ranking scan, only by the (tiny) LUT
  * builder.
  */
object Pq {

  /** Subspaces per vector (64 dims / 8 per subspace). */
  val M = 8

  /** Dimensions per subspace. */
  val SubDim = 8

  /** Codes per subspace codebook (4-bit codes). */
  val K = 16

  /** Squared L2 distance between two float-array slices, folded
    * left-to-right in double — bit-identical to the oracle's
    * `list_reduce(list_zip(...))` fold.
    */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
      (x, y) => (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** The per-subspace codebook: (subspace, code, cvec_sub) — K seed
    * vectors ordered by vec_id, code = rank − 1, each sliced into M
    * subvectors. 128 rows total; every consumer broadcasts it.
    */
  def codebooks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("vec_id"))
    load(s, dir, "embeddings")
      .filter(col("vec_id") % 29 === 3)
      .orderBy(col("vec_id")).limit(K)
      .withColumn("code", (row_number().over(w) - 1).cast("long"))
      .select(col("code"), posexplode(
        transform(sequence(lit(0), lit(M - 1)),
          m => slice(col("embedding"), m * SubDim + 1, lit(SubDim)))))
      .toDF("code", "subspace", "cvec_sub")
      .select(col("subspace").cast("long").as("subspace"),
        col("code"), col("cvec_sub"))
  }

  /** PQ encoding of the corpus: (vec_id, subspace, code) — nearest
    * sub-centroid by squared L2, ties to the smallest code. M rows
    * per vector, all-integer output.
    */
  def codes(s: SparkSession, dir: String): DataFrame =
    codesUnsorted(s, dir)
      .orderBy(col("vec_id"), col("subspace"))

  private def codesUnsorted(s: SparkSession, dir: String): DataFrame = {
    val subs = load(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(
        transform(sequence(lit(0), lit(M - 1)),
          m => slice(col("embedding"), m * SubDim + 1, lit(SubDim)))))
      .toDF("vec_id", "subspace", "sub")
      .select(col("vec_id"), col("subspace").cast("long").as("subspace"),
        col("sub"))
    subs.join(broadcast(codebooks(s, dir)), Seq("subspace"))
      .withColumn("d2", l2sq(col("sub"), col("cvec_sub")))
      .groupBy(col("vec_id"), col("subspace"))
      .agg(max_by(col("code"), struct(-col("d2"), -col("code")))
        .as("code"))
  }

  val TopK = 5
  private val queryPred: Column = col("vec_id") % 100 === 0

  /** ADC approximate top-k: every query's exact subvectors score each
    * codebook entry once (the 8×16 LUT), then neighbors rank by the
    * SUM of their codes' LUT entries — the raw corpus embeddings are
    * never touched. Output (query_id, neighbor_id, rank, adc_d2).
    *
    * Fully oracled despite being a float ranking: each subspace
    * distance quantizes to 6 decimals and sums as DECIMAL (the
    * `embed_stats_scale` trick — exact, associative, order-free), so
    * the ADC score and therefore the ranking are bit-identical on
    * both engines with O(1) aggregation state. Recall vs the exact
    * [[Similarity.bruteTopK]] is additionally measured in PqSpec
    * (approximation quality is the operator's value, exactness of
    * the pipeline is the oracle's).
    */
  def adcTopK(s: SparkSession, dir: String): DataFrame = {
    val luts = load(s, dir, "embeddings").filter(queryPred)
      .select(col("vec_id").as("query_id"), posexplode(
        transform(sequence(lit(0), lit(M - 1)),
          m => slice(col("embedding"), m * SubDim + 1, lit(SubDim)))))
      .toDF("query_id", "subspace", "qsub")
      .select(col("query_id"), col("subspace").cast("long").as("subspace"),
        col("qsub"))
      .join(codebooks(s, dir), Seq("subspace"))
      .select(col("query_id"), col("subspace"), col("code"),
        l2sq(col("qsub"), col("cvec_sub")).as("d2"))
    val byQuery = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_d2"), col("neighbor_id"))
    codesUnsorted(s, dir).toDF("neighbor_id", "subspace", "code")
      .join(broadcast(luts), Seq("subspace", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(round(col("d2"), 6).cast("decimal(38,6)"))
        .cast("double").as("adc_d2"))
      .withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("adc_d2"))
      .orderBy(col("query_id"), col("rank"))
  }
}
