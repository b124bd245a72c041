package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Ranked lexical retrieval over the document corpus — the search
  * half a RAG pipeline pairs with the ANN index ([[Similarity]]/
  * [[Pq]]/[[Sq]]): BM25 (Robertson/Walker, the Lucene default) with
  * the standard k1 = 1.2, b = 0.75 parameters and Lucene's
  * always-positive idf form ln(1 + (N − df + 0.5)/(df + 0.5)).
  *
  * The query workload is DERIVED deterministically from the corpus —
  * the [[NumQueryTerms]] RAREST terms (lowest document frequency,
  * ties by term), the discriminative end of the vocabulary where
  * idf carries signal — so the whole operator is a pure function of the
  * table and hash-oracles in DuckDB (`bm25_topk`), including the
  * floating-point score: every arithmetic step is written in the
  * same order on both engines, and `ln` parity is already
  * established by the tf-idf and LM-score oracles.
  *
  * Scale shape: one corpus scan + explode feeds tf (cached — three
  * consumers), doc lengths and document frequencies as map-side-
  * combinable aggregates; the corpus-wide constants (N, Σdl) are a
  * 1-row broadcast and the query-term table a [[NumQueryTerms]]-row
  * broadcast, so scoring is one narrow pass over the posting rows of
  * the query terms only — never a corpus×queries join — followed by
  * a per-term WindowGroupLimit top-[[TopDocs]]. At 100 TB this is
  * the inverted-index probe shape: work scales with the query terms'
  * posting lists, not the corpus.
  */
object Retrieval {

  /** BM25 term-frequency saturation. */
  val K1 = 1.2

  /** BM25 length normalization. */
  val B = 0.75

  /** Derived query terms per run. */
  val NumQueryTerms = 5

  /** Documents returned per query term. */
  val TopDocs = 10

  def bm25Top(s: SparkSession, dir: String): DataFrame = {
    val terms = load(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .cache()
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val qterms = dfreq
      .orderBy(col("df"), col("term")).limit(NumQueryTerms)
      .select(col("term"), col("df"))
    val avgdl = col("sumdl").cast("double") / col("n")
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val score = idf * ((col("tf") * lit(2.2)) /
      (col("tf") + lit(K1) * (lit(0.25) + lit(B) * (col("dl") / avgdl))))
    val w = Window.partitionBy(col("term"))
      .orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(qterms), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopDocs)
      .select(col("term"), col("doc_id"), col("rank"),
        round(col("score"), 6).as("score"))
      .orderBy(col("term"), col("rank"))
  }
}
