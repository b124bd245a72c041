package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Retrieval-style document chunking — the segmentation pass a RAG or
  * context-window pipeline runs over a corpus before embedding: each
  * document becomes overlapping fixed-size token windows (the
  * sliding-window chunker every retrieval stack ships; overlap keeps
  * sentences that straddle a boundary retrievable from both sides).
  *
  * Entirely narrow — tokenize, generate window starts, explode, slice:
  * no shuffle except the presentation sort, so the operator scales by
  * input partitioning alone and chunk emission is pipelined inside
  * whole-stage codegen. At 100 TB this is the shape you want: chunking
  * is embarrassingly parallel and anything with a join or aggregation
  * in it is doing too much work.
  *
  * Contract: windows of [[Window]] tokens every [[Stride]] tokens
  * (1-based `start_tok`), starts at 0, Stride, 2·Stride, … while the
  * start lands inside the document; the final window may be short.
  * Chunk ids are dense per document. Integer + string output columns
  * only — no float surface for the oracle hash.
  */
object Chunk {

  /** Tokens per chunk. */
  val Window = 64

  /** Tokens between consecutive chunk starts (overlap = Window −
    * Stride = 16 tokens).
    */
  val Stride = 48

  def ragChunks(s: SparkSession, dir: String): DataFrame =
    chunks(load(s, dir, "documents"), Window, Stride)

  /** Frame-parametric core — any (`doc_id`, `text`) corpus, any
    * window/stride (`ChunkSpec` exercises degenerate shapes: short
    * docs, stride = window, single-token docs).
    */
  def chunks(docs: DataFrame, window: Int, stride: Int): DataFrame =
    chunksCore(docs, window, stride)
      .orderBy(col("doc_id"), col("chunk_id"))

  /** [[chunks]] WITHOUT the presentation sort — consumers that
    * re-shuffle anyway ([[Dedup.paragraphs]] hash-aggregates the
    * chunks immediately) start here so the plan carries no dead
    * global range exchange.
    */
  private[operators] def chunksCore(docs: DataFrame, window: Int,
      stride: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - 1, lit(stride)))
          .as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        (col("start") + 1).cast("long").as("start_tok"),
        slice(col("toks"), col("start") + 1, lit(window)).as("ct"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("ct")).cast("long").as("n_toks"),
        concat_ws(" ", col("ct")).as("chunk_text"))
}
