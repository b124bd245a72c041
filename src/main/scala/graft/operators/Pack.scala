package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Sequence packing — the layout step between a curated corpus and a
  * pretraining data loader: documents are concatenated in a canonical
  * order and the token stream is cut into fixed-size context windows
  * (concat-then-chunk, the packing GPT-style pipelines use). The
  * deliverable is each document's GLOBAL token offset and the span of
  * context windows it lands in, so a loader can seek any window
  * without replaying the corpus. No analog in the reference (this is
  * §2.3 beyond-reference capability territory).
  *
  * The core is a distributed prefix sum — the textbook case where the
  * naive Spark formulation (`Window.orderBy(doc_id)` with no
  * partition key) silently collapses the whole corpus into ONE task.
  * The scale-correct two-phase shape used here:
  *
  *   1. range-partition by doc_id (so partition order = doc order)
  *      and sort within partitions;
  *   2. per-partition token totals — one row PER PARTITION, a frame
  *      bounded by cluster parallelism, never by data size. Their
  *      exclusive running sum (a window over that tiny frame) is each
  *      partition's starting offset;
  *   3. broadcast the offsets back onto the big side (pid equi-join —
  *      map-side, preserves the range partitioning and sort) and one
  *      streaming `mapPartitions` pass turns offset + per-row counts
  *      into per-doc global offsets.
  *
  * The `mapPartitions` is the genuine per-partition-imperative case:
  * a running sum seeded per partition has no declarative form that
  * avoids a second full shuffle (a window keyed by partition id would
  * re-exchange every row). Everything stays distributed: the only
  * single-point state is the P-row offsets frame.
  *
  * Chunk ids are bit-shifts ([[ChunkTokens]] is a power of two), so
  * the arithmetic stays integer-exact at any corpus size — a
  * double-precision `floor(x / c)` would corrupt offsets past 2^53
  * tokens.
  */
object Pack {

  /** Context window size in tokens (2^11 — see the shift arithmetic). */
  val ChunkTokens = 2048
  private val ChunkShift = 11

  /** (doc_id, n_tokens, tok_start, chunk_first, chunk_last): global
    * token offset of each doc in doc_id order and the context windows
    * its tokens span. Token = whitespace split, the same definition as
    * the text-analysis pack.
    */
  def packChunks(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    // the three-phase scaffolding (and its ReuseExchange / map-side
    // broadcast invariants) lives in [[DistributedPrefix.exclusiveSum]]
    val packed = DistributedPrefix.exclusiveSum(docs,
      Seq(col("doc_id")), col("n_tokens"), "tok_start")
    packed
      .withColumn("chunk_first", shiftright(col("tok_start"), ChunkShift))
      .withColumn("chunk_last",
        shiftright(col("tok_start") + col("n_tokens") - 1, ChunkShift))
      .orderBy(col("doc_id"))
  }

  /** Docs per packing block for [[packBins]] (2^8 — shift-derived). */
  val BinBlockDocs = 256
  private val BinBlockShift = 8

  final case class TokDoc(doc_id: Long, n_tokens: Long, grp: Long)
  final case class BinnedDoc(doc_id: Long, n_tokens: Long, grp: Long,
      bin: Long, bin_fill: Long)

  /** NO-SPLIT packing — the variant for objectives that must not let
    * a document cross a context-window boundary: greedy first-fit in
    * doc_id order; a doc that would overflow the current bin starts
    * the next one (an oversized doc occupies a bin alone). Output per
    * doc: its packing block, bin number within the block, and the
    * bin's fill after placement.
    *
    * Greedy packing is inherently sequential — bin state after doc i
    * feeds doc i+1 — so a GLOBAL greedy pack cannot be parallelized
    * exactly. The scale answer (same one production packers use) is
    * block-local packing: blocks of [[BinBlockDocs]] consecutive docs
    * (`grp = doc_id >> 8`, deterministic and oracle-reproducible) pack
    * independently, costing at most one under-filled bin per block
    * boundary. Physically: one shuffle keyed by block, then a bounded
    * in-memory fold per group (`flatMapGroups` — ≤256 rows held, the
    * genuine sequential-within-bounded-group case). Blocks are
    * uniform by construction, so the shuffle cannot skew.
    */
  def packBins(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    load(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        shiftright(col("doc_id"), BinBlockShift).as("grp"))
      .as[TokDoc]
      .groupByKey(_.grp)
      .flatMapGroups { (g, it) =>
        val docs = it.toArray.sortBy(_.doc_id) // shuffle order isn't doc order
        var bin = 0L
        var fill = 0L
        var first = true
        docs.iterator.map { d =>
          if (first) { fill = d.n_tokens; first = false }
          else if (fill + d.n_tokens > ChunkTokens) { bin += 1; fill = d.n_tokens }
          else fill += d.n_tokens
          BinnedDoc(d.doc_id, d.n_tokens, g, bin, fill)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }
}
