package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Seeded deterministic corpus shuffle — the global permutation a
  * training pipeline runs between curation and sequence packing so
  * gradient batches don't follow source/crawl order, re-run per epoch
  * with a new seed. RNG-based `orderBy(rand())` is non-reproducible
  * across engines, partitionings and reruns (the [[Sampling]]
  * argument); instead each document's position is its rank under
  * `md5(seed ':' doc_id)` — every engine agrees on the hash
  * bit-for-bit, so the permutation is auditable and any range of it
  * can be recomputed independently (a loader can ask "docs at
  * positions [a,b)" without materializing the shuffle).
  *
  * Shape at scale: ONE range exchange on the hash — the unavoidable
  * shuffle that IS the operation — then the [[DistributedPrefix]]
  * three-phase rank (per-partition counts, P-row offset cumsum,
  * map-side offset join). No global single-task window anywhere.
  * The output shard (`pos >> 9` — 512 docs per shard) is the write
  * partitioning a pipeline hands to `partitionBy`: consecutive
  * positions land in the same shard, so shard files ARE contiguous
  * slices of the shuffled order.
  */
object Shuffle {

  /** Docs per output shard (2^9 — shift-derived, integer-exact). */
  val ShardDocs = 512
  private val ShardShift = 9

  def permute(s: SparkSession, dir: String): DataFrame =
    permuteSeeded(s, dir, "epoch0").orderBy(col("doc_id"))

  /** (doc_id, h, pos, shard) WITHOUT the presentation sort — consumers
    * that re-partition anyway ([[Layout.writeShuffledShards]]) start
    * here so the plan carries no dead global exchange. `h` is kept in
    * the output so a consumer can verify any row's placement locally.
    */
  def permuteSeeded(s: SparkSession, dir: String, seed: String): DataFrame = {
    val keyed = load(s, dir, "documents")
      .select(col("doc_id"),
        md5(concat(lit(seed), lit(":"), col("doc_id").cast("string")))
          .as("h"))
    DistributedPrefix.exclusiveSum(keyed,
      Seq(col("h").asc, col("doc_id").asc), lit(1L), "pos")
      .select(col("doc_id"), col("h"), col("pos"),
        shiftright(col("pos"), ShardShift).as("shard"))
  }
}
