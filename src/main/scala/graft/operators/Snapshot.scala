package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Snapshot reconciliation — the diff a pipeline computes when a new
  * corpus drop lands next to the previous one: which documents were
  * added, removed, changed, or untouched. Everything downstream keys
  * off this (incremental dedup screens only added/changed docs,
  * embeddings recompute only the changed set, the index appends the
  * delta instead of rebuilding).
  *
  * Scale shape: each snapshot collapses to a narrow (doc_id,
  * content-signature) projection at the scan — raw text never
  * shuffles — and the diff is ONE full-outer equi-join on the doc id
  * plus a four-way CASE. Content equality via md5 signature, the
  * same engine-portable hash the samplers use.
  */
object Snapshot {

  /** The diff core over two (doc_id, sig) frames. */
  def diffFrom(prev: DataFrame, curr: DataFrame): DataFrame =
    prev.toDF("doc_id", "sig_prev")
      .join(curr.toDF("doc_id", "sig_curr"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("sig_prev").isNull, "added")
          .when(col("sig_curr").isNull, "removed")
          .when(col("sig_prev") =!= col("sig_curr"), "changed")
          .otherwise("unchanged").as("status"))

  /** Syndication matrix: for each source pair, how many distinct
    * document CONTENTS (md5 of text) appear in both — the
    * "who republishes whom" view that decides which source to keep
    * as canonical when cross-source exact duplicates collapse.
    * Per-pair counts of shared signatures plus each pair's overlap
    * fraction of the smaller source's distinct contents
    * (containment — robust when sources differ wildly in size).
    *
    * Scale shape: docs collapse to distinct (signature, source)
    * pairs at the scan; the pair generator is a self-equi-join ON
    * THE SIGNATURE (only sources sharing a content ever meet —
    * never sources × sources × docs); fractions are exact-integer
    * divisions. Hash-oracled.
    */
  def sourceOverlap(s: SparkSession, dir: String): DataFrame =
    overlapFrom(load(s, dir, "documents")
      .select(md5(col("text")).as("sig"), col("source")))

  /** Paragraph-grain syndication (oracled as
    * `source_overlap_paragraphs`): the same matrix over CCNet
    * paragraph signatures ([[Dedup.segmentParagraphs]], md5 of each
    * 32-token block). Whole-document republication is rare — partial
    * reuse (a quoted passage, shared boilerplate, a syndicated
    * section) is the common case, and it is invisible to the
    * doc-grain matrix (which reads 0 rows on this corpus) while the
    * paragraph grain surfaces it. Same signature-grain self-equi-join
    * shape; paragraph signatures are ~(tokens/32)× more numerous than
    * documents but the join key stays a 32-byte hash and the pair
    * fanout is bounded by per-signature source counts exactly as at
    * doc grain.
    */
  def sourceOverlapParagraphs(s: SparkSession, dir: String): DataFrame =
    overlapFrom(Dedup.segmentParagraphs(
        load(s, dir, "documents").select(col("doc_id"), col("text"),
          col("source")),
        Dedup.ParTokens, carry = Seq("source"))
      .select(md5(col("par_text")).as("sig"), col("source")))

  /** Shared core: the matrix over any (sig, source) frame. */
  private def overlapFrom(raw: DataFrame): DataFrame = {
    val sigs = raw.select(col("sig"), col("source")).distinct().cache()
    val sizes = sigs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_distinct"))
    // shuffle-hash pinned: both legs are the SAME cached frame, so an
    // unhinted plan lets AQE pick which side to broadcast from two
    // byte-identical runtime stats — a coin flip that executes the
    // same but flips the bench fingerprint (observed once in ~10 full
    // runs), and at 100 TB neither corpus-derived side should
    // broadcast at all. The hint pins the deterministic, scale-honest
    // shape: shuffle equi-join on the signature.
    val shared = sigs.toDF("sig", "sa").hint("shuffle_hash")
      .join(sigs.toDF("sig", "sb"), "sig")
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.toDF("sa", "na"), "sa")
      .join(sizes.toDF("sb", "nb"), "sb")
      .select(col("sa"), col("sb"), col("n_shared"),
        round(col("n_shared").cast("double")
          / least(col("na"), col("nb")), 6).as("containment"))
      .orderBy(col("sa"), col("sb"))
  }

  /** Corpus-level query (oracled as `snapshot_diff`): the "previous"
    * snapshot is derived deterministically from the same table so the
    * oracle can reproduce it — doc_id % 7 == 0 docs are new arrivals
    * (absent before), % 11 == 0 docs carried different content, and
    * the current drop lost doc_id % 13 == 0 docs. All four statuses
    * are exercised.
    */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents").select(col("doc_id"), col("text"))
    val prev = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 11 === 0, concat(col("text"), lit(" [v1]")))
          .otherwise(col("text"))).as("sig"))
    val curr = docs.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("sig"))
    diffFrom(prev, curr).orderBy(col("doc_id"))
  }
}
