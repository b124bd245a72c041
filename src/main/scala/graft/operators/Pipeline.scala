package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end pretraining-data capstone: curate → split → shuffle
  * → pack composed as ONE DataFrame program under one optimizer pass.
  * Each stage exists (and is independently oracled) as its own
  * operator; what this proves is their COMPOSITION — that the whole
  * pipeline stays a single declarative plan Catalyst can globally
  * optimize, instead of four materialization barriers with re-read
  * boundaries between them (the reference's closest analog is chained
  * HTTP calls; §2.3 beyond-reference territory).
  *
  * Deliverable per surviving document: its split, its position in the
  * split's seeded permutation, the output shard that position lands
  * in, and the context-window span its tokens occupy in the split's
  * packed token stream — the manifest a loader needs to seek any
  * training window without replaying the pipeline.
  *
  * Stages and their shapes:
  *   1. curate ([[Curate.pipeline]]'s plan): quality gate is a narrow
  *      projection; near-dup drops come from the inverted-index pair
  *      join; survivors via an unhinted anti join (AQE broadcasts the
  *      dropped set only when it actually fits).
  *   2. split ([[Sampling.splitAssign]]'s rule): pure projection —
  *      first hex char of `md5(doc_id)`.
  *   3. shuffle ([[Shuffle]]'s contract): position = rank under
  *      `md5(seed ':' doc_id)` WITHIN the split; shard = pos >> 9.
  *   4. pack ([[Pack.packChunks]]'s contract): exclusive token prefix
  *      sum in shuffled order WITHIN the split; windows = 2048 tokens
  *      (chunk ids by bit-shift, integer-exact past 2^53 tokens).
  *
  * The scale story is the fusion: steps 3 and 4 need the SAME total
  * order (split, h, doc_id), so both prefix sums ride ONE range
  * exchange via [[DistributedPrefix.exclusiveSums]] — rank and token
  * offset come out of a single three-phase pass. Per-split rebasing
  * is a 3-row broadcast join (min of each split's global prefix =
  * tokens/docs in earlier splits, because the order is split-major) —
  * no second shuffle, no per-split re-sort. PlanSpec pins the single
  * range exchange and its reuse.
  */
object Pipeline {

  /** Shuffle seed — epoch 0 of [[Shuffle.permuteSeeded]]'s contract. */
  val Seed = "epoch0"

  def manifest(s: SparkSession, dir: String): DataFrame = {
    // stage 1: curated survivors (Curate.pipeline's exact plan, kept
    // to the columns the downstream stages need)
    val dropped = Dedup.ngramJaccardPairs(s, dir)
      .select(col("id_b").as("doc_id")).distinct()
    // unhinted anti join: the dropped set is corpus-proportional (see
    // Curate.pipeline's scaladoc) — AQE broadcasts it when it fits
    val curated = TextAnalysis.quality(s, dir)
      .filter(col("keep"))
      .join(dropped, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
    // stage 2: split assignment, same rule as Sampling.splitAssign
    val hex = substring(md5(col("doc_id").cast("string")), 1, 1)
    val keyed = curated
      .withColumn("split",
        when(hex < "e", "train").when(hex === "e", "val").otherwise("test"))
      .withColumn("h",
        md5(concat(lit(Seed), lit(":"), col("doc_id").cast("string"))))
    // stages 3+4 fused: both exclusive prefix sums (doc count → rank,
    // n_tokens → token offset) over the one split-major total order
    val (summed, rel) = DistributedPrefix.exclusiveSumsAndRel(keyed,
      Seq(col("split").asc, col("h").asc, col("doc_id").asc),
      Seq((lit(1L), "gpos"), (col("n_tokens"), "gtok")))
    // rebase global prefixes to per-split ones. Under the split-major
    // order a split's first row carries exactly the totals of the
    // splits before it, so the rebase offsets are an S-row exclusive
    // cumsum of per-split totals — aggregated from the CACHED ranged
    // frame, NOT from `summed`: aggregating the phase-3 output would
    // re-execute the whole offsets join + mapPartitions pass over the
    // corpus for the second consumer (the r7 plan audit caught the
    // old min(gpos)-over-summed form doing precisely that)
    val sw = Window.orderBy(col("split"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = rel.groupBy(col("split"))
      .agg(sum(col("__w0")).as("sd"), sum(col("__w1")).as("st"))
      .select(col("split"),
        coalesce(sum(col("sd")).over(sw), lit(0L)).as("p0"),
        coalesce(sum(col("st")).over(sw), lit(0L)).as("t0"))
    summed.join(broadcast(offs), Seq("split"))
      .select(col("split"), col("doc_id"),
        (col("gpos") - col("p0")).as("pos"),
        shiftright(col("gpos") - col("p0"), 9).as("shard"),
        col("n_tokens"),
        (col("gtok") - col("t0")).as("tok_start"),
        shiftright(col("gtok") - col("t0"), 11).as("chunk_first"),
        shiftright(col("gtok") - col("t0") + col("n_tokens") - 1, 11)
          .as("chunk_last"))
      .orderBy(col("split"), col("pos"))
  }
}
