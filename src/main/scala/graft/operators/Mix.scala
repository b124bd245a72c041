package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Data mixing — the source-weighting step that turns a curated pool
  * into a training mixture: each source gets a token budget from a
  * target weight profile, and documents are admitted per source in a
  * deterministic priority order until the budget fills. This is the
  * "sample the mixture" stage every pretraining pipeline runs after
  * curation (the per-source weights are the tuned knob); no analog in
  * the reference (§2.3 beyond-reference territory).
  *
  * Semantics (all integer-exact, so the SQL oracle reproduces the
  * admission set bit-for-bit):
  *
  *   - weight of `srcK` = max(10 − K, 1) — a linearly decaying integer
  *     profile standing in for the tuned mixture (the operator is
  *     agnostic to the profile; only determinism matters here);
  *   - source budget = corpus_tokens × weight ∕ (2 × Σweights), in
  *     INTEGER arithmetic (the ∕2 is the global 50% take);
  *   - priority = md5(doc_id) — a deterministic corpus-stable shuffle;
  *   - a doc is admitted while the tokens admitted BEFORE it are under
  *     budget; the doc crossing the boundary is kept (concat-then-cut
  *     mixing never wastes a partial window), then the source closes.
  *
  * Shape at scale: one map-side-combinable aggregation for per-source
  * totals (broadcast back — the budget table has one row per SOURCE),
  * then one ordered window per source for the running admission sum.
  * The window partitions by source, so a single colossal source
  * serializes its own cumsum; at that scale the per-source window
  * swaps for the two-phase distributed prefix sum in [[Pack]] (range-
  * partition by priority within source → per-partition totals →
  * broadcast offsets) — same contract, no single-task stage. The
  * window form is kept here because it is the plan AQE handles well
  * at per-source cardinalities up to hundreds of millions of rows.
  */
object Mix {

  /** Weight of source `srcK`: max(10 − K, 1). */
  private def weight(src: org.apache.spark.sql.Column) =
    greatest(lit(10) - regexp_extract(src, "[0-9]+", 0).cast("int"), lit(1))
      .cast("long")

  def mixSources(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string").cast("binary")).as("pri"))
    // per-source weights; Σweights and corpus total as 1-row frames.
    // srcs is source-count-sized — cached so its two consumers
    // (totals, budgets) don't each re-scan the corpus to rebuild it
    val srcs = docs.groupBy(col("source"))
      .agg(sum("n_tokens").as("src_tokens"))
      .withColumn("w", weight(col("source")))
      .cache()
    val totals = srcs.agg(sum("w").as("wsum"),
      sum("src_tokens").as("corpus_tokens"))
    // integer budget: corpus × w div (2 × wsum) — `div`, not `/`
    // (Spark's `/` is DOUBLE division; past 2^53 tokens it would
    // corrupt budgets). corpus_tokens × w stays far under 2^63 for
    // any real corpus (100 TB ≈ 2.5e13 tokens × weight ≤ 10).
    val budgets = srcs.crossJoin(broadcast(totals))
      .select(col("source"), col("src_tokens"),
        expr("corpus_tokens * w div (2 * wsum)").as("budget"))
    val byPri = Window.partitionBy(col("source"))
      .orderBy(col("pri"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.join(broadcast(budgets), "source")
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(byPri),
        lit(0L)))
      .filter(col("cum_before") < col("budget"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("budget"), col("cum_before"))
      .orderBy(col("doc_id"))
  }

  /** Fixed per-source token budget for the ARRIVAL-TIME mixer (a
    * stream cannot know corpus totals up front, so the budget is the
    * configured knob rather than a derived share).
    */
  val ArrivalBudget = 1000L

  /** Arrival-order admission — the batch form of the streaming mixer
    * ([[graft.streaming.MixStream]]): docs arrive in doc_id order and
    * a source admits while its running token total is under the fixed
    * budget (the doc crossing the boundary is kept, then the source
    * closes — the same boundary rule as [[mixSources]]). This batch
    * twin is the oracle contract the stateful streaming operator must
    * reproduce exactly.
    */
  def mixArrival(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val byArrival = Window.partitionBy(col("source"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(byArrival), lit(0L)))
      .filter(col("cum_before") < lit(ArrivalBudget))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_before"))
      .orderBy(col("doc_id"))
  }

  /** The mixture audit: realized vs requested share per source — what
    * a pipeline logs to confirm the mix landed (admitted tokens per
    * source, its budget, and the fill ratio). The ratio is one double
    * division of two exact integers — correctly rounded IEEE, so both
    * engines produce the identical bit pattern (an integer-ppm form
    * would overflow int64 at 100 TB: admitted × 10^6 ≈ 10^19).
    */
  def mixAudit(s: SparkSession, dir: String): DataFrame =
    mixSources(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("admitted_tokens"),
        first(col("budget")).as("budget"))
      .select(col("source"), col("n_docs"), col("admitted_tokens"),
        col("budget"),
        round(col("admitted_tokens").cast("double") / col("budget"), 6)
          .as("fill_ratio"))
      .orderBy(col("source"))
}
