package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
  * — the model-free "make the crawl look like the target domain"
  * selector a pre-training curator runs between raw ingest and mixing:
  * estimate per-document importance weights
  * `log w(x) = Σ_f c_f(x) · (log p̂_target(f) − log p̂_raw(f))`
  * under hashed bag-of-ngram feature models, then resample documents
  * with probability ∝ w via Gumbel top-k. Here the target domain is
  * the corpus' own `lang = 'en'` slice (a stand-in for "looks like
  * Wikipedia"); the features are 256 md5-hashed unigram buckets with
  * add-one smoothing.
  *
  * Shape at scale (the whole point of DSIR — it is nearly free next
  * to any model-based scorer):
  *  - the two feature models are ONE map-side-combinable count
  *    aggregation each over a 256-row key space — partials collapse
  *    to ≤256 rows per partition before the shuffle;
  *  - the per-bucket log-ratio table is 256 rows → broadcast back
  *    onto the token stream, so scoring is a narrow projection + one
  *    per-doc aggregation. No doc×doc interaction, no iteration, no
  *    trained parameters to ship — the "model" IS the 256-double
  *    broadcast.
  *
  * Cross-engine determinism (the [[TextAnalysis.lmScore]] discipline):
  * bucket ids are exact integer md5 arithmetic; each λ_b is
  * ln((ct+1)/(T+B)) − ln((cr+1)/(R+B)) — two ln of one correctly-
  * rounded IEEE division of exact integers; the per-doc sum folds the
  * SORTED per-occurrence score list so the addition order (and the
  * last ulp) is engine-pinned.
  */
object Dsir {

  /** Feature-space size. 256 keeps the oracle exact and the broadcast
    * trivial; production DSIR uses ~10k buckets — same plan, larger
    * (still KB-scale) broadcast.
    */
  val Buckets = 256

  /** Gumbel-top-k sample size. */
  val SampleK = 100

  /** md5-hashed unigram bucket — 4 hex digits (exact in a double on
    * any engine) mod [[Buckets]].
    */
  private def bucket(w: Column): Column =
    conv(substring(md5(w), 1, 4), 16, 10).cast("long") % Buckets

  /** Per-document importance log-weights against the `lang = 'en'`
    * target model (graded `dsir_weights`): doc_id, token count, the
    * raw log-weight and its per-token mean (length-debiased — the form
    * a thresholding filter uses, since raw Σ scales with doc length).
    */
  def weights(s: SparkSession, dir: String): DataFrame =
    weighted(s, dir).orderBy(col("doc_id"))

  /** [[weights]] without the presentation sort, for composition. */
  private[operators] def weighted(s: SparkSession, dir: String): DataFrame = {
    val d = load(s, dir, "documents")
    val occ = d.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), col("lang"), bucket(col("w")).as("b"))
      .cache()
    val tgt = occ.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val raw = occ.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    // the full 256-bucket grid: unseen buckets still carry their
    // smoothed score (c+1)/(N+B) — sequence() avoids dropping them
    val grid = s.range(Buckets).select(col("id").as("b"))
    val tT = occ.filter(col("lang") === "en")
      .agg(count(lit(1)).as("t_total"))
    val rT = occ.agg(count(lit(1)).as("r_total"))
    val lam = grid
      .join(tgt, Seq("b"), "left").na.fill(0L, Seq("ct"))
      .join(raw, Seq("b"), "left").na.fill(0L, Seq("cr"))
      .crossJoin(broadcast(tT)).crossJoin(broadcast(rT))
      .select(col("b"),
        (log((col("ct") + 1).cast("double") /
            (col("t_total") + Buckets)) -
          log((col("cr") + 1).cast("double") /
            (col("r_total") + Buckets))).as("lam"))
    occ
      .join(broadcast(lam), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        aggregate(array_sort(collect_list(col("lam"))), lit(0.0),
          (a, x) => a + x).as("sum_lw"))
      .select(col("doc_id"), col("n_toks"),
        // + 0.0 canonicalizes IEEE −0 (a rounded tiny negative) so
        // both engines emit the same zero
        (round(col("sum_lw"), 6) + 0.0).as("log_weight"),
        (round(col("sum_lw") / col("n_toks"), 6) + 0.0).as("mean_lw"))
  }

  /** The resample itself (graded `dsir_sample`): Gumbel top-k over the
    * log-weights — add an independent Gumbel draw
    * g = −ln(−ln(u)) to each document's log w and keep the K largest,
    * which samples WITHOUT replacement with inclusion ∝ w (Vieira
    * 2014). u comes from the document's own md5 (the
    * [[Sampling.weightedSample]] universe-hash: 13 hex digits over
    * 2^52, bit-identical on any engine; clamped away from 0 AND 1 so
    * both ln calls stay finite on both engines). Deterministic,
    * re-partition-stable, no RNG state; the plan is a narrow
    * projection + TakeOrderedAndProject — the ranking never sees a
    * global sort.
    */
  def sample(s: SparkSession, dir: String): DataFrame = {
    val u = least(greatest(
      conv(substring(md5(col("doc_id").cast("string")), 1, 13),
        16, 10).cast("long").cast("double") / lit(4503599627370496.0),
      lit(java.lang.Double.MIN_VALUE)), lit(1.0 - 1e-16))
    weighted(s, dir)
      .withColumn("gumbel_key",
        col("log_weight") - log(-log(u)))
      .orderBy(col("gumbel_key").desc, col("doc_id"))
      .limit(SampleK)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("gumbel_key").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("n_toks"))
  }
}
