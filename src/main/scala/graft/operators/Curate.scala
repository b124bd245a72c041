package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composite curation pipeline — what this engine exists for at
  * 100 TB: one declarative plan that quality-filters, near-dedups and
  * selects canonical documents, end to end.
  *
  * Stages (all reusing the pack operators, so each is independently
  * oracle-checked elsewhere):
  *   1. quality gate: `TextAnalysis.quality().keep`
  *   2. near-dup clusters: `Dedup.ngramJaccard` pairs at J ≥ 0.5;
  *      the lower doc_id of each pair is the canonical survivor, any
  *      doc appearing as the higher side of a pair is dropped
  *      (deterministic, order-free);
  *   3. survivors joined back for the curated corpus with its quality
  *      metrics.
  *
  * Plan shape at scale: stage 1 is a narrow projection; stage 2 is the
  * inverted-index join (shuffles on shingle hash); stage 3 is an anti
  * join against the dropped-id set — deliberately UNHINTED: near-dup
  * drop rates on web corpora run 10-50%, so the dropped set is
  * corpus-proportional (billions of 8-byte ids at 100 TB — past the
  * broadcast hard limit). AQE converts the anti join to broadcast at
  * runtime when the set is actually small; when it isn't, the shuffled
  * anti join on the 8-byte key is the correct shape. Nothing touches
  * the driver.
  */
object Curate {

  def pipeline(s: SparkSession, dir: String): DataFrame = {
    val quality = TextAnalysis.quality(s, dir)
    val dropped = Dedup.ngramJaccardPairs(s, dir)
      .select(col("id_b").as("doc_id")).distinct()
    quality.filter(col("keep"))
      .join(dropped, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens"), col("ttr"), col("stop_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-level accounting of what the pipeline kept/dropped — the
    * numbers a pipeline operator reports after each run.
    */
  def stats(s: SparkSession, dir: String): DataFrame = {
    // One job: mark every doc with its quality gate and near-dup flag,
    // then fold all five counters in a single aggregation — the
    // three-action form scanned the corpus and re-ran the pair join
    // per counter.
    val dropped = Dedup.ngramJaccardPairs(s, dir)
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("neardup", lit(true))
    TextAnalysis.quality(s, dir)
      .join(dropped, Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("n_docs"),
        count_if(col("keep")).as("n_quality"),
        count_if(!col("keep")).as("dropped_quality"),
        count_if(col("keep") && col("neardup").isNotNull)
          .as("dropped_neardup"),
        count_if(col("keep") && col("neardup").isNull).as("n_curated"))
  }
}
