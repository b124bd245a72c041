package graft.operators

import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Naive Bayes on a PLANTED corpus with real class-conditional
  * vocabulary — the learning proof the graded corpus cannot give
  * (its lang labels share one vocabulary, so the prior is optimal
  * there and NB correctly degenerates to majority-class; the oracle
  * still verifies the machinery exactly).
  */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  /** 300 docs, 3 classes; each doc draws 20 words from its class
    * vocabulary + 10 shared noise words, all deterministically from
    * the doc id.
    */
  private lazy val planted = {
    val vocab = Map(
      "aa" -> Seq("red", "crimson", "scarlet", "ruby", "maroon", "rose"),
      "bb" -> Seq("blue", "azure", "navy", "cobalt", "teal", "cyan"),
      "cc" -> Seq("green", "olive", "jade", "lime", "forest", "mint"))
    val noise = Seq("the", "a", "of", "and", "to", "in")
    (0L until 300L).map { id =>
      val cls = Seq("aa", "bb", "cc")((id % 3).toInt)
      val own = (0 until 20).map(i => vocab(cls)(((id * 7 + i) % 6).toInt))
      val shared = (0 until 10).map(i => noise(((id * 11 + i) % 6).toInt))
      (id, cls, (own ++ shared).mkString(" "))
    }.toDF("doc_id", "lang", "text")
  }

  test("held-out accuracy far above the majority baseline on a " +
      "corpus with class-conditional vocabulary") {
    val pred = NaiveBayes.predictedFor(planted).cache()
    val held = pred.filter(col("split") === "heldout").cache()
    val n = held.count()
    assert(n > 30, s"held-out split too small ($n) to be meaningful")
    val acc = held.filter(col("lang") === col("pred")).count().toDouble / n
    val majority = held.groupBy(col("lang")).count()
      .agg(max(col("count"))).head.getLong(0).toDouble / n
    info(f"held-out accuracy $acc%.3f vs majority baseline $majority%.3f")
    assert(acc > 0.95, s"NB failed to learn planted vocabulary: $acc")
    assert(acc > majority + 0.2, "accuracy not above the prior")
  }

  test("no train/test leak: the model never counts held-out tokens " +
      "(flipping a held-out doc's text cannot change another doc's " +
      "prediction)") {
    val base = NaiveBayes.predictedFor(planted)
    // rewrite every HELD-OUT doc's text to junk; train docs untouched
    val mutated = planted.withColumn("text",
      when(substring(md5(col("doc_id").cast("string")), 1, 1) >= "e",
        lit("zzz qqq xxx")).otherwise(col("text")))
    val mutatedPred = NaiveBayes.predictedFor(mutated)
    // train-doc predictions are identical — the model saw no change
    val changed = base.filter(col("split") === "train")
      .select(col("doc_id"), col("pred"))
      .join(mutatedPred.filter(col("split") === "train")
        .select(col("doc_id"), col("pred").as("pred2")), "doc_id")
      .filter(col("pred") =!= col("pred2")).count()
    assert(changed == 0, s"$changed train predictions moved when only " +
      "held-out text changed — the model is reading the eval split")
  }

  test("the model broadcasts onto the token stream (λ table + priors " +
      "are the only broadcast sides)") {
    // earlier tests cached a frame with this exact logical plan; a
    // cache hit would satisfy the whole query from InMemoryRelation
    // and leave no join for the shape pin to see
    spark.sharedState.cacheManager.clearCache()
    val df = NaiveBayes.predictedFor(planted)
    df.collect()
    val plan = df.queryExecution.executedPlan
    info(outerPlanNodes(plan).map(_.getClass.getSimpleName)
      .filter(_.toLowerCase.contains("join")).distinct.mkString(","))
    assert(outerPlanNodes(plan).exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "no broadcast join in the scoring plan")
  }
}
