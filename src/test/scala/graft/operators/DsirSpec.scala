package graft.operators

import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance resampling: the weights actually prefer the target
  * domain, the Gumbel resample is biased toward it, and the scoring
  * join ships the 256-double model — never the corpus.
  */
class DsirSpec extends SparkSpec {

  test("importance weights lift the target domain: mean per-token " +
      "log-weight of en docs exceeds non-en") {
    val w = Dsir.weights(spark, sf)
      .join(graft.Tables.load(spark, sf, "documents")
        .select(col("doc_id"), col("lang")), "doc_id")
    val Array(en, rest) = w
      .groupBy(col("lang") === "en")
      .agg(avg(col("mean_lw")).as("m"))
      .orderBy(col("m").desc)
      .collect().map(_.getDouble(1))
    assert(en > rest,
      s"target-domain mean $en not above non-target $rest")
  }

  test("gumbel resample over-represents the target domain vs its " +
      "corpus share") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val corpusEnFrac = docs.filter(col("lang") === "en").count().toDouble /
      docs.count()
    val sampled = Dsir.sample(spark, sf)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val sampleEnFrac = sampled.filter(col("lang") === "en").count()
      .toDouble / sampled.count()
    assert(sampleEnFrac > corpusEnFrac,
      s"sample en-fraction $sampleEnFrac ≤ corpus $corpusEnFrac")
  }

  test("the model broadcasts, the corpus does not: scoring join is a " +
      "BroadcastHashJoin on the 256-row λ table") {
    val plan = Dsir.weights(spark, sf).queryExecution.executedPlan
    val bhj = outerPlanNodes(plan).collect {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "no broadcast join in the scoring plan")
  }
}
