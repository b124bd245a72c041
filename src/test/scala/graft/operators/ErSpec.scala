package graft.operators

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Entity resolution on a PLANTED corpus of word-shaped names where
  * the true parent is the unique distance-<=1 match — the resolution
  * proof the serial graded corpus cannot give (see Er scaladoc).
  */
class ErSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq("merlot", "cabernet", "riesling", "syrah",
    "malbec", "verdejo", "albarino", "garnacha", "tempranillo",
    "moscatel", "palomino", "bobal", "mencia", "godello", "monastrell",
    "carinena")

  /** Clean master: 160 distinct two-word names. */
  private lazy val clean = (0 until 160).map { i =>
    (i.toLong, s"${words(i % 16)} ${words((i / 16 + i + 3) % 16)}")
  }.toDF("clean_id", "clean_name")

  /** Dirty batch: one deterministic edit per record — delete (id%3==0),
    * substitute (id%3==1), or none (id%3==2).
    */
  private lazy val dirty = (0 until 160).map { i =>
    val name = s"${words(i % 16)} ${words((i / 16 + i + 3) % 16)}"
    val pos = (i * 7) % name.length
    val typo = i % 3 match {
      case 0 => name.substring(0, pos) + name.substring(pos + 1)
      case 1 => name.substring(0, pos) + "q" + name.substring(pos + 1)
      case _ => name
    }
    (i.toLong + 1000L, typo, i.toLong)
  }.toDF("dirty_id", "dirty_name", "true_id")

  test("every planted typo resolves to exactly its true parent " +
      "(accuracy 1.0, no spurious candidates)") {
    val m = Er.matchesFor(dirty.select(col("dirty_id"), col("dirty_name")),
      clean).cache()
    val n = m.count()
    assert(n == 160L, s"expected one candidate per record, got $n")
    val correct = m.join(dirty.select(col("dirty_id"), col("true_id")),
      "dirty_id")
      .filter(col("clean_id") === col("true_id")).count()
    assert(correct == 160L, s"only $correct/160 resolved to the true parent")
  }

  test("blocking is complete for distance <= 1: blocked result equals " +
      "the brute-force cross filter") {
    val blocked = Er.matchesFor(
      dirty.select(col("dirty_id"), col("dirty_name")), clean)
      .select(col("dirty_id"), col("clean_id"))
    val brute = dirty.select(col("dirty_id"), col("dirty_name"))
      .crossJoin(clean)
      .filter(levenshtein(col("dirty_name"), col("clean_name")) <= 1)
      .select(col("dirty_id"), col("clean_id"))
    assert(blocked.exceptAll(brute).isEmpty && brute.exceptAll(blocked).isEmpty,
      "blocked candidate set diverges from brute force")
  }

  test("the plan is a pure equi-join: no cartesian product, no " +
      "nested-loop join anywhere") {
    spark.sharedState.cacheManager.clearCache()
    val df = Er.matchesFor(dirty.select(col("dirty_id"), col("dirty_name")),
      clean)
    df.collect()
    val nodes = outerPlanNodes(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "cartesian product in the ER plan")
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "nested-loop join in the ER plan")
  }
}
