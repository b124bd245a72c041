package graft.operators

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MERGE clause dispatch and SCD2 close/open semantics on planted
  * frames — the cases the graded md5 batches exercise only in bulk.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val target = Seq(
    (1L, "alice", 100L),
    (2L, "bob", 200L),
    (3L, "carol", 300L),
    (4L, "dave", 400L)
  ).toDF("id", "name", "bal")

  /** One of every MERGE clause case:
    * matched U (partial — name NULL keeps target's), matched D,
    * matched I (no-op), unmatched U (no-op), unmatched D (no-op),
    * unmatched I (insert).
    */
  private lazy val batch = Seq(
    (1L, "U", null.asInstanceOf[String], Some(150L)),
    (2L, "D", null.asInstanceOf[String], None),
    (3L, "I", "newcarol", Some(999L)),
    (8L, "U", "ghost", Some(1L)),
    (9L, "D", null.asInstanceOf[String], None),
    (5L, "I", "erin", Some(500L))
  ).toDF("id", "action", "name", "bal")

  test("upsert dispatches every MERGE clause correctly") {
    val out = Merge.upsert(target, batch, "id")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, "alice", 150L, "updated"),   // partial update: NULL name kept
      (3L, "carol", 300L, "kept"),      // matched I is a no-op
      (4L, "dave", 400L, "kept"),       // untouched by the batch
      (5L, "erin", 500L, "inserted")))  // 2 deleted; 8/9 unmatched no-ops
  }

  test("upsert with an empty batch keeps every target row as 'kept'") {
    val out = Merge.upsert(target, batch.limit(0), "id")
    assert(out.count() == 4L)
    assert(out.filter(col("op") =!= "kept").isEmpty)
  }

  test("upsert plan is one shuffled equi-join: no cartesian, no BNLJ") {
    val plan = Merge.upsert(target, batch, "id").queryExecution.executedPlan
    def leaves(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
        case other => other.collect { case n => n }
      }
    val nodes = leaves(plan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
  }

  private lazy val dim0 = Seq(
    (1L, 100L, 0L, Option.empty[Long]),
    (2L, 200L, 0L, Option.empty[Long]),
    (3L, 300L, 0L, Option.empty[Long])
  ).toDF("id", "bal", "valid_from", "valid_to")

  test("scd2Apply closes changed rows, opens successors, inserts new " +
      "keys, and passes unchanged/no-batch rows through") {
    val batch1 = Seq((1L, 150L), (2L, 200L), (9L, 900L)).toDF("id", "new_val")
    val s1 = Merge.scd2Apply(dim0, batch1, "id", "bal", 5L)
      .orderBy("id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(s1.toSeq == Seq(
      (1L, 100L, 0L, 5L),   // changed: closed at 5
      (1L, 150L, 5L, -1L),  // successor opened
      (2L, 200L, 0L, -1L),  // batch value equal: NO new version
      (3L, 300L, 0L, -1L),  // not in batch: untouched
      (9L, 900L, 5L, -1L))) // unseen key: first version at 5
  }

  test("chained ticks keep exactly one current version per key and " +
      "contiguous close/open edges") {
    val s1 = Merge.scd2Apply(dim0, Seq((1L, 150L)).toDF("id", "new_val"),
      "id", "bal", 1L)
    val s2 = Merge.scd2Apply(s1, Seq((1L, 175L), (3L, 333L)).toDF("id", "new_val"),
      "id", "bal", 2L)
    // one current row per key
    val cur = s2.filter(col("valid_to").isNull).groupBy("id").count()
    assert(cur.filter(col("count") =!= 1L).isEmpty)
    // closed history from tick 1 is untouched by tick 2
    val k1 = s2.filter(col("id") === 1L).orderBy("valid_from").collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(k1.toSeq == Seq((0L, 1L), (1L, 2L), (2L, -1L)),
      s"version chain broken: ${k1.toSeq}")
  }

  test("scd2Apply with an empty batch is the identity on the dimension") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "new_val")
    val out = Merge.scd2Apply(dim0, empty, "id", "bal", 7L)
    assert(out.count() == 3L)
    assert(out.filter(col("valid_to").isNotNull).isEmpty)
  }
}
