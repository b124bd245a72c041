package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The diff core must classify every id exactly once, with the four
  * statuses meaning what they say.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("diff core: planted add/remove/change/unchanged all classified") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "sig")
    val curr = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("doc_id", "sig")
    val got = Snapshot.diffFrom(prev, curr).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("corpus diff: statuses partition the id universe and follow " +
      "the planted modular rules") {
    val rows = Snapshot.snapshotDiff(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status"))
    assert(rows.map(_._1).distinct.length == rows.length,
      "each doc id appears exactly once")
    val byStatus = rows.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byStatus.keySet == Set("added", "removed", "changed", "unchanged"),
      s"all four statuses must occur: ${byStatus.keySet}")
    byStatus("added").foreach(id => assert(id % 7 == 0 && id % 13 != 0,
      s"added must be new arrivals present now: $id"))
    byStatus("removed").foreach(id => assert(id % 13 == 0 && id % 7 != 0,
      s"removed must be lost docs present before: $id"))
    byStatus("changed").foreach(id =>
      assert(id % 11 == 0 && id % 7 != 0 && id % 13 != 0,
        s"changed must be re-signed docs present in both: $id"))
  }
}
