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

  test("source overlap: planted syndication counted once per content, " +
      "containment normalizes by the smaller source") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ovl").toString
    // source a: contents {X, Y, Z}; b republishes X twice and Y once
    // (distinct contents shared = 2); c is disjoint
    Seq(
      (1L, "X text", "en", "a", 6L), (2L, "Y text", "en", "a", 6L),
      (3L, "Z text", "en", "a", 6L),
      (4L, "X text", "en", "b", 6L), (5L, "X text", "en", "b", 6L),
      (6L, "Y text", "en", "b", 6L),
      (7L, "W text", "en", "c", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Snapshot.sourceOverlap(spark, dir).collect()
      .map(r => (r.getAs[String]("sa"), r.getAs[String]("sb")) ->
        (r.getAs[Long]("n_shared"), r.getAs[Double]("containment"))).toMap
    // only the (a, b) pair shares content; duplicate republications
    // of X collapse to ONE shared signature
    assert(got.keySet == Set(("a", "b")), s"unexpected pairs: $got")
    assert(got(("a", "b"))._1 == 2L, s"X and Y shared once each: $got")
    // containment: 2 shared of min(|a|=3, |b|=2 distinct contents) = 1.0
    assert(got(("a", "b"))._2 == 1.0,
      s"b's distinct contents are fully contained in a: $got")
  }

  test("paragraph-grain overlap: partial cross-source reuse invisible " +
      "to the doc-grain matrix is surfaced at block grain") {
    val dir = java.nio.file.Files.createTempDirectory("graft-povl").toString
    // one shared 32-token block embedded in otherwise-distinct docs:
    // no two documents are byte-identical, so doc grain sees nothing
    val block = (1 to 32).map(i => s"shared$i").mkString(" ")
    val padA = (1 to 32).map(i => s"pada$i").mkString(" ")
    val padB = (1 to 32).map(i => s"padb$i").mkString(" ")
    Seq(
      (1L, s"$block $padA alpha", "en", "a", 6L),
      (2L, s"$block $padB beta", "en", "b", 6L),
      (3L, s"only in c $padA", "en", "c", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    assert(Snapshot.sourceOverlap(spark, dir).isEmpty,
      "no whole document repeats across sources")
    val got = Snapshot.sourceOverlapParagraphs(spark, dir).collect()
      .map(r => (r.getAs[String]("sa"), r.getAs[String]("sb")) ->
        r.getAs[Long]("n_shared")).toMap
    // docs 1 and 2 segment to blocks [shared][pad ...tail], sharing
    // exactly the leading 32-token block; c shares nothing
    assert(got == Map(("a", "b") -> 1L),
      s"paragraph grain must find exactly the planted shared block: $got")
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
