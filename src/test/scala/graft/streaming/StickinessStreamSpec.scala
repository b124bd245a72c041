package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Behavior

/** Streamed DAU/WAU maintenance must agree with the batch operator at
  * every batch boundary, and the composed tick fold must keep the
  * IvmStream replay discipline end-to-end.
  */
class StickinessStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed activity view reproduces the batch stickiness after " +
    "arbitrary batch splits") {
    val root = java.nio.file.Files.createTempDirectory("stick_stream")
      .toString
    StickinessStream.bootstrap(spark, root)
    val feed = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"))
      .orderBy(col("ts"))
      .as[(Long, java.sql.Timestamp)].collect()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val q = StickinessStream.maintain(
      mem.toDF().toDF("user_id", "ts"), root)
    try {
      def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getDate(0).toString ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      // three ragged waves; compare streamed vs batch-over-prefix at
      // EVERY boundary (a user's repeat visit in a later wave must
      // fold into the same (user, day) cell, not duplicate it)
      val cuts = Seq(feed.length / 3, 2 * feed.length / 3, feed.length)
      var from = 0
      cuts.foreach { to =>
        mem.addData(feed.slice(from, to).toIndexedSeq)
        q.processAllAvailable()
        val streamed = snap(StickinessStream.stickiness(spark, root))
        val batch = snap(Behavior.stickinessFor(
          feed.take(to).toSeq.toDF("user_id", "ts")
            .select(col("user_id"), to_date(col("ts")).as("day"))
            .distinct()))
        assert(streamed == batch, s"divergence at prefix $to")
        from = to
      }
    } finally q.stop()
  }

  test("a vacuumed committed tick replays as a no-op on the activity " +
    "view") {
    val root = java.nio.file.Files.createTempDirectory("stick_vac")
      .toString
    StickinessStream.bootstrap(spark, root)
    def delta(rows: Seq[(Long, String)]) =
      rows.toDF("user_id", "d")
        .select(col("user_id"), to_date(col("d")).as("day"),
          lit(1L).as("m"), lit(1L).as("c"))
    IvmStream.applyTick(root, Seq("user_id", "day"), Seq("c"),
      delta(Seq((1L, "2024-01-01"), (2L, "2024-01-01"))), 0L)
    IvmStream.applyTick(root, Seq("user_id", "day"), Seq("c"),
      delta(Seq((1L, "2024-01-02"))), 1L)
    val before = StickinessStream.stickiness(spark, root).collect()
      .map(_.toString).toSeq
    IvmStream.vacuum(spark, root, keep = 1)
    val st = IvmStream.applyTick(root, Seq("user_id", "day"), Seq("c"),
      delta(Seq((1L, "2024-01-01"), (2L, "2024-01-01"))), 0L)
    assert(st.nGroups == -1L, st.toString)
    val after = StickinessStream.stickiness(spark, root).collect()
      .map(_.toString).toSeq
    assert(after == before, "a vacuumed replay mutated the view")
  }
}
