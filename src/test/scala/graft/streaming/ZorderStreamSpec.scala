package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Layout

/** Streaming z-layout ingest: a bootstrap layout fills from a
  * micro-batched stream, equals the one-shot batch reshape, replays
  * are no-ops, and a simulated crashed half-append heals on replay.
  */
class ZorderStreamSpec extends SparkSpec {
  import spark.implicits._

  private def src: DataFrame = Tables.load(spark, sf, "lineitem")
    .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("streamed rows land as if reshaped whole; replay is a no-op; " +
      "a crashed half-append heals") {
    val path = Files.createTempDirectory("zstream").toString + "/zl"
    Layout.writeZBucketed(spark, src.limit(0), "l_partkey", "l_orderkey",
      path, bounds = Some((0L, 199L, 0L, 6000L)))

    val batches = (0 until 3).map(i =>
      src.filter(col("l_orderkey") % 4 === i))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val q = ZorderStream.ingest(mem.toDF()
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity"), path)
    def rowsOf(df: DataFrame) =
      df.as[(Long, Long, Long, Double)].collect().toSeq
    try {
      batches.foreach { b =>
        mem.addData(rowsOf(b): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = src.filter(col("l_orderkey") % 4 < 3)
    assert(sortedRows(spark.read.parquet(path)
      .drop("zbucket", "zbatch")) == sortedRows(streamed))

    // replayed committed batch: marker-skip, contents unchanged
    ZorderStream.ingestBatch(path, batches(1), batchId = 1L)
    assert(sortedRows(spark.read.parquet(path)
      .drop("zbucket", "zbatch")) == sortedRows(streamed))

    // crash simulation: batch 3's append ran on HALF its rows and
    // died before the marker. The replay overwrites exactly its own
    // (bucket, batch) partitions — no duplicates, no repair verb.
    val b3 = src.filter(col("l_orderkey") % 4 === 3)
    Layout.appendZBatch(spark, path, b3.filter(col("l_suppkey") < 5), 3L)
    ZorderStream.ingestBatch(path, b3, batchId = 3L)
    assert(sortedRows(spark.read.parquet(path)
      .drop("zbucket", "zbatch")) == sortedRows(src))

    // and a probe over the streamed layout matches the source box
    val probe = Layout.zOrderedProbe(spark, path, 40L, 90L, 1000L, 3000L)
    assert(sortedRows(probe) == sortedRows(src.filter(
      col("l_partkey").between(40, 90) &&
        col("l_orderkey").between(1000, 3000))))

    // compaction folds the batch partitions; contents stable
    val rewritten = Layout.compactZBuckets(spark, path)
    assert(rewritten.nonEmpty, "stream left nothing to compact")
    assert(sortedRows(spark.read.parquet(path)
      .drop("zbucket", "zbatch")) == sortedRows(src))
  }
}
