package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.{Pii, TextAnalysis}

/** The stateless curation stages (PII scrub, quality scoring) are
  * streaming-ready: the SAME projection runs under readStream in
  * append mode, and a stream fed the batch's rows emits byte-identical
  * results. This is the arrival-time form of the curation pipeline —
  * docs scored/scrubbed as they land, no batch boundary.
  */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "short"),
    (30L, "value table part row fast with by at from is on the of and to in"),
    (7L, "xyzzy plugh xyzzy plugh xyzzy plugh xyzzy plugh xyzzy plugh"))

  test("pii scrub: stream output = batch output, row for row") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamed = Pii.scrubRows(mem.toDF().toDF("doc_id", "text"))
    assert(streamed.isStreaming)
    val q = streamed.writeStream.format("memory").queryName("pii_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(docs.take(2): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("pii_out").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_emails"),
          r.getAs[String]("redacted_md5"), r.getAs[Boolean]("has_pii")))
        .sortBy(_._1)
      val want = Pii.scrubRows(docs.toDF("doc_id", "text")).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_emails"),
          r.getAs[String]("redacted_md5"), r.getAs[Boolean]("has_pii")))
        .sortBy(_._1)
      assert(got.sameElements(want))
    } finally q.stop()
  }

  test("quality: stream output = batch output, keep flags included") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamed = TextAnalysis.qualityRows(mem.toDF().toDF("doc_id", "text"))
    assert(streamed.isStreaming)
    val q = streamed.writeStream.format("memory").queryName("quality_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("quality_out").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"),
          r.getAs[Double]("ttr"), r.getAs[Boolean]("keep")))
        .sortBy(_._1)
      val want = TextAnalysis.qualityRows(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"),
          r.getAs[Double]("ttr"), r.getAs[Boolean]("keep")))
        .sortBy(_._1)
      assert(got.sameElements(want))
    } finally q.stop()
  }
}
