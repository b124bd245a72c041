package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Mix

/** Arrival-time mixture sampling: the stateful per-source budget must
  * reproduce the batch twin exactly when docs arrive in doc_id order,
  * carrying its token count across micro-batch boundaries.
  */
class MixStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream admission equals the oracled batch twin across " +
      "micro-batches") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val streamed = MixStream.admitted(
      mem.toDF().toDF("doc_id", "source", "text"))
    assert(streamed.isStreaming)
    val q = streamed.writeStream.format("memory").queryName("mix_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // three arrival waves in doc_id order: budget state must carry
      val (w1, rest) = docs.splitAt(docs.length / 3)
      val (w2, w3) = rest.splitAt(rest.length / 2)
      for (w <- Seq(w1, w2, w3)) {
        mem.addData(w.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val got = spark.table("mix_out").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_before")))
        .sortBy(_._1)
      val want = Mix.mixArrival(spark, sf).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_before")))
        .sortBy(_._1)
      assert(got.nonEmpty && got.length < docs.length,
        "budget must bind at this sf — all-admitted proves nothing")
      assert(got.sameElements(want))
    } finally q.stop()
  }
}
