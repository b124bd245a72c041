package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dedup, TextAnalysis}

/** The streaming contamination guard must equal the batch audit over
  * the union of its micro-batches (per-doc verdicts are independent,
  * so streaming ≡ batch exactly), and be replay-idempotent (stateless
  * probe against a frozen index).
  */
class ContaminationStreamSpec extends SparkSpec {
  import spark.implicits._

  private val benchText =
    "the quick brown fox jumps over the lazy dog tonight"
  // shares the full leading run with the benchmark: many shingles
  private val leaky =
    "the quick brown fox jumps over a sleeping cat instead"
  // shares nothing 3-gram-sized
  private val clean = "completely unrelated words about pasta recipes"
  // one shared shingle only — must stay UNDER the >= 2 bar
  private val grazing = "over the lazy hippo wanders entirely elsewhere"

  private def benchDf = Seq((100L, benchText)).toDF("doc_id", "text")

  test("flags equal the batch audit over the union; one-shingle " +
      "grazes stay unflagged; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val got = mutable.ArrayBuffer.empty[ContaminationStream.Contam]
    val q = ContaminationStream.monitor(
      mem.toDF().toDF("doc_id", "text"), benchDf) {
      (_, flags) => got.synchronized { got ++= flags }
    }
    try {
      mem.addData((1L, leaky), (2L, clean))
      q.processAllAvailable()
      mem.addData((3L, grazing), (4L, leaky + " again"))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = got.synchronized(
      got.map(c => (c.trainId, c.benchId, c.nShared, c.overlapFrac))
        .sorted.toVector)
    // the batch audit over the union of all arrived docs
    val union = Seq((1L, leaky), (2L, clean), (3L, grazing),
      (4L, leaky + " again")).toDF("doc_id", "text")
    val want = TextAnalysis.contaminationOf(
      union.select(col("doc_id").as("train_id"),
        explode(Dedup.shingles(col("text"))).as("sh")),
      benchDf.select(col("doc_id").as("bench_id"),
        explode(Dedup.shingles(col("text"))).as("sh")))
      .collect()
      .map(r => (r.getAs[Long]("train_id"), r.getAs[Long]("bench_id"),
        r.getAs[Long]("n_shared"), r.getAs[Double]("overlap_frac")))
      .sorted.toVector
    assert(streamed == want, s"stream $streamed != batch $want")
    assert(streamed.map(_._1).toSet == Set(1L, 4L),
      "exactly the two leaky docs flag; clean and grazing do not")

    // replay idempotence: the probe is a pure function of (batch,
    // frozen index) — re-measuring the same batch reproduces it
    val benchSh = benchDf.select(col("doc_id").as("bench_id"),
      explode(Dedup.shingles(col("text"))).as("sh"))
    val batch = Seq((1L, leaky)).toDF("doc_id", "text")
    val first = ContaminationStream.measure(batch, benchSh, 7L)
    val again = ContaminationStream.measure(batch, benchSh, 7L)
    assert(first == again && first.nonEmpty)
  }
}
