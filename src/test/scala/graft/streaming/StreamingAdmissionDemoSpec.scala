package graft.streaming

import java.nio.file.{Files, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Lake

/** The streaming half of the thesis demo (CurationDemoSpec is the
  * batch half): the reference's own fixture files are ingested through
  * the engine (content store + QAST extraction), become a documents
  * corpus, and then ARRIVE AS A STREAM — doc_id-ordered chunks through
  * `AdmissionStream.admit`'s quality → near-dup → contamination →
  * durable store pipeline. The pin is exact equivalence: the curated
  * store after the stream drains equals `AdmissionStream.admittedBatch`
  * over the same corpus in one shot (the admission fold is
  * order-deterministic and threads its FIFO state across batches, so
  * chunked sequential admission ≡ whole-corpus admission). Streaming
  * intake and batch curation are the same pipeline, proven on real
  * fixture data.
  */
class StreamingAdmissionDemoSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = "/root/reference/resources/test"

  test("fixture corpus streamed in chunks admits exactly the batch " +
      "pipeline's curated set; the planted benchmark leak is refused") {
    assume(Files.exists(Paths.get(s"$fixtures/population.csv")))

    // 1. engine ingest: fixtures through the content store, rows back
    // out via QAST extraction (the /extract surface minus HTTP)
    val lake = new Lake(spark, Files.createTempDirectory("sdemo"))
    val csvCid = lake.addFile(
      Files.readAllBytes(Paths.get(s"$fixtures/population.csv")),
      "text/csv")
    val jsonCid = lake.addFile(
      Files.readAllBytes(Paths.get(s"$fixtures/projects.json")),
      "application/json")
    val csvRows = lake.extract(csvCid, """["&"]""")
      .fold(e => fail(s"csv extract: $e"), identity).collect()
    val projRows = lake.extract(jsonCid, """["&"]""")
      .fold(e => fail(s"json extract: $e"), identity).collect()
    assert(csvRows.length == 214 && projRows.length == 3)

    // 2. the corpus: each row's text leads with its own numeric series
    // values so distinct countries sit well below the MinHash near-dup
    // bar (the shared prose frame alone would put pairwise Jaccard at
    // the 0.5 threshold and the admission fold would collapse the
    // corpus); blank project descriptions fail quality
    def yr(row: org.apache.spark.sql.Row, c: String): String =
      Option(row.getAs[Any](c)).map(_.toString).getOrElse("zero")
    val docs = (csvRows.zipWithIndex.map { case (row, i) =>
      val name = row.getAs[String]("country_name").toLowerCase
      val code = row.getAs[String]("country_code").toLowerCase
      (i.toLong,
        s"$name population was ${yr(row, "year_1960")} in nineteen " +
          s"sixty then ${yr(row, "year_1990")} in nineteen ninety and " +
          s"reached ${yr(row, "year_2019")} by twenty nineteen series " +
          s"code $code world bank table")
    } ++ projRows.zipWithIndex.map { case (row, i) =>
      (1000L + i,
        Option(row.getAs[String]("description")).getOrElse("")
          .toLowerCase)
    }).toSeq.sortBy(_._1)

    // 3. frozen benchmark: a verbatim excerpt of one corpus document
    // (a planted eval-set leak). The excerpt is the doc's UNIQUE
    // prefix — name + its own population number — because the
    // doc-level contamination verdict fires at >= 2 shared shingles
    // by design (eval leakage is judged aggressively): a full-doc
    // benchmark would share the prose frame with every country and
    // correctly flag the whole corpus, which is the guard working,
    // not the demo we want
    val plantedId = docs.find(_._2.startsWith("vietnam")).map(_._1)
      .getOrElse(fail("fixture corpus lost its vietnam row"))
    val excerpt = docs.find(_._1 == plantedId).get._2
      .split(" ").take(4).mkString(" ")
    val bench = Seq((9000L, excerpt)).toDF("doc_id", "text")

    // 4. batch twin over the whole corpus at once
    val batchAdmitted = AdmissionStream.admittedBatch(
      docs.toDF("doc_id", "text"), bench).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Long]("bucket"), r.getAs[Int]("n_compared"))).toSet
    assert(batchAdmitted.size > 100,
      s"fixture corpus must survive admission non-trivially: " +
        s"${batchAdmitted.size}")
    assert(!batchAdmitted.exists(_._1 == plantedId),
      "the planted benchmark leak must not be admitted")

    // 5. the same corpus as a rate-limited stream: doc_id-ordered
    // chunks of ~50, one micro-batch each
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stats = mutable.ArrayBuffer.empty[AdmissionStream.BatchStats]
    val store = Files.createTempDirectory("sdemo-store")
      .toString + "/curated"
    val q = AdmissionStream.admit(
      mem.toDF().toDF("doc_id", "text"), bench, store) {
      b => stats.synchronized { stats += b }
    }
    try {
      docs.grouped(50).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    // 6. equivalence: the curated store is exactly the batch set
    val stored = spark.read.parquet(store)
      .select("doc_id", "text", "bucket", "n_compared").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Long]("bucket"), r.getAs[Int]("n_compared"))).toSet
    assert(stored == batchAdmitted,
      s"streamed store (${stored.size}) != batch pipeline " +
        s"(${batchAdmitted.size}); " +
        s"only-streamed=${(stored -- batchAdmitted).take(3)} " +
        s"only-batch=${(batchAdmitted -- stored).take(3)}")

    // 7. accounting tiles: stored rows match the stats ledger, and
    // the contamination stage refused at least the planted leak
    val ledger = stats.synchronized(stats.toVector)
    assert(ledger.map(_.nStored).sum == stored.size.toLong)
    assert(ledger.map(_.nContaminated).sum >= 1L,
      s"the planted leak must be refused by contamination: $ledger")
  }
}
