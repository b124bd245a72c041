package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.engine.Lake
import graft.operators.{Curate, Pipeline}

/** The reference's thesis demo (eval.tex:31-41: upload a CSV, find it,
  * extract filtered rows over HTTP) generalized to the FULL engine:
  * the reference's own fixtures travel ingest → content addressing →
  * metadata search → QAST extraction over the HTTP surface, then the
  * extracted rows become a documents corpus and run the whole
  * curation pipeline — quality gate, near-dup removal, split
  * assignment, shuffled sharded manifest — with the accounting
  * invariants asserted end-to-end. What a real lake-to-training-run
  * user does, on the reference's own data.
  */
class CurationDemoSpec extends SparkSpec with BeforeAndAfterAll {

  private lazy val lake = new Lake(spark, Files.createTempDirectory("demo"))
  private lazy val server = LakeServer.start(lake, sfDir = sf)
  private lazy val base = s"http://localhost:${server.boundPort}"
  private val client = HttpClient.newHttpClient()
  private val mapper = new ObjectMapper()

  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  private def post(path: String, body: Array[Byte],
      ctype: String = "application/json"): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .header("Content-Type", ctype)
      .POST(BodyPublishers.ofByteArray(body)).build(),
      BodyHandlers.ofString())

  private val fixtures = "/root/reference/resources/test"

  test("fixtures to training manifest, end to end over HTTP") {
    assume(Files.exists(Paths.get(s"$fixtures/population.csv")))

    // 1. ingest both reference fixtures through the HTTP surface
    val csvCid = {
      val r = post("/file",
        Files.readAllBytes(Paths.get(s"$fixtures/population.csv")),
        "text/csv")
      assert(r.statusCode == 200)
      mapper.readTree(r.body).get("cid").asText
    }
    val jsonCid = {
      val r = post("/file",
        Files.readAllBytes(Paths.get(s"$fixtures/projects.json")),
        "application/json")
      assert(r.statusCode == 200)
      mapper.readTree(r.body).get("cid").asText
    }

    // 2. register datasets and find them back by topic
    Seq(csvCid -> "population", jsonCid -> "projects").foreach {
      case (cid, topic) =>
        val r = post("/dataset",
          s"""{"file":"$cid","description":"$topic fixture",
              "source":"reference tests","topics":["$topic","demo"]}"""
            .getBytes("UTF-8"))
        assert(r.statusCode == 200, r.body)
    }
    val found = post("/find",
      """["&&", [".", ["$"], "topics"], ["demo"]]""".getBytes("UTF-8"))
    assert(found.statusCode == 200)
    assert(mapper.readTree(found.body).size == 2)

    // 3. thesis-demo extraction parity plus the full-table pull
    val vnm = post(s"/extract/$csvCid",
      """["~", [".", ["$"], "country_name"], "Vi.tnam"]""".getBytes("UTF-8"))
    assert(mapper.readTree(vnm.body).size == 1 &&
      mapper.readTree(vnm.body).get(0).get("country_code").asText == "VNM")
    val allRows = mapper.readTree(
      post(s"/extract/$csvCid", """["&"]""".getBytes("UTF-8")).body)
    assert(allRows.size == 214, s"population.csv rows: ${allRows.size}")
    val projRows = mapper.readTree(
      post(s"/extract/$jsonCid", """["&"]""".getBytes("UTF-8")).body)
    assert(projRows.size == 3)

    // 4. the extracted rows become a documents corpus: row text mixes
    // the entity fields with a shared prose frame — shared runs short
    // enough that distinct countries stay below the near-dup bar,
    // while the two all-blank-name fixture artifacts fail quality
    import spark.implicits._
    val csvDocs = allRows.elements.asScala.zipWithIndex.map {
      case (row, i) =>
        val name = row.get("country_name").asText.toLowerCase
        val code = row.get("country_code").asText.toLowerCase
        (i.toLong,
          s"$name population series code $code from the world bank " +
            s"annual indicator table for $name spanning sixty years")
    }.toSeq
    val projDocs = projRows.elements.asScala.zipWithIndex.map {
      case (row, i) =>
        (1000L + i, Option(row.get("description"))
          .map(_.asText.toLowerCase).getOrElse(""))
    }.toSeq
    val corpusDir = Files.createTempDirectory("demo-corpus").toString
    (csvDocs ++ projDocs)
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", when(col("doc_id") < 1000L,
        lit("population.csv")).otherwise(lit("projects.json")))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$corpusDir/documents.parquet")

    // 5. curation accounting: the counters must tile the corpus
    val st = Curate.stats(spark, corpusDir).head
    assert(st.getAs[Long]("n_docs") == 217)
    assert(st.getAs[Long]("n_quality") +
      st.getAs[Long]("dropped_quality") == 217)
    assert(st.getAs[Long]("n_curated") +
      st.getAs[Long]("dropped_neardup") == st.getAs[Long]("n_quality"))
    assert(st.getAs[Long]("n_curated") > 100,
      s"demo corpus must survive curation non-trivially: $st")

    // 6. the training manifest over the curated survivors: every split
    // is a contiguous 0-based sequence with exact running token
    // offsets — the file a loader consumes
    val manifest = Pipeline.manifest(spark, corpusDir).collect()
    assert(manifest.length == st.getAs[Long]("n_curated"))
    manifest.groupBy(_.getAs[String]("split")).foreach { case (sp, rows) =>
      assert(Set("train", "val", "test").contains(sp))
      val ordered = rows.sortBy(_.getAs[Long]("pos"))
      assert(ordered.map(_.getAs[Long]("pos")).toSeq ==
        (0L until rows.length.toLong), s"$sp positions not contiguous")
      val tokStarts = ordered.map(_.getAs[Long]("tok_start"))
      val nToks = ordered.map(_.getAs[Long]("n_tokens"))
      assert(tokStarts.head == 0L)
      tokStarts.zip(nToks).zip(tokStarts.tail).foreach {
        case ((s0, n), s1) => assert(s0 + n == s1, s"$sp token offsets")
      }
    }
  }
}
