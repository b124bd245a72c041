package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.{Cid, ContentStore}

/** The CID DataSource V2 connector: write-side ingest, read-side
  * round-trip, column pruning, and cid filter pushdown into the
  * partition plan.
  */
class CidSourceSpec extends SparkSpec {
  import spark.implicits._

  private def sha(b: Array[Byte]): String = Cid.ofBytes(b).cid

  private lazy val root = {
    val dir = Files.createTempDirectory("cidsource")
    val store = new ContentStore(dir)
    store.add("alpha content".getBytes("UTF-8"))
    store.add("beta".getBytes("UTF-8"))
    store.add(("gamma " * 100).getBytes("UTF-8"))
    dir.toString
  }

  test("read: every blob surfaces with correct cid, length, content") {
    val rows = spark.read.format("cid").option("store", root).load()
      .collect().map(r => (r.getAs[String]("cid"), r.getAs[Long]("length"),
        r.getAs[Array[Byte]]("content")))
    assert(rows.length == 3)
    rows.foreach { case (cid, len, bytes) =>
      assert(sha(bytes) == cid)   // address really is the content hash
      assert(bytes.length.toLong == len)
    }
  }

  test("column pruning: a metadata-only projection reads no content bytes") {
    val df = spark.read.format("cid").option("store", root).load()
      .select("cid", "length")
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("cols=cid,length"), desc)
    assert(!desc.contains("content"), desc)
    assert(df.count() == 3)
  }

  test("filter pushdown: cid = x shrinks the partition plan to one blob") {
    val target = sha("beta".getBytes("UTF-8"))
    val df = spark.read.format("cid").option("store", root).load()
      .filter(col("cid") === target)
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("cids=1"), desc) // pruned BEFORE planning
    val row = df.collect().head
    assert(new String(row.getAs[Array[Byte]]("content"), "UTF-8") == "beta")
  }

  test("absent cids behave like filters on an empty key, not task failures") {
    val target = sha("beta".getBytes("UTF-8"))
    val df = spark.read.format("cid").option("store", root)
      .option("cids", s"$target,sha256-doesnotexist").load()
    val got = df.select("cid").collect().map(_.getString(0))
    assert(got.toSeq == Seq(target)) // absent cid => no row, no crash
    assert(spark.read.format("cid").option("store", root)
      .load().filter(col("cid") === "sha256-alsomissing").count() == 0)
  }

  test("write: executor-side ingest lands content-addressed blobs + manifest") {
    val out = Files.createTempDirectory("cidsink").toString
    val payloads = Seq("doc one", "doc two", "doc three")
    payloads.map(_.getBytes("UTF-8")).toDF("content")
      .repartition(2) // exercise multi-task commit
      .write.format("cid").option("store", out).mode("append").save()
    val expected = payloads.map(p => sha(p.getBytes("UTF-8"))).toSet
    val got = spark.read.format("cid").option("store", out).load()
      .select("cid").as[String].collect().toSet
    assert(got == expected)
    // commit wrote one audit manifest listing all ingested cids
    val ingests = Files.list(java.nio.file.Paths.get(out, "ingests"))
    val manifest = try ingests.iterator().next() finally ingests.close()
    assert(Files.readString(manifest).split("\n").toSet == expected)
    // re-ingesting identical bytes dedups to the same addresses
    payloads.map(_.getBytes("UTF-8")).toDF("content")
      .write.format("cid").option("store", out).mode("append").save()
    assert(spark.read.format("cid").option("store", out).load().count() == 3)
  }

  test("streaming: readStream tails the ingest commit log across batches") {
    val dir = Files.createTempDirectory("cidstream")
    val store = new ContentStore(dir)
    val first = store.add("stream one".getBytes("UTF-8"))
    store.logIngest(Seq(first))
    val q = spark.readStream.format("cid").option("store", dir.toString)
      .load().select("cid", "length")
      .writeStream.format("memory").queryName("cid_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("cidck").toString)
      .start()
    try {
      q.processAllAvailable()
      val seen1 = spark.sql("SELECT cid FROM cid_stream")
        .as[String].collect().toSet
      assert(seen1 == Set(first))
      // content arriving AFTER the query started becomes a new batch
      val second = store.add("stream two".getBytes("UTF-8"))
      store.logIngest(Seq(second))
      q.processAllAvailable()
      val seen2 = spark.sql("SELECT cid FROM cid_stream")
        .as[String].collect().toSet
      assert(seen2 == Set(first, second))
    } finally q.stop()

    // the cids restriction applies on the streaming path too
    val only = spark.readStream.format("cid").option("store", dir.toString)
      .option("cids", first).load().select("cid")
      .writeStream.format("memory").queryName("cid_stream_one")
      .option("checkpointLocation",
        Files.createTempDirectory("cidck2").toString)
      .start()
    try {
      only.processAllAvailable()
      assert(spark.sql("SELECT cid FROM cid_stream_one")
        .as[String].collect().toSet == Set(first))
    } finally only.stop()
  }
}
