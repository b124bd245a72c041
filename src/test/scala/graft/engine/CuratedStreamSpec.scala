package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Capstone integration: HTTP-style uploads become live micro-batches
  * through the cid connector, flow through the quality gate and the
  * stateful near-dup admission — the whole training-data ingest
  * pipeline as one streaming query against the lake.
  */
class CuratedStreamSpec extends SparkSpec {
  import spark.implicits._

  private val original =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
  private val nearDup = // same band-0 bucket as `original` (see DocStreamSpec)
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett " +
      "kilo lima mike november oscar papa quebec ZULU sierra tango"
  private val unrelated =
    "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
  private val tooShort = "way too short to pass quality"
  private val novel = "completely fresh material sharing no shingles with " +
    "anything uploaded before spanning enough tokens to pass the gate fine"

  test("upload → cid stream → quality gate → near-dedup, cross-batch") {
    val lake = new Lake(spark, Files.createTempDirectory("lake"))
    def up(text: String): String =
      lake.addFile(text.getBytes("UTF-8"), "text/plain")

    val cidA = up(original)
    val cidB = up(unrelated)
    val q = lake.curatedStream().toDF()
      .writeStream.format("memory").queryName("curated")
      .option("checkpointLocation",
        Files.createTempDirectory("curck").toString)
      .start()
    try {
      q.processAllAvailable()
      val cidDup = up(nearDup)
      val cidShort = up(tooShort)
      val cidNovel = up(novel)
      q.processAllAvailable()

      val idOf = Seq(cidA, cidB, cidDup, cidShort, cidNovel)
        .toDF("cid").select(col("cid"), xxhash64(col("cid")).as("id"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val admitted = spark.table("curated").collect()
        .map(_.getAs[Long]("doc_id")).toSet

      assert(admitted.contains(idOf(cidA)), "first original admitted")
      assert(admitted.contains(idOf(cidB)), "unrelated admitted")
      assert(admitted.contains(idOf(cidNovel)), "novel doc admitted")
      assert(!admitted.contains(idOf(cidDup)),
        "near-dup upload must be suppressed by signature state")
      assert(!admitted.contains(idOf(cidShort)),
        "short doc must be dropped by the quality gate")
    } finally q.stop()
  }
}
