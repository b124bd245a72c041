package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Dedup

/** Streaming near-dup suppression: cross-batch admission decisions and
  * parity with the batch MinHash-LSH pair contract.
  */
class DocStreamSpec extends SparkSpec {
  import spark.implicits._

  private val original =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
  private val nearDup = // one token swapped: 3-shingle J ≈ 0.83, and the
    // variant chosen so band 0 collides (deterministic given the text)
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett " +
      "kilo lima mike november oscar papa quebec ZULU sierra tango"
  private val unrelated =
    "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"

  test("streaming: exact and near dups suppressed across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = DocStream.nearDeduped(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, original), (2L, unrelated))
      q.processAllAvailable()
      mem.addData((3L, original), (4L, nearDup), (5L, "totally novel words " +
        "here that share nothing with previous documents at all okay"))
      q.processAllAvailable()
      val admitted = spark.table("dedup_out").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(admitted.contains(1L) && admitted.contains(2L))
      assert(!admitted.contains(3L), "exact dup must be suppressed")
      assert(admitted.contains(5L))
      // the NEAR dup (not byte-identical) is suppressed cross-batch:
      // its band-0 bucket collides and estJ ≈ 0.84 ≥ MinJ
      val sigs = DocStream.signed(
        Seq((1L, original), (4L, nearDup)).toDF("doc_id", "text")).collect()
      val Array(s1, s4) = sigs.sortBy(_.doc_id)
      assert(s1.bucket == s4.bucket &&
        DocStream.estJaccard(s1.sig, s4.sig) >= DocStream.MinJ)
      assert(!admitted.contains(4L), "near-dup must be suppressed")
      info(s"near-dup estJ=${DocStream.estJaccard(s1.sig, s4.sig)}")
    } finally q.stop()
  }

  test("md5 twin: streaming micro-batches = one batch fold (same decisions)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Seq(1L -> original, 2L -> unrelated, 3L -> original,
      4L -> nearDup, 5L -> ("totally novel words here that share " +
        "nothing with previous documents at all okay"))
    val batch = DocStream.nearDedupedMd5(docs.toDF("doc_id", "text"))
      .collect().map(a => a.doc_id -> a.n_compared).toMap
    val mem = MemoryStream[(Long, String)]
    val q = DocStream.nearDedupedMd5(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("md5_dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(docs.take(2): _*) // id-ordered chunks, like ingest
      q.processAllAvailable()
      mem.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("md5_dedup_out").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_compared"))
        .toMap
      assert(streamed == batch, "cross-batch state must replay the fold")
      // the exact dup is hash-family-independent: identical text ->
      // identical signature -> same bucket, 8/8 agreement
      assert(!streamed.contains(3L), "exact dup suppressed by md5 twin")
    } finally q.stop()
  }

  test("batch parity: colliding strong pairs never both admitted") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val admitted = DocStream.nearDeduped(docs).collect().map(_.doc_id).toSet
    val sig = DocStream.signed(docs).collect()
    val bucketOf = sig.map(d => d.doc_id -> d.bucket).toMap
    val sigOf = sig.map(d => d.doc_id -> d.sig).toMap
    val pairs = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    // the operator's contract: pairs that share its bucket key AND meet
    // its estimate threshold cannot both pass
    val inScope = pairs.filter { case (a, b) =>
      bucketOf(a) == bucketOf(b) &&
        DocStream.estJaccard(sigOf(a), sigOf(b)) >= DocStream.MinJ
    }
    assert(inScope.nonEmpty, "testdata's planted pairs should collide")
    inScope.foreach { case (a, b) =>
      assert(!(admitted.contains(a) && admitted.contains(b)),
        s"pair ($a,$b) both admitted")
    }
    // and suppression is not vacuous: everything else stays admitted
    assert(admitted.size >= docs.count() - pairs.length - 1)
  }
}
