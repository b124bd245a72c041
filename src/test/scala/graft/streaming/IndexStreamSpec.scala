package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.{Layout, Pq, Retrieval}

/** Streaming index ingest: micro-batched vectors enter the on-disk
  * IVF-PQ index under the frozen quantizer, the final index equals a
  * written-whole one, and batch replays are no-ops (commit markers).
  */
class IndexStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed shards land as if written whole; replayed batches " +
      "are idempotent") {
    val out = Files.createTempDirectory("ivfpq_stream").toString
    Layout.writeIvfPqPartitioned(spark, sf, out)

    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // two disjoint shards of "new" vectors (fresh ids, same values)
    val shards = Seq(4000000L, 5000000L).map { base =>
      emb.filter(col("vec_id") % 5 === base / 1000000L)
        .select((col("vec_id") + base).as("vec_id"), col("embedding"))
    }

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val q = IndexStream.ingest(
      mem.toDF().toDF("vec_id", "embedding"), out)
    try {
      shards.foreach { sh =>
        mem.addData(sh.as[(Long, Array[Float])].collect().toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // written-whole equivalence, same invariant as the batch append
    def codeSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Long]("cell"),
        r.getAs[scala.collection.Seq[Byte]]("codes").toList)).toSet
    val stored = codeSet(spark.read.parquet(out)
      .select(col("vec_id"), col("part_cell").cast("long").as("cell"),
        col("codes")))
    val whole = codeSet(Pq.encodeAgainst(spark,
      shards.foldLeft(emb)(_ union _),
      spark.read.parquet(s"$out.centroids"),
      spark.read.parquet(s"$out.codebook")))
    assert(stored == whole)

    // a replayed micro-batch must not double-append: batch ids 0 and 1
    // are committed, so re-applying either is a marker-skip no-op
    val before = spark.read.parquet(out).count()
    IndexStream.ingestBatch(out, shards.head, batchId = 0L)
    assert(spark.read.parquet(out).count() == before,
      "replaying a committed batch changed the index")
    // an UNSEEN batch id still applies (the marker is per-batch)
    val extra = emb.filter(col("vec_id") % 97 === 0)
      .select((col("vec_id") + 6000000L).as("vec_id"), col("embedding"))
    IndexStream.ingestBatch(out, extra, batchId = 99L)
    assert(spark.read.parquet(out).count() == before + extra.count())
  }

  test("streamed BM25 batches update postings AND statistics exactly: " +
      "probes equal an index written whole over the union") {
    val full = Tables.load(spark, sf, "documents")
    // the seed keeps the FULL canonical schema — the planted corpus
    // round-trips through Tables.load's conformance check exactly like
    // the real table; streamed batches carry only (doc_id, text)
    val seedDocs = full.filter(col("doc_id") % 3 === 0)
    val batches = Seq(1L, 2L).map(r =>
      full.select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 3 === r))

    // seed index over a third of the corpus, stream the rest in two
    // batches; df/N/sumdl must end EXACTLY at the whole-corpus values
    val grow = Files.createTempDirectory("bm25_grow").toString
    val whole = Files.createTempDirectory("bm25_whole").toString
    writeIndexFrom(seedDocs, grow)
    Retrieval.writeBm25Index(spark, sf, whole)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = IndexStream.ingestBm25(
      mem.toDF().toDF("doc_id", "text"), grow)
    try {
      batches.foreach { b =>
        mem.addData(b.as[(Long, String)].collect().toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = Retrieval.bm25Probe(spark, grow).collect().map(_.toSeq).toSeq
    val want = Retrieval.bm25Probe(spark, whole).collect()
      .map(_.toSeq).toSeq
    assert(got == want)
    // the statistics themselves merged exactly, not just the ranking
    def oneRow(p: String) = spark.read.parquet(p).collect().head.toSeq
    assert(oneRow(s"$grow.stats") == oneRow(s"$whole.stats"))

    // replaying a committed batch id must not double-count statistics
    val statsBefore = oneRow(s"$grow.stats")
    IndexStream.ingestBm25Batch(grow, batches.head, batchId = 0L)
    assert(oneRow(s"$grow.stats") == statsBefore,
      "replayed batch mutated the corpus statistics")
  }

  /** Build a BM25 index from an explicit doc frame (the writer reads
    * from a dir; the seed here is a corpus subset).
    */
  private def writeIndexFrom(docs: org.apache.spark.sql.DataFrame,
      path: String): Unit = {
    val dir = Files.createTempDirectory("bm25_seed_corpus").toString
    docs.write.parquet(s"$dir/documents.parquet")
    Retrieval.writeBm25Index(spark, dir, path)
  }
}
