package graft.operators

import graft.SparkSpec

/** Sliding-window chunker: exact slice contract on a synthetic doc,
  * degenerate shapes, and corpus-level coverage invariants (the
  * sf0.01 DuckDB oracle is the stronger value gate).
  */
class ChunkSpec extends SparkSpec {

  private def chunkRows(text: String, window: Int, stride: Int) = {
    import spark.implicits._
    Chunk.chunks(Seq((1L, text)).toDF("doc_id", "text"), window, stride)
      .collect()
      .map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("n_toks"), r.getAs[String]("chunk_text")))
      .toSeq
  }

  test("windows slide by stride, overlap by window - stride, final " +
      "window short") {
    val toks = (1 to 150).map(_.toString)
    val got = chunkRows(toks.mkString(" "), 64, 48)
    val wantStarts = Seq(0, 48, 96, 144)
    assert(got.map(_._2) == wantStarts.map(_ + 1L))
    assert(got.map(_._1) == (0L until 4L))
    got.zip(wantStarts).foreach { case ((_, _, n, text), s) =>
      val want = toks.slice(s, s + 64)
      assert(n == want.length, s"start $s")
      assert(text == want.mkString(" "), s"start $s")
    }
    // consecutive full windows overlap by exactly window - stride
    val t0 = got(0)._4.split(" ")
    val t1 = got(1)._4.split(" ")
    assert(t0.takeRight(16).toSeq == t1.take(16).toSeq)
    // stride-length prefixes + the last chunk reassemble the doc
    val rebuilt = got.init.flatMap(_._4.split(" ").take(48)) ++
      got.last._4.split(" ")
    assert(rebuilt == toks)
  }

  test("degenerate shapes: one token, doc shorter than a window, " +
      "stride == window partitions exactly") {
    assert(chunkRows("solo", 64, 48) == Seq((0L, 1L, 1L, "solo")))
    val short = chunkRows("a b c", 64, 48)
    assert(short == Seq((0L, 1L, 3L, "a b c")))
    val exact = chunkRows((1 to 8).mkString(" "), 4, 4)
    assert(exact.map(t => (t._2, t._3)) == Seq((1L, 4L), (5L, 4L)))
    assert(exact.flatMap(_._4.split(" ")) == (1 to 8).map(_.toString))
  }

  test("corpus chunking covers every document with dense ids and " +
      "bounded windows") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val nToks = docs.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("text").split(" ").length).toMap
    val byDoc = Chunk.ragChunks(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == nToks.keySet)
    byDoc.foreach { case (id, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("chunk_id"))
      val n = nToks(id)
      // one chunk per stride-step that lands inside the doc
      assert(sorted.length == (n + Chunk.Stride - 1) / Chunk.Stride,
        s"doc $id chunk count")
      assert(sorted.map(_.getAs[Long]("chunk_id")).toSeq ==
        (0L until sorted.length))
      sorted.foreach { r =>
        val nt = r.getAs[Long]("n_toks")
        assert(nt >= 1 && nt <= Chunk.Window, s"doc $id window bound")
      }
      // total coverage: non-final chunks contribute stride new tokens
      val last = sorted.last
      assert(last.getAs[Long]("start_tok") - 1 + last.getAs[Long]("n_toks")
        == n, s"doc $id tail coverage")
    }
  }
}
