package graft.operators

import graft.SparkSpec

/** BM25 retrieval: the score exactness is DuckDB-oracled
  * (`bm25_topk`); here the shape and ranking contracts, plus the
  * derived-query rule the oracle encodes but can't explain.
  */
class RetrievalSpec extends SparkSpec {

  test("bm25: derived query terms are the rarest; per-term rankings " +
      "are dense with positive non-increasing scores") {
    val rows = Retrieval.bm25Top(spark, sf).collect()
    val byTerm = rows.groupBy(_.getAs[String]("term"))
    assert(byTerm.size == Retrieval.NumQueryTerms)
    byTerm.foreach { case (term, rs) =>
      assert(rs.length <= Retrieval.TopDocs)
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length))
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.forall(_ > 0), s"$term has non-positive scores")
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }

    // the derivation rule: the query terms are exactly the
    // NumQueryTerms rarest vocabulary terms (ties by term)
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
    val dfOf = docs.flatMap(r =>
        r.getAs[String]("text").split(" ").distinct)
      .groupBy(identity).view.mapValues(_.length).toMap
    val want = dfOf.toSeq.sortBy { case (t, df) => (df, t) }
      .take(Retrieval.NumQueryTerms).map(_._1).toSet
    assert(byTerm.keySet == want,
      s"query terms ${byTerm.keySet} != rarest $want")
  }
}
