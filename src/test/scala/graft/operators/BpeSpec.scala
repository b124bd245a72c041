package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Iterative BPE training: the distributed merge loop must equal a
  * sequential replay (count → argmax → greedy re-segment, three
  * rounds) over the real corpus.
  */
class BpeSpec extends SparkSpec {

  private def applyOne(w: Array[String], a: String, b: String)
      : Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    w.foreach { x =>
      if (out.nonEmpty && out.last == a && x == b) {
        out.remove(out.length - 1); out += (a + b)
      } else out += x
    }
    out.toArray
  }

  private def replay(words0: Seq[Array[String]], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var words = words0
    (1 to rounds).flatMap { round =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { w =>
        w.sliding(2).foreach {
          case Array(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
          case _ =>
        }
      }
      if (counts.isEmpty) None
      else {
        val ((a, b), n) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        words = words.map(applyOne(_, a, b))
        Some((round, a, b, n))
      }
    }
  }

  test("three training rounds equal the sequential replay, merges chain") {
    val got = Bpe.train(spark, sf).collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count")))
    val corpus = graft.Tables.load(spark, sf, "documents")
      .select(col("text")).collect()
      .flatMap(r => "[a-z]+".r.findAllIn(r.getString(0)))
      .filter(_.length >= 2)
      .map(_.split(""))
    val want = replay(corpus.toIndexedSeq, Bpe.TrainRounds)
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
    assert(got.length == Bpe.TrainRounds)
    // counts never increase: each merge consumes mass
    assert(got.sliding(2).forall {
      case Array(x, y) => y._4 <= x._4
      case _ => true
    })
  }

  test("tokenize applies the full trained merge list: per-doc piece " +
      "counts equal the sequential segmentation; every doc is kept") {
    val merges = Bpe.train(spark, sf).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
    val got = Bpe.tokenize(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_pieces"))).sortBy(_._1)
    val want = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val ws = "[a-z]+".r.findAllIn(Option(r.getString(1)).getOrElse(""))
          .filter(_.length >= 2).toSeq
        val pieces = ws.map { w =>
          merges.foldLeft(w.split("")) { case (s, (a, b)) =>
            applyOne(s, a, b)
          }.length.toLong
        }
        (r.getLong(0), ws.size.toLong, pieces.sum)
      }.sortBy(_._1)
    assert(got.length == want.length, "every document must be kept")
    assert(got.toSeq == want.toSeq)
  }
}
