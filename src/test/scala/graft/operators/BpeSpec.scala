package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Iterative BPE training: the distributed merge loop must equal a
  * sequential replay (count → argmax → greedy re-segment, three
  * rounds) over the real corpus.
  */
class BpeSpec extends SparkSpec {

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
        words = words.map { w =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          w.foreach { x =>
            if (out.nonEmpty && out.last == a && x == b) {
              out.remove(out.length - 1); out += (a + b)
            } else out += x
          }
          out.toArray
        }
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
}
