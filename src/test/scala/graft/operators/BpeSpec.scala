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

  test("converged training equals the sequential replay WITH the stop " +
      "rule; it stops by threshold, not by the safety cap") {
    val got = Bpe.trainConverged(spark, sf).collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count")))
    val corpus = graft.Tables.load(spark, sf, "documents")
      .select(col("text")).collect()
      .flatMap(r => "[a-z]+".r.findAllIn(r.getString(0)))
      .filter(_.length >= 2)
      .map(_.split(""))
    val minCount = math.max(2L,
      math.ceil(corpus.length * Bpe.StopFrac).toLong)
    // replay far past the cap, then cut where the stop rule fires: the
    // distributed loop must have stopped at exactly the same round
    val full = replay(corpus.toIndexedSeq, Bpe.MaxRounds + 8)
    val want = full.takeWhile(_._4 >= minCount).take(Bpe.MaxRounds)
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
    // the stop is data-dependent here, not the cap: the round after
    // the last recorded one is genuinely below threshold
    assert(got.length < Bpe.MaxRounds,
      s"converged run hit the safety cap (${got.length} rounds)")
    assert(got.nonEmpty && full.length > got.length &&
      full(got.length)._4 < minCount)
    // every recorded merge met the threshold
    assert(got.forall(_._4 >= minCount))
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

  test("frozen tokenizer: the greedy fold equals the string-rewriting " +
      "fixpoint the DuckDB oracle runs, on the real corpus vocabulary") {
    // the oracle's form: per merge rank, leftmost-replace _a_b_ ->
    // _ab_ on the _-delimited symbol string until fixpoint
    def rewrite(w: String): Int = {
      var s = "_" + w.mkString("_") + "_"
      Bpe.FrozenMerges.foreach { case (a, b) =>
        var prev = ""
        while (prev != s) { prev = s; s = s.replace(s"_${a}_${b}_", s"_$a$b" + "_") }
      }
      s.count(_ == '_') - 1
    }
    val vocab = graft.Tables.load(spark, sf, "documents")
      .select(explode(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("w"))
      .filter(length(col("w")) >= 2).distinct().collect()
      .map(_.getString(0))
    assert(vocab.nonEmpty)
    val folded = vocab.map { w =>
      w -> Bpe.FrozenMerges.foldLeft(w.split("")) { case (s, (a, b)) =>
        applyOne(s, a, b)
      }.length
    }.toMap
    vocab.foreach { w =>
      assert(folded(w) == rewrite(w),
        s"'$w': greedy fold ${folded(w)} != rewrite fixpoint ${rewrite(w)}")
    }
  }
}
