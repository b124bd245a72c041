package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Drift-measure properties beyond the oracle: the information-theoretic
  * invariants (bounds, the zero of identical distributions, the
  * direction of a planted shift) that make JSD/entropy trustworthy as
  * monitoring signals.
  */
class DriftSpec extends SparkSpec {

  test("JSD: identical sources diverge 0; disjoint sources diverge 1; " +
      "a planted shift lands strictly between") {
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    import spark.implicits._
    // a ≡ b (identical unigram distribution), c shares half its mass
    // with a, d is fully disjoint
    Seq(
      (1L, "x y z x y z", "en", "a", 11L),
      (2L, "x y z x y z", "en", "b", 11L),
      (3L, "x y z q q q", "en", "c", 11L),
      (4L, "u v w u v w", "en", "d", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val jsd = Drift.sourceTokenJsd(spark, dir).collect()
      .map(r => (r.getAs[String]("sa"), r.getAs[String]("sb")) ->
        r.getAs[Double]("jsd_bits")).toMap
    assert(jsd.size == 6, s"4 sources -> 6 unordered pairs, got $jsd")
    assert(jsd(("a", "b")) == 0.0, s"identical distributions: $jsd")
    assert(jsd(("a", "d")) == 1.0, s"disjoint supports: $jsd")
    assert(jsd(("a", "c")) > 0.0 && jsd(("a", "c")) < 1.0)
    // symmetric by construction (sa < sb canonicalizes the pair) and
    // the partial overlap diverges less than the disjoint pair
    assert(jsd(("a", "c")) < jsd(("a", "d")))
  }

  test("KS on length: identical distributions gap 0; disjoint supports " +
      "gap 1; planted shift lands between; corpus pairs in [0,1]") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ks").toString
    import spark.implicits._
    // a ≡ b on lengths {3,7}; c shifts half the mass to 11; d fully
    // above everyone (lengths {20,30})
    Seq(
      (1L, "t", "en", "a", 3L), (2L, "t", "en", "a", 7L),
      (3L, "t", "en", "b", 3L), (4L, "t", "en", "b", 7L),
      (5L, "t", "en", "c", 3L), (6L, "t", "en", "c", 11L),
      (7L, "t", "en", "d", 20L), (8L, "t", "en", "d", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val ks = Drift.lengthKs(spark, dir).collect()
      .map(r => (r.getAs[String]("sa"), r.getAs[String]("sb")) ->
        r.getAs[Double]("ks")).toMap
    assert(ks(("a", "b")) == 0.0, s"identical length CDFs: $ks")
    assert(ks(("a", "d")) == 1.0, s"disjoint supports: $ks")
    assert(ks(("a", "c")) == 0.5, s"half the mass moved: $ks")
    val corpus = Drift.lengthKs(spark, sf).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val k = r.getAs[Double]("ks")
      assert(k >= 0.0 && k <= 1.0, s"KS out of range: $r")
    }
  }

  test("corpus: every pair's JSD in [0,1]; entropy in [0, log2 vocab]; " +
      "uniform planted source attains the entropy bound") {
    val pairs = Drift.sourceTokenJsd(spark, sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val j = r.getAs[Double]("jsd_bits")
      assert(j >= 0.0 && j <= 1.0, s"JSD out of range: $r")
      assert(r.getAs[Long]("n_union_vocab") > 0)
    }
    val ent = Drift.sourceEntropy(spark, sf).collect()
    assert(ent.nonEmpty)
    ent.foreach { r =>
      val h = r.getAs[Double]("entropy_bits")
      val vocab = r.getAs[Long]("vocab")
      assert(h >= 0.0 && h <= math.log(vocab.toDouble) / math.log(2.0) + 1e-9,
        s"entropy above the log2(vocab) bound: $r")
      assert(r.getAs[Long]("n_tokens") >= vocab)
    }
    // a uniform distribution attains the bound exactly
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-u").toString
    import spark.implicits._
    Seq((1L, "a b c d", "en", "u", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val u = Drift.sourceEntropy(spark, dir).collect().head
    assert(u.getAs[Long]("vocab") == 4L)
    assert(u.getAs[Double]("entropy_bits") == 2.0,
      s"uniform over 4 tokens must hit exactly 2 bits: $u")
  }
}
