package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Text pack invariants (the sf0.01 DuckDB oracle is the value-level
  * gate; this pins semantics on controlled inputs).
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId: profile argmax with deterministic tie-break") {
    val df = Seq(
      (1L, "the cat of the house and the dog"),
      (2L, "el perro de la casa y el gato"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
      .createOrReplaceTempView("docs_tmp")
    val out = TextAnalysis.langId(spark, sf) // smoke on real table
    assert(out.columns.toSeq ==
      Seq("doc_id", "hits_en", "hits_es", "hits_de", "pred_lang"))
    val preds = out.select("pred_lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "es", "de", "und")))
  }

  test("quality: ratios bounded, keep consistent with its thresholds") {
    val q = TextAnalysis.quality(spark, sf).collect()
    q.foreach { r =>
      assert(r.getAs[Double]("ttr") > 0 && r.getAs[Double]("ttr") <= 1)
      assert(r.getAs[Double]("alpha_ratio") >= 0 &&
        r.getAs[Double]("alpha_ratio") <= 1)
      val expect = r.getAs[Int]("n_tokens") >= 10 &&
        r.getAs[Double]("ttr") >= 0.2 && r.getAs[Double]("alpha_ratio") >= 0.6
      assert(r.getAs[Boolean]("keep") == expect)
    }
  }

  test("tokenStats: subwords >= words; totals equal per-doc sums") {
    val st = TextAnalysis.tokenStats(spark, sf).cache()
    assert(st.filter(col("n_subwords") < col("n_words")).count() == 0)
    val totals = TextAnalysis.tokenTotals(spark, sf).head()
    assert(totals.getAs[Long]("n_docs") == st.count())
    assert(totals.getAs[Long]("total_words") ==
      st.agg(sum("n_words")).head().getLong(0))
  }

  test("dupNgrams: matches a brute-force doc-frequency replay; ratios " +
      "and keep are self-consistent") {
    val out = TextAnalysis.dupNgrams(spark, sf).collect()
    out.foreach { r =>
      val n = r.getAs[Long]("n_shingles")
      val sh = r.getAs[Long]("n_shared")
      assert(sh >= 0 && sh <= n)
      val frac = sh.toDouble / n
      assert(math.abs(r.getAs[Double]("dup_frac") - frac) < 1e-6)
      assert(r.getAs[Boolean]("keep") == (frac <= 0.6))
    }
    // brute-force replay over the whole (small) corpus: distinct
    // 3-shingles per doc, corpus doc-frequency, shared counts
    def shingles(text: String): Set[String] = {
      val tk = text.split(" ", -1)
      if (tk.length >= 3) tk.sliding(3).map(_.mkString(" ")).toSet
      else Set(text)
    }
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> shingles(r.getString(1)))
    val freq = docs.flatMap(_._2).groupBy(identity).map {
      case (s, o) => s -> o.length
    }
    val expect = docs.map { case (id, sh) =>
      id -> ((sh.size.toLong, sh.count(freq(_) >= 2).toLong))
    }.toMap
    assert(out.length == docs.length)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_shared"))
        == expect(id), s"doc $id")
    }
  }

  test("lmScore: one row per multi-token doc, negative mean log-prob, " +
      "n_bigrams = n_tokens - 1") {
    val out = TextAnalysis.lmScore(spark, sf).collect()
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("nt"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("nt"))
      .toMap
    assert(out.length == docs.count(_._2 >= 2))
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_bigrams") == docs(id) - 1, s"doc $id")
      assert(r.getAs[Double]("mean_lp") < 0, s"doc $id: P < 1 always")
    }
  }

  test("bpePairs: matches a brute-force pair count; top-50 is " +
      "deterministic") {
    val out = TextAnalysis.bpePairs(spark, sf).collect()
    val brute = graft.Tables.load(spark, sf, "documents")
      .select(col("text")).collect()
      .flatMap(r => "[a-z]+".r.findAllIn(r.getString(0)))
      .filter(_.length >= 2)
      .flatMap(w => (0 until w.length - 1).map(i => w.substring(i, i + 2)))
      .groupBy(identity).map { case (p, o) => p -> o.length.toLong }
    val top = brute.toSeq.sortBy { case (p, n) => (-n, p) }.take(50)
    assert(out.length == top.length)
    out.zip(top).foreach { case (r, (p, n)) =>
      assert(r.getAs[String]("pair") == p && r.getAs[Long]("n") == n)
    }
  }

  test("fingerprint: k sorted md5 prefixes per doc, stable across runs") {
    val fp1 = TextAnalysis.fingerprint(spark, sf).collect()
    val fp2 = TextAnalysis.fingerprint(spark, sf).collect()
    assert(fp1.sameElements(fp2))
    val perDoc = fp1.groupBy(_.getAs[Long]("doc_id"))
    perDoc.values.foreach { rs =>
      assert(rs.length <= TextAnalysis.SketchK)
      val hashes = rs.sortBy(_.getAs[Int]("pos")).map(_.getAs[String]("hash"))
      assert(hashes.sorted.sameElements(hashes)) // sorted ascending
      assert(hashes.forall(_.matches("[0-9a-f]{32}")))
    }
  }

  test("dup spans: planted verbatim spans recovered at exact offsets, " +
      "islands split on gaps") {
    import spark.implicits._
    def toks(prefix: String, n: Int) = (1 to n).map(prefix + _)
    val shared = toks("s", 30)
    val blockA = toks("p", 20)
    val blockB = toks("q", 20)
    val docs = Seq(
      // 30-token shared span at offsets 11 and 1
      (1L, (toks("u", 10) ++ shared ++ toks("v", 5)).mkString(" ")),
      (2L, (shared ++ toks("w", 25)).mkString(" ")),
      // two 20-token shared blocks split by unique gaps -> two islands
      (3L, (blockA ++ toks("x", 10) ++ blockB).mkString(" ")),
      (4L, (blockA ++ toks("y", 15) ++ blockB).mkString(" ")),
      // too short to window
      (5L, toks("z", 10).mkString(" "))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dupSpansFor(docs, 20).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("end_tok"),
        r.getAs[Long]("n_toks"))).toSeq.sorted
    assert(got == Seq(
      (1L, 0L, 11L, 40L, 30L),
      (2L, 0L, 1L, 30L, 30L),
      (3L, 0L, 1L, 20L, 20L), (3L, 1L, 31L, 50L, 20L),
      (4L, 0L, 1L, 20L, 20L), (4L, 1L, 36L, 55L, 20L)))
  }

  test("span scrub cuts exactly the planted spans and passes clean " +
      "docs through") {
    import spark.implicits._
    def toks(prefix: String, n: Int) = (1 to n).map(prefix + _)
    val shared = toks("s", 30)
    val docs = Seq(
      (1L, (toks("u", 10) ++ shared ++ toks("v", 5)).mkString(" ")),
      (2L, (shared ++ toks("w", 25)).mkString(" ")),
      (3L, shared.mkString(" ")), // entirely duplicated -> empty
      (5L, toks("z", 10).mkString(" "))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.spanScrubFor(docs, 20).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_toks_before"),
        r.getAs[Long]("n_toks_removed"), r.getAs[String]("clean_text")))
      .toSeq.sorted
    assert(got == Seq(
      (1L, 45L, 30L, (toks("u", 10) ++ toks("v", 5)).mkString(" ")),
      (2L, 55L, 30L, toks("w", 25).mkString(" ")),
      (3L, 30L, 30L, ""),
      (5L, 10L, 0L, toks("z", 10).mkString(" "))))
  }

  test("span scrub removal counts equal the span report's coverage") {
    val bySpan = TextAnalysis.dupSpans(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_toks")).sum).toMap
    val scrub = TextAnalysis.spanScrub(spark, sf).collect()
    assert(scrub.length ==
      graft.Tables.load(spark, sf, "documents").count())
    scrub.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_toks_removed") ==
        bySpan.getOrElse(id, 0L), s"doc $id")
      val kept = r.getAs[String]("clean_text")
      val nKept = if (kept.isEmpty) 0 else kept.split(" ").length
      assert(nKept ==
        r.getAs[Long]("n_toks_before") - r.getAs[Long]("n_toks_removed"),
        s"doc $id token accounting")
    }
  }

  test("dup spans on the corpus: windows-long, in-bounds, " +
      "non-overlapping, dense ids") {
    val spans = TextAnalysis.dupSpans(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("end_tok"),
        r.getAs[Long]("n_toks")))
    assert(spans.nonEmpty, "planted near-dups should share long spans")
    val nToks = graft.Tables.load(spark, sf, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").length).toMap
    spans.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length),
        s"doc $id dense span ids")
      sorted.foreach { case (_, _, st, en, n) =>
        assert(n == en - st + 1 && n >= TextAnalysis.SpanWindow)
        assert(st >= 1 && en <= nToks(id), s"doc $id bounds")
      }
      // islands merged: consecutive spans are separated by a gap
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 > a._4 + 1, s"doc $id overlap")
        case _ =>
      }
    }
  }

  test("contamination spans: positions well-formed; every doc-level " +
      "detection reappears at span level") {
    val spans = TextAnalysis.contaminationSpans(spark, sf).collect()
    assert(spans.nonEmpty, "corpus plants doc_id % 100 == 0 benchmark docs")
    spans.foreach { r =>
      assert(r.getAs[Long]("n_cont_windows") >= 1)
      val (f, l) = (r.getAs[Int]("first_pos"), r.getAs[Int]("last_pos"))
      assert(f >= 0 && f <= l, s"span bounds out of order: $r")
    }
    // doc-level contamination needs >= 2 shared DISTINCT shingles, so
    // each flagged doc has >= 2 contaminated windows here — a strict
    // subset of the span-level view (which starts at 1 window)
    val docLevel = TextAnalysis.contamination(spark, sf).collect()
      .map(_.getAs[Long]("train_id")).toSet
    val spanIds = spans.map(_.getAs[Long]("train_id")).toSet
    assert(docLevel.subsetOf(spanIds),
      s"doc-level hits missing at span level: ${docLevel -- spanIds}")
    spans.filter(r => docLevel(r.getAs[Long]("train_id"))).foreach { r =>
      assert(r.getAs[Long]("n_cont_windows") >= 2)
    }
  }

  test("novelty: first doc scores 1, a verbatim copy scores 0, and " +
      "novel-shingle credit sums to the corpus vocabulary") {
    val rows = TextAnalysis.novelty(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty_frac"))).toMap
    // the corpus-order head introduced everything it contains
    val firstDoc = rows.keys.min
    assert(rows(firstDoc)._3 == 1.0, s"doc $firstDoc: ${rows(firstDoc)}")
    rows.values.foreach { case (n, nov, f) =>
      assert(nov >= 0 && nov <= n && f >= 0.0 && f <= 1.0)
    }
    // every distinct corpus shingle is credited to exactly one doc
    val vocab = graft.Tables.load(spark, sf, "documents")
      .select(explode(Dedup.shingles(col("text"))).as("sh"))
      .distinct().count()
    assert(rows.values.map(_._2).sum == vocab,
      "sum of novel counts must equal the distinct shingle vocabulary")
    // a planted verbatim copy of an earlier doc introduces nothing
    val dir = java.nio.file.Files.createTempDirectory("graft-nov").toString
    import spark.implicits._
    Seq((1L, "a b c d e", "en", "s", 9L), (2L, "a b c d e", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val copy = TextAnalysis.novelty(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty_frac"))
      .toMap
    assert(copy(1L) == 1.0 && copy(2L) == 0.0, s"copy must score 0: $copy")
  }

  test("langid confusion: counts account for every doc, row fractions " +
      "sum to 1, and the en row is diagonal-dominant") {
    val rows = TextAnalysis.langidConfusion(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("pred_lang"),
        r.getAs[Long]("n"), r.getAs[Double]("frac")))
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_._3).sum == nDocs, "every doc lands in one cell")
    assert(rows.forall(r => Set("en", "es", "de", "und")(r._2)),
      "predictions limited to profiled languages + und")
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      val s = cells.map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-4, s"row $lang fracs sum to $s")
    }
    // the heuristic must at least recognize its own primary language:
    // the (en, en) cell dominates the en row (the synthetic corpus's
    // non-en labels carry English-ish text — which is exactly what
    // this audit exists to expose; no diagonal pin for them)
    val enRow = rows.filter(_._1 == "en")
    assert(enRow.maxBy(_._3)._2 == "en", s"en row not diagonal: ${enRow.toSeq}")
  }

  test("bigram PMI: counts consistent, ordering stable, and the pmi " +
      "value is exactly the stated formula") {
    val rows = TextAnalysis.bigramPmi(spark, sf).collect()
    assert(rows.length == 50)
    val counts = rows.map(_.getAs[Long]("n_xy"))
    assert(counts.sameElements(counts.sortBy(-_)))
    val bigN = graft.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w")).count()
    rows.foreach { r =>
      val (nxy, nx, ny) = (r.getAs[Long]("n_xy"), r.getAs[Long]("n_x"),
        r.getAs[Long]("n_y"))
      assert(nxy <= math.min(nx, ny), s"pair count above marginals: $r")
      val want = math.log((nxy * bigN).toDouble / (nx * ny).toDouble)
      assert(math.abs(r.getAs[Double]("pmi") - want) < 1e-6,
        s"pmi drifted from ln(n_xy*N/(n_x*n_y)): $r vs $want")
    }
  }

  test("vocab coverage: monotone nondecreasing in V, bounded by 1, " +
      "saturating once V exceeds the corpus vocabulary") {
    val rows = TextAnalysis.vocabCoverage(spark, sf).collect()
      .map(r => (r.getAs[Int]("vocab_size"), r.getAs[Long]("n_covered"),
        r.getAs[Double]("coverage"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(256, 1024, 4096, 16384, 65536))
    rows.sliding(2).foreach {
      case Array((_, ca, va), (_, cb, vb)) =>
        assert(cb >= ca && vb >= va, s"coverage must grow with V: ${rows.toSeq}")
      case _ =>
    }
    assert(rows.forall(r => r._3 > 0.0 && r._3 <= 1.0))
    val vocab = graft.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0).distinct().count()
    rows.filter(_._1 >= vocab).foreach { r =>
      assert(r._3 == 1.0, s"V=${r._1} >= vocab=$vocab must cover all: $r")
    }
  }

  test("quality sweep: monotone non-increasing in the threshold; " +
      "thr=0 keeps the whole corpus") {
    val rows = TextAnalysis.qualitySweep(spark, sf).collect()
      .map(r => (r.getAs[Double]("thr"), r.getAs[Long]("n_docs_kept"),
        r.getAs[Long]("n_tokens_kept"), r.getAs[Double]("doc_frac")))
      .sortBy(_._1)
    assert(rows.head._1 == 0.0 && rows.head._4 == 1.0,
      "thr=0 must keep every doc")
    rows.sliding(2).foreach {
      case Array((ta, da, ka, _), (tb, db, kb, _)) =>
        assert(tb > ta)
        assert(db <= da && kb <= ka,
          s"kept counts climbed from thr=$ta to $tb")
      case _ =>
    }
  }

  test("windowed co-occurrence equals a JVM sliding-window replay, " +
      "GloVe 1/d weights included (exact sixths)") {
    val got = TextAnalysis.cooccurWindow(spark, sf).collect()
      .map(r => (r.getAs[String]("x"), r.getAs[String]("y"),
        r.getAs[Long]("n_cooc"), r.getAs[Double]("glove_w"))).toSeq
    val counts = scala.collection.mutable.Map
      .empty[(String, String), (Long, Long)].withDefaultValue((0L, 0L))
    graft.Tables.load(spark, sf, "documents").select("text").collect()
      .foreach { r =>
        val t = r.getAs[String]("text").split(" ", -1)
        for (d <- 1 to TextAnalysis.CoocWindow;
             i <- 0 until t.length - d) {
          val (n, w6) = counts((t(i), t(i + d)))
          counts((t(i), t(i + d))) = (n + 1, w6 + 6L / d)
        }
      }
    val want = counts.toSeq
      .map { case ((x, y), (n, w6)) =>
        (x, y, n, math.round(w6.toDouble / 6.0 * 1e6) / 1e6) }
      .sortBy { case (x, y, n, _) => (-n, x, y) }
      .take(TextAnalysis.CoocTop)
    assert(got == want)
  }
}
