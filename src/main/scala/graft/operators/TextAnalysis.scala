package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Text-analysis operator pack over `documents` — language ID, quality
  * scoring, token statistics, and document fingerprinting. All four are
  * single-pass narrow projections (optionally + one aggregation): no
  * joins, no driver loops, so they scale with partition count alone,
  * and every metric is integer-ratio or md5-based arithmetic that a
  * SQL oracle reproduces bit-for-bit.
  */
object TextAnalysis {

  // --- shared text model ---------------------------------------------

  private def toks(text: Column): Column = split(text, " ")

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. Real profiles would be learned; the
    * *operator* (profile-hit argmax over a token stream) is the same.
    */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "on", "for", "with",
      "by", "at", "from"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con",
      "los", "del", "las"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den",
      "auf", "ist", "im", "ein"))

  private def hits(t: Column, words: Seq[String]): Column =
    size(filter(t, w => w.isin(words: _*)))

  // --- 1. language ID -------------------------------------------------

  /** Stopword-profile argmax with deterministic tie-break (profile
    * order). Emits per-profile hit counts so downstream filters can
    * threshold on evidence, plus the argmax prediction.
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val hitCols = profiles.map { case (l, ws) => hits(t, ws).as(s"hits_$l") }
    val best = profiles.foldLeft((lit("und"), lit(0)): (Column, Column)) {
      case ((bl, bh), (l, _)) =>
        val h = col(s"hits_$l")
        (when(h > bh, lit(l)).otherwise(bl), greatest(h, bh))
    }._1
    load(s, dir, "documents")
      .select(col("doc_id") +: hitCols: _*)
      .withColumn("pred_lang", best)
      .orderBy(col("doc_id"))
  }

  /** Language-ID audit: the heuristic classifier's confusion matrix
    * against the corpus's labeled `lang` column — (true lang,
    * predicted lang, n, row fraction). The audit every heuristic
    * filter needs before it gates a corpus: per-language recall sits
    * on the diagonal, and systematic confusions (e.g. short docs
    * falling to 'und') are visible as off-diagonal mass. Exact
    * counts + one division per cell — hash-oracled.
    *
    * Scale: the classifier is a narrow codegen projection; the join
    * back to labels is on the doc id; the matrix is |langs|² rows.
    */
  def langidConfusion(s: SparkSession, dir: String): DataFrame = {
    val pred = langId(s, dir).select(col("doc_id"), col("pred_lang"))
    val truth = load(s, dir, "documents").select(col("doc_id"), col("lang"))
    val cells = truth.join(pred, "doc_id")
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("lang")).agg(sum(col("n")).as("tot"))
    cells.join(totals, "lang")
      .select(col("lang"), col("pred_lang"), col("n"),
        round(col("n").cast("double") / col("tot"), 6).as("frac"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** Collocation extraction: PMI of the top-50 corpus bigrams —
    * pmi = ln(n_xy·N ∕ (n_x·n_y)), positive when the pair co-occurs
    * more than independence predicts (a fixed phrase), ~0 for chance
    * neighbors. All counts exact integers; both products stay far
    * under 2⁵³ so the cast is exact and the single division + ln is
    * the same op chain on both engines — hash-oracled.
    *
    * Scale: positional pair explode → map-side-combinable bigram
    * counts (vocab²-bounded but Zipf-tiny in practice), two
    * vocab-sized equi-joins for the marginals, top-50 via partial
    * TakeOrdered.
    */
  def bigramPmi(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    // pair stream as the [[topBigrams]] zip_with-of-slices (tokens
    // cannot contain the join space, so the concat key ≡ the (x, y)
    // pair): the transform(sequence)-of-structs form this replaces
    // built a struct per position outside codegen's cheap path and
    // benched ~4× slower on the identical aggregation
    val bigrams = zip_with(slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit(" "), b))
    val docs = load(s, dir, "documents")
    val bi = docs.filter(size(toks) >= 2)
      .select(explode(bigrams).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n_xy"))
      .withColumn("x", split(col("bigram"), " ").getItem(0))
      .withColumn("y", split(col("bigram"), " ").getItem(1))
    val uni = docs.select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val total = uni.agg(sum(col("n")).as("big_n"))
    // top-k FIRST (selection order is (count desc, bigram) — both
    // known before any decoration), THEN the unigram joins touch 50
    // rows instead of the whole bigram vocabulary: at web scale the
    // old shape shuffled a vocab²-sized join only to throw away all
    // but 50 rows; this one is a TakeOrderedAndProject + broadcast
    // probes. Same rows, same values, same order.
    val top = bi
      .select(col("bigram"), col("x"), col("y"), col("n_xy"))
      .orderBy(col("n_xy").desc, col("bigram"))
      .limit(50)
    top
      .join(uni.select(col("w").as("x"), col("n").as("n_x")), "x")
      .join(uni.select(col("w").as("y"), col("n").as("n_y")), "y")
      .crossJoin(broadcast(total))
      .select(col("bigram"),
        col("n_xy"), col("n_x"), col("n_y"),
        round(log((col("n_xy") * col("big_n")).cast("double")
          / (col("n_x") * col("n_y")).cast("double")), 6).as("pmi"))
      .orderBy(col("n_xy").desc, col("bigram"))
  }

  // --- 2. quality scoring ---------------------------------------------

  /** Per-document quality signals: length, token count, mean token
    * length, type-token ratio (lexical diversity), alphabetic-character
    * ratio, stopword ratio — the standard pre-training heuristics
    * (C4/Gopher-style rules), each an integer-exact ratio. `keep` is a
    * sample filter over them.
    */
  def quality(s: SparkSession, dir: String): DataFrame =
    qualityRows(load(s, dir, "documents")).orderBy(col("doc_id"))

  /** The quality signals over ANY (doc_id, text) frame — stateless
    * and sort-free, so the identical plan runs under `readStream` in
    * append mode (streaming-parity pinned in CurationStreamSpec).
    */
  def qualityRows(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t).cast("double")
    val meanLen = aggregate(t, lit(0L), (a, w) => a + length(w))
      .cast("double") / nTok
    val ttr = size(array_distinct(t)).cast("double") / nTok
    val alpha = (length(regexp_replace(col("text"), "[^a-z]", ""))
      .cast("double") / length(col("text")))
    val stopRatio = hits(t, profiles.head._2).cast("double") / nTok
    docs
      .select(col("doc_id"), length(col("text")).as("len"),
        size(t).as("n_tokens"),
        round(meanLen, 6).as("mean_tok_len"),
        round(ttr, 6).as("ttr"),
        round(alpha, 6).as("alpha_ratio"),
        round(stopRatio, 6).as("stop_ratio"))
      .withColumn("keep",
        col("n_tokens") >= 10 && col("ttr") >= 0.2 && col("alpha_ratio") >= 0.6)
  }

  /** Filter ANY (doc_id, text, …) frame to the rows [[qualityRows]]
    * would mark keep — the SAME rounded-signal arithmetic inlined as
    * one predicate, with every other column passed through (the
    * admission form: [[graft.streaming.AdmissionStream]] needs the
    * text downstream, which the signal frame drops).
    */
  def qualityKeep(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t).cast("double")
    val ttr = round(size(array_distinct(t)).cast("double") / nTok, 6)
    val alpha = round(length(regexp_replace(col("text"), "[^a-z]", ""))
      .cast("double") / length(col("text")), 6)
    docs.filter(size(t) >= 10 && ttr >= 0.2 && alpha >= 0.6)
  }

  /** Threshold-sweep audit for the quality knob — the curve a curator
    * reads BEFORE choosing a cutoff: for each candidate alpha-ratio
    * threshold (0.0 … 0.9), the documents and tokens that survive and
    * their corpus fractions. Tuning a filter by re-running the
    * pipeline per threshold scans the corpus T times; this computes
    * the whole curve in ONE pass — each doc fans out to the
    * thresholds it passes (a ×T row explode of three narrow columns,
    * map-side combined down to T rows before the shuffle).
    *
    * Cross-engine exactness: the signals reuse [[qualityRows]]'s
    * rounded forms, the grid is i/10 evaluated as one IEEE division
    * on both engines, and the fractions are single divisions of
    * exact counts.
    */
  def qualitySweep(s: SparkSession, dir: String): DataFrame = {
    val q = qualityRows(load(s, dir, "documents"))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("alpha_ratio"))
      .cache()
    val tot = q.agg(count(lit(1)).as("tot_docs"),
      sum("n_tokens").as("tot_tokens"))
    q.select(col("alpha_ratio"), col("n_tokens"),
        explode(sequence(lit(0), lit(9))).as("i"))
      .withColumn("thr", col("i").cast("double") / 10.0)
      .filter(col("alpha_ratio") >= col("thr"))
      .groupBy(col("thr"))
      .agg(count(lit(1)).as("n_docs_kept"),
        sum("n_tokens").as("n_tokens_kept"))
      .crossJoin(broadcast(tot))
      .select(col("thr"), col("n_docs_kept"), col("n_tokens_kept"),
        round(col("n_docs_kept").cast("double") / col("tot_docs"), 6)
          .as("doc_frac"),
        round(col("n_tokens_kept").cast("double") / col("tot_tokens"), 6)
          .as("token_frac"))
      .orderBy(col("thr"))
  }

  /** Vocabulary coverage curve — the tokenizer-design dial: for each
    * candidate vocabulary size V (256 … 64k, the top-V tokens by
    * corpus frequency), the fraction of total token MASS those V
    * types cover. Read before fixing a vocab size: the V where the
    * curve flattens is where more vocabulary stops buying coverage.
    *
    * Exactness: counts and cumulative masses are exact integers; the
    * coverage is ONE division per grid point. Rank ties broken by
    * token text so the top-V set is engine-identical.
    *
    * Scale shape: the corpus collapses to a vocab-sized (token, n)
    * aggregate (map-side combinable) before anything else; the rank
    * assignment is a window over that VOCAB-sized frame (≪ corpus —
    * the single-partition window is over type counts, never rows),
    * and the grid evaluation is a conditional aggregation over
    * vocab × 6 rows.
    */
  def vocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val counts = load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val ranked = counts.withColumn("rnk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("tok"))))
    import s.implicits._
    val grid = Seq(256, 1024, 4096, 16384, 65536).toDF("vocab_size")
    ranked
      .crossJoin(broadcast(grid))
      .groupBy(col("vocab_size"))
      .agg(sum(col("n")).as("n_total"),
        sum(when(col("rnk") <= col("vocab_size"), col("n"))
          .otherwise(lit(0L))).as("n_covered"))
      .select(col("vocab_size"), col("n_covered"),
        round(col("n_covered").cast("double") / col("n_total"), 6)
          .as("coverage"))
      .orderBy(col("vocab_size"))
  }

  // --- 3. token counting ----------------------------------------------

  /** Whitespace tokens plus a BPE-ish subword estimate: word tokens via
    * regex, and ceil(len/4) subword pieces per word (the crude "4 chars
    * ≈ 1 BPE token" rule used for budget estimates) — plus corpus-level
    * totals via one aggregation (map-side combinable).
    */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    val words = expr("regexp_extract_all(text, '[a-z]+', 0)")
    val nSub = aggregate(words, lit(0L),
      (a, w) => a + ceil(length(w).cast("double") / 4).cast("long"))
    load(s, dir, "documents")
      .select(col("doc_id"), size(toks(col("text"))).as("n_ws_tokens"),
        size(words).as("n_words"), nSub.as("n_subwords"))
      .orderBy(col("doc_id"))
  }

  /** Corpus totals — the "how many tokens is this dataset" question. */
  def tokenTotals(s: SparkSession, dir: String): DataFrame =
    tokenStats(s, dir)
      .agg(count(lit(1)).as("n_docs"),
        sum("n_ws_tokens").as("total_ws_tokens"),
        sum("n_words").as("total_words"),
        sum("n_subwords").as("total_subwords"))

  // --- 4. document fingerprinting -------------------------------------

  /** Bottom-k sketch fingerprint: the k lexicographically smallest
    * md5 hex digests of the document's 3-token shingles. A compact,
    * order-stable content signature (bottom-k MinHash estimates set
    * Jaccard; winnowing is the windowed variant) built entirely from
    * engine-portable md5 — no custom hash to replicate.
    */
  val SketchK = 8

  def fingerprint(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(slice(array_sort(transform(Dedup.shingles(col("text")),
          sh => md5(sh))), 1, SketchK)))
      .toDF("doc_id", "pos", "hash")
      .orderBy(col("doc_id"), col("pos"))

  // --- 5. term weighting ----------------------------------------------

  /** TF-IDF: the highest-weighted term per document. The inverted-
    * index shape at scale: one explode, two partial-aggregations
    * (term frequency per doc; document frequency per term), an
    * equi-join on term, and a per-doc top-1 window. The corpus size
    * joins in as a 1-row broadcast, and ranking runs on the ROUNDED
    * score (term tiebreak) so rank order is engine-reproducible.
    */
  def tfidfTop(s: SparkSession, dir: String): DataFrame = {
    val terms = load(s, dir, "documents")
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
    // ONE corpus scan + explode: df and N both derive from the tf
    // aggregate (tf keys are distinct (doc, term) pairs by
    // construction, so rows-per-term IS document frequency and
    // distinct doc_ids match the exploded frame's); tf is cached for
    // its three consumers. The previous form re-scanned and
    // re-exploded the corpus for each of tf / df / N.
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .cache()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = tf.agg(countDistinct(col("doc_id")).as("n"))
    val score = round(col("tf") * log(col("n").cast("double") / col("df")), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("score", score)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"))
  }

  // --- 5b. normalization ----------------------------------------------

  /** Canonical text normalization — the preprocessing every training
    * pipeline applies before dedup/tokenization: lowercase, strip
    * non-alphabetic characters, drop stopwords and empty tokens, and
    * fingerprint the cleaned form (md5, engine-portable). One narrow
    * projection, no shuffle; the cleaned fingerprint is what exact
    * dedup should key on so trivial formatting differences collapse.
    */
  def normalize(s: SparkSession, dir: String): DataFrame = {
    val cleanedText = regexp_replace(lower(col("text")), "[^a-z ]", "")
    val stop = profiles.head._2
    val cleaned = filter(split(cleanedText, " "),
      w => w =!= "" && !w.isin(stop: _*))
    load(s, dir, "documents")
      .select(col("doc_id"),
        size(cleaned).as("n_clean_tokens"),
        md5(concat_ws(" ", cleaned).cast("binary")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  // --- 6. repetition signals (Gopher-style filters) -------------------

  /** Per-document repetition signals, the Gopher/MassiveText "repetition
    * removal" rules: the most-frequent-token mass ratio and the
    * duplicate-bigram fraction, plus a keep flag over both. Two
    * explode→count aggregations (each map-side combinable at the
    * (doc, gram) grain, so the shuffle carries distinct grams, not
    * tokens) joined back on doc_id — no per-doc quadratic array ops.
    * All ratios are integer/integer in double; the flag compares the
    * UNROUNDED ratios so both engines branch on identical values.
    */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    val d = load(s, dir, "documents")
    val t = toks(col("text"))
    val tokAgg = d.select(col("doc_id"), explode(t).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), max(col("c")).as("max_tok"))
    val bigrams = zip_with(slice(t, lit(1), size(t) - 1),
      slice(t, lit(2), size(t) - 1), (a, b) => concat(a, lit(" "), b))
    val biAgg = d.filter(size(t) >= 2)
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bi"), count(lit(1)).as("nd_bi"))
    val maxTokRatio = col("max_tok").cast("double") / col("n_tokens")
    val dupBiRatio = lit(1.0) - col("nd_bi").cast("double") / col("n_bi")
    tokAgg.join(biAgg, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        round(maxTokRatio, 6).as("max_tok_ratio"),
        round(dupBiRatio, 6).as("dup_bigram_ratio"),
        (maxTokRatio <= 0.2 && dupBiRatio <= 0.3).as("keep"))
      .orderBy(col("doc_id"))
  }

  // --- 7. benchmark contamination ------------------------------------

  /** Train/eval contamination check — the n-gram-overlap decontamination
    * pass every pre-training pipeline runs (GPT-3 appendix-C style,
    * 3-token shingles here to fit the synthetic corpus): for each
    * training document, which benchmark documents share ≥ 2 shingles,
    * and what fraction of the benchmark's shingles leak. The benchmark
    * side (doc_id % 100 == 0) is tiny by construction, so its exploded
    * shingle index broadcasts and the probe is a map-side hash join on
    * the shingle string — never a doc×doc cross product; at 100 TB the
    * same plan holds with the real benchmark suite as the broadcast
    * side.
    */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    val sh = load(s, dir, "documents")
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("sh"))
    contaminationOf(
      sh.filter(col("doc_id") % 100 =!= 0)
        .select(col("doc_id").as("train_id"), col("sh")),
      sh.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("bench_id"), col("sh")))
      .orderBy(col("train_id"), col("bench_id"))
  }

  /** The contamination core over ANY (train_id, sh) / (bench_id, sh)
    * shingle frames — per-doc verdicts are independent of every other
    * training doc, which is what lets the streaming guard
    * ([[graft.streaming.ContaminationStream]]) apply the IDENTICAL
    * plan per micro-batch against a frozen benchmark and equal the
    * batch operator over the union (spec-pinned).
    */
  def contaminationOf(train: DataFrame, bench: DataFrame): DataFrame = {
    val benchSize = bench.groupBy(col("bench_id"))
      .agg(count(lit(1)).as("bench_sh"))
    train.join(broadcast(bench), "sh")
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .join(broadcast(benchSize), "bench_id")
      .select(col("train_id"), col("bench_id"), col("n_shared"),
        round(col("n_shared").cast("double") / col("bench_sh"), 6)
          .as("overlap_frac"))
  }

  /** Span-level contamination: WHERE the benchmark overlap sits inside
    * each training document — the positions a surgical decontamination
    * pass would cut (dropping whole docs for one leaked sentence, as
    * the doc-level [[contamination]] verdict would force, wastes the
    * rest of the document). Every positional 3-token window of a
    * training doc is probed against the distinct benchmark shingle
    * set; output is the contaminated window count and the first/last
    * hit position per affected doc.
    *
    * Scale shape: the probe is a LEFT SEMI equi-join against the
    * benchmark set (benchmark-sized, broadcast — eval suites are tiny
    * next to a training corpus), then one per-doc aggregation. The
    * positional explode is the only corpus-sized intermediate and it
    * never shuffles raw text — only (doc, pos, 24B hashable window).
    */
  def contaminationSpans(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    // windows as chained zip_with-of-slices (index-aligned, so
    // posexplode positions are unchanged): the transform(sequence)
    // + element_at form this replaces evaluated 3 array lookups per
    // position outside codegen's cheap path — the same ~3-4× per-row
    // cost [[bigramPmi]] shed with this rewrite
    val n3 = size(toks) - 2
    val w12 = zip_with(slice(toks, lit(1), n3), slice(toks, lit(2), n3),
      (a, b) => concat(a, lit(" "), b))
    val wins = when(size(toks) >= 3,
      zip_with(w12, slice(toks, lit(3), n3),
        (ab, c) => concat(ab, lit(" "), c)))
      .otherwise(array(col("text")))
    val p = load(s, dir, "documents")
      .select(col("doc_id"), posexplode(wins).as(Seq("pos", "win")))
    val bench = p.filter(col("doc_id") % 100 === 0)
      .select(col("win")).distinct()
    p.filter(col("doc_id") % 100 =!= 0)
      .join(broadcast(bench), Seq("win"), "left_semi")
      .groupBy(col("doc_id").as("train_id"))
      .agg(count(lit(1)).as("n_cont_windows"),
        min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"))
      .orderBy(col("train_id"))
  }

  /** Novelty scoring: what fraction of each document's distinct
    * 3-token shingles appear FIRST in that document (corpus order =
    * doc_id order) — the complement of boilerplate: a crawler's
    * value-of-new-data signal, near 1 for genuinely new material,
    * near 0 for reshuffles of already-seen text. The inverse view of
    * [[dupNgrams]] (which asks "seen anywhere else"); novelty asks
    * "seen EARLIER", so it is order-aware and usable as an
    * incremental admission score.
    *
    * Scale shape: the inverted-index pattern — distinct (doc,
    * shingle) explode, min(doc_id) per shingle (map-side
    * combinable), one equi-join back, one per-doc aggregation.
    * Ratios are exact integer divisions. Hash-oracled.
    */
  def novelty(s: SparkSession, dir: String): DataFrame = {
    val sh = load(s, dir, "documents")
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("sh"))
    val firstSeen = sh.groupBy(col("sh"))
      .agg(min(col("doc_id")).as("first_doc"))
    sh.join(firstSeen, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_shingles"), 6)
          .as("novelty_frac"))
      .orderBy(col("doc_id"))
  }

  // --- 8. corpus-wide boilerplate ------------------------------------

  /** Duplicated-shingle fraction — the CCNet-style boilerplate signal
    * the within-document [[repetition]] rules cannot see: what share
    * of a document's distinct 3-token shingles also occur in at least
    * one OTHER document. Near-1 means the doc is assembled from
    * corpus-common fragments (headers, navigation, license blocks)
    * even when no single near-duplicate partner exists.
    *
    * Shape at scale: explode distinct (doc, shingle) pairs once, a
    * map-side-combinable count per shingle (the shuffle carries
    * DISTINCT shingles), an equi-join back on the shingle string, and
    * a per-doc aggregation — the inverted-index shape, never doc×doc.
    * The ratio is integer/integer in double (engine-exact).
    */
  def dupNgrams(s: SparkSession, dir: String): DataFrame = {
    val sh = load(s, dir, "documents")
      .select(col("doc_id"),
        explode(Dedup.shingles(col("text"))).as("sh"))
    val docFreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val dupFrac = col("n_shared").cast("double") / col("n_shingles")
    sh.join(docFreq, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        round(dupFrac, 6).as("dup_frac"),
        (dupFrac <= 0.6).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Span window width for [[dupSpans]] — the "memorization-length"
    * threshold: only verbatim repeats of at least this many tokens
    * count as duplicated spans (Lee et al. 2107.06499 use 50 BPE
    * tokens at web scale; 20 whitespace tokens is the proportionate
    * bar for this corpus's 10-99-token documents).
    */
  val SpanWindow = 20

  /** Exact duplicated-SUBSTRING spans — the span-level sibling of
    * [[dupNgrams]] (which only counts duplicated shingles, it cannot
    * say WHERE they are): the maximal token ranges in which EVERY
    * token lies inside some [[SpanWindow]]-token window whose text
    * appears verbatim elsewhere in the corpus (any doc, any position,
    * including elsewhere in the same doc), as (doc_id, span_id,
    * start_tok, end_tok, n_toks) — exactly the ranges a substring
    * scrubber would cut. This is the distributed approximation of
    * suffix-array substring dedup: a duplicated span of length
    * L ≥ W appears as L−W+1 consecutive duplicated W-windows, so
    * marking duplicated windows and merging islands of OVERLAPPING
    * window coverage (next start within W of the previous — the
    * gaps-and-islands rule in token space, which also merges two
    * distinct duplicated spans that touch) reconstructs the covered
    * regions, and nothing shorter than W can false-positive.
    *
    * Shape at scale: window fingerprints are 8-byte xxhash64 keys
    * (the DuckDB oracle groups the window TEXT — identical output
    * absent a 2⁻⁶⁴ hash collision, the same keying trade every
    * shingle join here makes); duplicate marking is one count
    * aggregation + one semi-join on the hash — NO pair join of any
    * kind, so there is no k² fanout to cap: a window duplicated a
    * million times costs a million marked rows, linear in input. The
    * island merge is one per-doc window function over integer starts.
    * Output is all-integer — no float surface for the oracle hash.
    */
  def dupSpans(s: SparkSession, dir: String): DataFrame =
    dupSpansFor(load(s, dir, "documents"), SpanWindow)

  /** Frame-parametric core of [[dupSpans]] — any (`doc_id`, `text`)
    * corpus, any window, so `TextAnalysisSpec` can plant verbatim
    * spans at known offsets.
    */
  def dupSpansFor(docs: DataFrame, W: Int): DataFrame = {
    val wins = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= W)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("toks")) - (W - 1))).as("start"),
        col("toks"))
      .select(col("doc_id"), col("start").cast("long").as("start"),
        xxhash64(concat_ws(" ", slice(col("toks"), col("start"), lit(W))))
          .as("wh"))
    val dup = wins.groupBy(col("wh")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("wh"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    val marked = wins.join(dup, Seq("wh"))
      .withColumn("ni",
        when(col("start") - lag(col("start"), 1).over(byDoc) <= W, 0L)
          .otherwise(1L))
      .withColumn("isl", sum(col("ni")).over(byDoc))
    marked.groupBy(col("doc_id"), col("isl"))
      .agg(min(col("start")).as("start_tok"),
        (max(col("start")) + (W - 1)).as("end_tok"))
      .select(col("doc_id"), (col("isl") - 1).as("span_id"),
        col("start_tok"), col("end_tok"),
        (col("end_tok") - col("start_tok") + 1).as("n_toks"))
      .orderBy(col("doc_id"), col("span_id"))
  }

  /** The scrub that [[dupSpans]] plans: every document with its
    * duplicated spans CUT — tokens covered by a span are removed,
    * the rest re-join in order — plus the removal audit
    * (n_toks_before/removed, clean_text). Documents with no spans
    * pass through untouched (left join + empty-coalesce), the
    * Curriculum completeness contract.
    *
    * Shape: the span frame is doc-keyed and tiny relative to the
    * corpus (spans, not tokens); the cut itself is a per-document
    * array filter over the collected span list — state per doc =
    * its own span count, bounded by doc length / window, never by
    * corpus size. One equi-join on doc_id, one narrow projection.
    * NOTE this removes ALL occurrences of a duplicated region (the
    * conservative pre-training scrub); keep-one-copy needs a global
    * canonical-occurrence election on top — the [[Dedup.clusters]]
    * representative pattern — and is a policy layer, not a new
    * physical shape.
    */
  def spanScrub(s: SparkSession, dir: String): DataFrame =
    spanScrubFor(load(s, dir, "documents"), SpanWindow)

  /** Frame-parametric core of [[spanScrub]]. */
  def spanScrubFor(docs: DataFrame, W: Int): DataFrame = {
    val spans = dupSpansFor(docs, W)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("start_tok"), col("end_tok")))
        .as("spans"))
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("spans", coalesce(col("spans"),
        array().cast("array<struct<start_tok:bigint,end_tok:bigint>>")))
      .select(col("doc_id"), size(col("toks")).cast("long")
        .as("n_toks_before"),
        filter(col("toks"), (t, i) => !exists(col("spans"),
          sp => i + 1 >= sp.getField("start_tok") &&
            i + 1 <= sp.getField("end_tok"))).as("kept"))
      .select(col("doc_id"), col("n_toks_before"),
        (col("n_toks_before") - size(col("kept"))).as("n_toks_removed"),
        concat_ws(" ", col("kept")).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  // --- 9. n-gram LM fluency scoring ------------------------------------

  /** Bigram-LM scoring — the CCNet/KenLM-style perplexity filter:
    * train an add-one-smoothed bigram model ON the corpus in one pass,
    * then score every document by its mean log-probability
    * (higher = more fluent under corpus statistics; the downstream
    * filter thresholds or buckets on this score).
    *
    * Shape at scale: two map-side-combinable count aggregations
    * (context unigrams, bigrams — both vocabulary-sized, so they
    * re-join on the gram key as shuffle equi-joins, NOT broadcasts),
    * the 1-row vocabulary size broadcast in, and one per-doc
    * aggregation. No doc×doc interaction anywhere.
    *
    * Cross-engine determinism: P = (c12+1)/(c1+V) is one correctly-
    * rounded IEEE division of exact integers, and ln(P) is evaluated
    * on bit-identical inputs; the per-doc sum folds the SORTED
    * log-prob list (`aggregate(array_sort(...))`), so the addition
    * ORDER is pinned — a plain SUM would re-associate differently per
    * engine/partitioning and shift the last ulp.
    */
  def lmScore(s: SparkSession, dir: String): DataFrame =
    lmScored(s, dir).orderBy(col("doc_id"))

  /** [[lmScore]] without the presentation sort — consumers that
    * re-partition anyway ([[Curriculum]]) start from here so the plan
    * carries no dead global range exchange.
    */
  private[operators] def lmScored(s: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val d = load(s, dir, "documents")
    val toksOf = d.select(col("doc_id"), explode(t).as("w"))
    // vocabulary size = the unigram table's row count (one row per
    // distinct word) — no second corpus scan + countDistinct pass;
    // uni is vocab-sized, cached for its two consumers
    val uni = toksOf.groupBy(col("w").as("w1")).agg(count(lit(1)).as("c1"))
      .cache()
    val vocab = uni.agg(count(lit(1)).as("v"))
    // the bigram postings feed the count table AND the scoring join —
    // cached so the corpus is scanned/exploded once, not per consumer
    val pairs = d.filter(size(t) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .cache()
    val big = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val lp = log((col("c12") + 1).cast("double") / (col("c1") + col("v")))
    pairs
      .join(big, Seq("w1", "w2"))
      .join(uni, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), lp.as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        aggregate(array_sort(collect_list(col("lp"))), lit(0.0),
          (a, x) => a + x).as("sum_lp"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("sum_lp") / col("n_bigrams"), 6).as("mean_lp"))
  }

  // --- 10. tokenizer induction -----------------------------------------

  /** First BPE iteration: corpus-wide counts of adjacent character
    * pairs within words — the merge-candidate table a BPE tokenizer
    * trainer ranks every round (each merge re-runs this count over the
    * re-segmented corpus; the OPERATOR per round is exactly this).
    * The explode is per-character — the true cost of BPE counting —
    * but the aggregation key space is tiny (≤ alphabet², here ≤ 676),
    * so partial aggregation collapses each partition to its local
    * pair table before the shuffle, and the final top-50 is a
    * TakeOrderedAndProject. Deterministic tiebreak on the pair
    * string.
    */
  def bpePairs(s: SparkSession, dir: String): DataFrame = {
    val words = expr("regexp_extract_all(text, '[a-z]+', 0)")
    load(s, dir, "documents")
      .select(explode(words).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(50)
  }

  /** Top-50 corpus bigrams — vocabulary/n-gram statistics, one explode
    * + one map-side-combinable count + TakeOrderedAndProject.
    */
  def topBigrams(s: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val bigrams = zip_with(slice(t, lit(1), size(t) - 1),
      slice(t, lit(2), size(t) - 1), (a, b) => concat(a, lit(" "), b))
    load(s, dir, "documents")
      .filter(size(t) >= 2)
      .select(explode(bigrams).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(50)
  }

  /** Minimum corpus count for a bigram to be lift-scored — rare
    * pairs have astronomic lifts that are pure noise (the standard
    * collocation-extraction floor). */
  val LiftMinCount = 5

  /** Graded `text_bigram_lift`: collocation strength of the top
    * corpus bigrams as LIFT — p(xy) / (p(x)·p(y)), PMI without the
    * log — against their unigram frequencies. Everything PMI ranks,
    * with the transcendental kept OUT of the graded numbers: the
    * statistic is the exact integer cross-ratio n_xy·N_uni² over
    * N_bi·n_x·n_y carried in DECIMAL, ONE double division, one
    * round. Selection order is (count desc, bigram) — exact integers
    * — so the reported SET never depends on a float comparison.
    *
    * Scale shape: one corpus scan for unigram counts, one for bigram
    * counts (both map-side combined into vocab-sized tables), the
    * top-k a TakeOrderedAndProject, and the unigram decoration two
    * joins against a 50-row frame (broadcast-sized by construction).
    */
  def bigramLift(s: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val docs = load(s, dir, "documents")
    val uni = docs.select(explode(t).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
    val nUni = uni.agg(sum(col("n_tok")).as("n_uni"))
    val bigrams = zip_with(slice(t, lit(1), size(t) - 1),
      slice(t, lit(2), size(t) - 1), (a, b) => concat(a, lit(" "), b))
    val bi = docs.filter(size(t) >= 2)
      .select(explode(bigrams).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
    val nBi = bi.agg(sum(col("n")).as("n_bi"))
    val top = bi.filter(col("n") >= LiftMinCount)
      .orderBy(col("n").desc, col("bigram"))
      .limit(50)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    top
      .withColumn("x", split(col("bigram"), " ").getItem(0))
      .withColumn("y", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("tok").as("x"), col("n_tok").as("n_x")), Seq("x"))
      .join(uni.select(col("tok").as("y"), col("n_tok").as("n_y")), Seq("y"))
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .select(col("bigram"), col("n"), col("n_x"), col("n_y"),
        round((dec(col("n")) * dec(col("n_uni")) * dec(col("n_uni")))
            .cast("double")
          / (dec(col("n_bi")) * dec(col("n_x")) * dec(col("n_y")))
            .cast("double"), 6).as("lift"))
      .orderBy(col("n").desc, col("bigram"))
  }

  /** Window for [[cooccurWindow]] — ordered pairs whose positions
    * differ by at most this many tokens.
    */
  val CoocWindow = 3

  /** Pairs reported by [[cooccurWindow]]. */
  val CoocTop = 50

  /** Windowed co-occurrence counts — the corpus statistic
    * distributional-embedding trainers (word2vec, GloVe) consume: for
    * every ORDERED token pair (x, y) with y at most [[CoocWindow]]
    * positions after x, the exact corpus-wide count, top-[[CoocTop]]
    * by (count desc, x, y). The adjacent-bigram statistics
    * (`text_top_bigrams`, PMI) are the window = 1 special case; the
    * windowed matrix is what distributional similarity trains on.
    *
    * Scale shape: NO positional self-join — for each offset d ≤ W the
    * pair stream is a `zip_with` of the token array against itself
    * shifted by d (the bigram trick generalized), so one narrow
    * corpus scan fans out ≤ W pairs per token, map-side combined into
    * a (Zipf-light) pair-count table before the single shuffle, and
    * the top-k is a TakeOrderedAndProject. Exact integer counts —
    * hash-oracled (`text_cooccur_window`).
    */
  def cooccurWindow(s: SparkSession, dir: String): DataFrame = {
    val t = split(col("text"), " ")
    // GloVe's 1/distance weighting kept EXACT: 1/d over d ∈ {1,2,3}
    // accumulates in sixths (6/d is an integer for every d ≤ 3), so
    // the weighted mass is an exact integer sum and the reported
    // weight is ONE IEEE division — hash-oracled like the raw count
    def pairsAt(d: Int) = zip_with(
      slice(t, lit(1), greatest(size(t) - d, lit(0))),
      slice(t, lit(1 + d), greatest(size(t) - d, lit(0))),
      (x, y) => struct(x.as("x"), y.as("y"), lit(6L / d).as("w6")))
    val allPairs = flatten(array((1 to CoocWindow).map(pairsAt): _*))
    load(s, dir, "documents")
      .select(explode(allPairs).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"), col("p.w6"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n_cooc"),
        round(sum(col("w6")).cast("double") / lit(6.0), 6)
          .as("glove_w"))
      .orderBy(col("n_cooc").desc, col("x"), col("y"))
      .limit(CoocTop)
  }

  /** Graded `docs_gini`: Gini coefficient of document length per
    * source — the concentration readout a mixing policy reads next to
    * the JSD drift row (is a source's token mass spread across many
    * docs or locked in a few giants — which decides whether doc-level
    * sampling can rebalance it at all).
    *
    * Exactness: G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over lengths sorted
    * ascending; Σ(i·xᵢ) and Σx are exact integers (rank from a
    * `row_number` — tie groups contribute the same Σ regardless of
    * internal order, so ties cannot move the statistic), and G is one
    * IEEE chain closed under round 6. One window pass per source, one
    * aggregation.
    */
  def docsGini(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    load(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("i") * col("n_chars")).as("ix"))
      .select(col("source"), col("n"), col("total_chars"),
        round(lit(2.0) * col("ix").cast("double")
            / (col("n") * col("total_chars")).cast("double")
            - (col("n") + 1).cast("double") / col("n").cast("double"), 6)
          .as("gini"))
      .orderBy(col("source"))
  }

  /** Ranks fitted by `text_zipf_slope` (df-cap: the head is where the
    * law holds and where every engine agrees the ranking is total).
    */
  val ZipfRanks = 1000

  /** Graded `text_zipf_slope`: the Zipf exponent of the corpus token
    * distribution — ln-freq regressed on ln-rank over the top
    * [[ZipfRanks]] ranks. A natural corpus sits near slope −1; a
    * strongly flatter/steeper fit (or a low R²) flags synthetic or
    * boilerplate-heavy text, which is why corpus QA dashboards carry
    * it next to [[quality]].
    *
    * Exactness: rank is a `row_number` over the TOTAL order
    * (freq DESC, token ASC); each regression input is `round(ln·, 9)`
    * (round-9 absorbs the ≤1-ulp libm spread — the nb_langid/DSIR ln
    * discipline) and the six sums fold as exact scale-9 DECIMAL
    * (order-free); each output statistic is one short IEEE chain over
    * those exact sums, closed under round 6 (the [[Regression]]
    * normal-equation forms). Scale shape: one token count, one
    * WindowGroupLimit top-k, a 1000-row aggregation — corpus-linear,
    * then constant.
    */
  def zipfSlope(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("token"))
    def d9(c: Column): Column = round(c, 9).cast("decimal(38,9)")
    val pts = load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= ZipfRanks)
      .select(
        round(log(col("rank").cast("double")), 9).as("x"),
        round(log(col("freq").cast("double")), 9).as("y"))
    val agg = pts.agg(count(lit(1)).as("n"),
      sum(d9(col("x"))).as("sx"), sum(d9(col("y"))).as("sy"),
      sum(d9(col("x") * col("y"))).as("sxy"),
      sum(d9(col("x") * col("x"))).as("sxx"),
      sum(d9(col("y") * col("y"))).as("syy"))
    val num  = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den  = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val deny = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    agg.select(col("n"),
      round(num / den, 6).as("slope"),
      round((num * num) / (den * deny), 6).as("r2"))
  }

  /** Graded `text_ttr`: lexical-diversity profile per source — the
    * vocabulary-richness curation signal that catches templated or
    * machine-generated sources a quality score misses (they read
    * "fluent" but cycle a tiny vocabulary). Per source: token mass N,
    * type count V, type-token ratio V/N, and Herdan's C = ln V / ln N
    * — the size-robust form (TTR alone decays with N, so comparing
    * differently-sized sources on raw TTR misleads; C is the
    * power-law exponent and comparable across sizes).
    *
    * Exactness: N and V are exact integers (one corpus pass to
    * (source, token) grain, map-side combinable, then a count per
    * source); TTR is ONE IEEE division and C one division of two lns
    * of exactly-converted integers — fixed scalar chains, closed
    * under round 9.
    *
    * Scale shape: the (source, token) collapse is the only shuffle
    * and the heaviest it gets is vocab-per-source rows; no windows,
    * no joins, report sized by |sources|.
    */
  def typeTokenRatio(s: SparkSession, dir: String): DataFrame = {
    val byTok = load(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("n"))
    byTok.groupBy(col("source"))
      .agg(sum(col("n")).as("n_tokens"), count(lit(1)).as("n_types"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double")
          / col("n_tokens").cast("double"), 9).as("ttr"),
        round(log(col("n_types").cast("double"))
          / log(col("n_tokens").cast("double")), 9).as("herdan_c"))
      .orderBy(col("source"))
  }
}
