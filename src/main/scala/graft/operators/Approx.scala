package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Approximate/sketch aggregation pack — the bounded-memory answers a
  * 100 TB engine reaches for when exact answers would shuffle the
  * world. Complements the custom KMV sketch (`functions/KMVDistinct`):
  * here the engine-native sketches, each map-side combinable and
  * merge-order-independent, so results are deterministic under any
  * partial-aggregation schedule.
  *
  * No DuckDB oracles (sketch internals are engine-specific — DuckDB's
  * HLL differs from Spark's); accuracy contracts are pinned against
  * exact answers in ApproxSpec instead, mirroring how the KMV sketch
  * is verified.
  */
object Approx {

  /** HyperLogLog++ distinct counts per group (rsd 5%): O(1) state per
    * group vs the exact shuffle of every distinct key.
    */
  def hllDistinct(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      // compact-buffer twin of approx_count_distinct — bit-identical
      // estimates (HllDistinctSpec), none of the builtin's wide
      // aggregation-buffer codegen cost
      .agg(graft.functions.HllDistinct(col("l_orderkey"), 0.05)
          .as("est_orders"),
        graft.functions.HllDistinct(col("l_suppkey"), 0.05)
          .as("est_suppliers"))
      .orderBy(col("l_returnflag"))

  /** Approximate percentiles (t-digest-style sketch, mergeable) next
    * to the group count — the 100 TB swap for `percentiles_qty`'s
    * exact per-group sort.
    */
  def approxQuantiles(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_percentile(col("l_quantity"), lit(0.5), lit(10000)).as("p50"),
        approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("p50_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** Deterministic-sample denominator for the md5-domain estimator
    * twins: rows whose 52-bit md5 prefix falls under 2^52/8 form a
    * ~12.5% Bernoulli sample that BOTH engines select identically.
    */
  val SampleDen = 8L

  /** 52-bit md5 prefix of a key (the `approx_distinct_kmv_md5`
    * domain trick: 13 hex chars fit exactly in both a BIGINT and a
    * double, so the same threshold test replays in DuckDB).
    */
  private def h52(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 13), 16, 10)
      .cast("long")

  /** The md5-domain GRADED twin of [[approxQuantiles]] (KMV recipe):
    * the t-digest sketch's internals are engine-specific, but the
    * OTHER classical scale path — estimate quantiles as the EXACT
    * quantiles of a deterministic Bernoulli sample — is a pure md5
    * function end to end, so the whole estimator hash-oracles. Per
    * return flag: the positional lower median (the `events_mad`
    * rank-⌊(n+1)/2⌋ pick — the value at a rank of the sorted multiset
    * is well-defined whatever the engine's tie order) of quantity and
    * price cents over the ~12.5% sample. At 100 TB the sample is what
    * gets sorted — 1/[[SampleDen]] of the corpus, and the rule
    * pushes to the scan as a projection filter.
    */
  def quantilesMd5(s: SparkSession, dir: String): DataFrame = {
    val sampled = load(s, dir, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_quantity") * 100, 0).cast("long").as("qty_cents"),
        round(col("l_extendedprice") * 100, 0).cast("long")
          .as("price_cents"),
        h52(concat(col("l_orderkey").cast("string"), lit("#"),
          col("l_linenumber").cast("string"))).as("h"))
      .filter(col("h") < 4503599627370496L / SampleDen)
    val n = Window.partitionBy(col("l_returnflag"))
    val byQty = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("qty_cents"))
    val byPrice = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("price_cents"))
    sampled
      .withColumn("n", count(lit(1)).over(n))
      .withColumn("rq", row_number().over(byQty))
      .withColumn("rp", row_number().over(byPrice))
      .groupBy(col("l_returnflag"))
      .agg(first(col("n")).as("n_sampled"),
        max(when(col("rq") === expr("(n + 1) div 2"), col("qty_cents")))
          .as("p50_qty_cents"),
        max(when(col("rp") === expr("(n + 1) div 2"), col("price_cents")))
          .as("p50_price_cents"))
      .orderBy(col("l_returnflag"))
  }

  /** The md5-domain GRADED twin of [[heavyHitters]]: exact top-20
    * token counts over the deterministic ~12.5% DOCUMENT sample,
    * scaled back by [[SampleDen]] (an integer multiply — the
    * estimate stays exact arithmetic). The sample is selected by
    * doc_id, not token, so a document's tokens stay together — the
    * unit a crawler dedups and ships. At 100 TB the counted frame is
    * 1/8 of the corpus and the aggregation is the same two-phase
    * map-side-combined shape as the exact path.
    */
  def heavyHittersMd5(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .filter(h52(col("doc_id")) < 4503599627370496L / SampleDen)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg((count(lit(1)) * SampleDen).as("est_count"))
      .orderBy(col("est_count").desc, col("token"))
      .limit(20)

  // --- md5-domain HLL: the hash-GRADED twin of the HLL family -------

  /** Registers in the md5-domain HLL (p = 8 index bits). */
  val HllRegisters = 256

  /** alpha_m for m = 256 — 0.7213/(1 + 1.079/m) (Flajolet et al.,
    * 2007), PINNED to 6 decimals so both engines multiply the same
    * literal (the no-runtime-transcendentals rule: the constant is
    * data-independent, so pinning loses nothing). */
  val HllAlpha = 0.718273

  /** Rank of the first 1-bit in the low 44 bits of the md5-52 hash
    * (1-based; 45 when all-zero) — leading-zero count via a FIXED-
    * WIDTH binary string, because `bin`/`lpad`/`instr` have identical
    * semantics in Spark and DuckDB while a log2-based rank would put
    * a transcendental in the hash-graded path. */
  private def hllRho(rem: Column): Column = {
    val first = instr(lpad(bin(rem), 44, "0"), "1")
    when(first === 0, lit(45)).otherwise(first)
  }

  /** (reg, rho) of a 52-bit md5-domain hash: low 8 bits index the
    * register, the remaining 44 bits carry the rank. */
  private def hllRegRho(h: Column): (Column, Column) =
    ((h % HllRegisters).as("reg"), hllRho(shiftright(h, 8)).as("rho"))

  /** Scaled register sum → raw-HLL estimate, both engine-exact: the
    * per-register term 2^(52−M_j) is an exact BIGINT (M ≤ 45, m = 256
    * terms ⇒ the sum spans ≤ 53 significand bits, so even its double
    * cast is exact), and the estimate α·m²·2⁵²/S is literal products
    * + ONE IEEE division, closed under round 4. */
  private def hllEstimate(regSum: Column): Column =
    round((lit(HllAlpha) * lit(65536.0) * lit(4503599627370496.0)) /
      regSum.cast("double"), 4)

  /** The md5-domain GRADED twin of [[hllDistinct]] (the KMV-recipe
    * discipline extended from k-min sketches to HLL): per return
    * flag, every distinct-order hash feeds 256 registers (register =
    * low byte, rank = first 1-bit of the remaining 44), and the RAW
    * HLL harmonic-mean estimate is reported next to the scaled
    * register sum. Every step — md5, shift, bin-string rank, register
    * max, 2^(52−M) sum, one division — is a deterministic integer/
    * literal computation both engines replay bit-identically, so the
    * whole ESTIMATOR hash-oracles, not just its inputs. (The
    * small-range linear-counting correction needs ln(m/V) at query
    * time — a runtime transcendental — so it stays on the engine-
    * native rows-only form this twin grades the semantics of.)
    *
    * Scale shape: one map-side-combinable (flag, reg) max over a
    * projection — state is 256 registers per flag, independent of
    * corpus size; the untouched-register fill joins against a
    * |flags|×256 broadcast grid.
    */
  def hllDistinctMd5(s: SparkSession, dir: String): DataFrame = {
    val (reg, rho) = hllRegRho(col("h"))
    load(s, dir, "lineitem")
      .select(col("l_returnflag"), h52(col("l_orderkey")).as("h"))
      .select(col("l_returnflag"), reg, rho)
      .groupBy(col("l_returnflag"), col("reg"))
      .agg(max(col("rho")).as("rmax"))
      .groupBy(col("l_returnflag"))
      // untouched registers contribute 2^(52-0) each — a CLOSED FORM
      // ((m − |present|)·2^52), never a grid join that would re-scan
      // the fact table (review catch: the grid's distinct() was a
      // second full lineitem pass)
      .agg((sum(expr("shiftleft(cast(1 as bigint), 52 - rmax)")) +
        (lit(HllRegisters.toLong) - count(lit(1))) * lit(1L << 52))
        .as("reg_sum"))
      .select(col("l_returnflag"), col("reg_sum"),
        hllEstimate(col("reg_sum")).as("est_orders"))
      .orderBy(col("l_returnflag"))
  }

  /** The md5-domain GRADED twin of [[hllMergeAudit]]: per-source
    * shard sketches over document ids are union-merged (register-wise
    * max — the HLL merge IS a max, which is why per-partition partials
    * never reshuffle raw ids at 100 TB), and the merged estimate is
    * reported next to the one-pass estimate and the exact count. The
    * mergeability identity est_merged = est_direct now sits in a
    * hash-graded row rather than only in a spec: max-of-shard-maxes
    * equals the global max REGISTER BY REGISTER, so the two estimates
    * are equal by construction and DuckDB confirms it independently.
    */
  def hllMergeMd5(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val (reg, rho) = hllRegRho(col("h"))
    val rhos = docs.select(col("source"), h52(col("doc_id")).as("h"))
      .select(col("source"), reg, rho)
    val shards = rhos.groupBy(col("source"), col("reg"))
      .agg(max(col("rho")).as("rmax"))
    def estOf(regs: DataFrame, name: String): DataFrame =
      regs
        .agg((sum(expr("shiftleft(cast(1 as bigint), 52 - rmax)")) +
          (lit(HllRegisters.toLong) - count(lit(1))) * lit(1L << 52))
          .as("s"))
        .select(hllEstimate(col("s")).as(name))
    val direct = estOf(rhos.groupBy(col("reg"))
      .agg(max(col("rho")).as("rmax")), "est_direct")
    val merged = estOf(shards.groupBy(col("reg"))
      .agg(max(col("rmax")).as("rmax")), "est_merged")
    docs.agg(countDistinct(col("doc_id")).as("exact_distinct"))
      .crossJoin(broadcast(docs.select(col("source")).distinct()
        .agg(count(lit(1)).as("n_shards"))))
      .crossJoin(broadcast(direct))
      .crossJoin(broadcast(merged))
  }

  // --- md5-domain CMS: the hash-GRADED twin of the CMS audit --------

  /** Count-min depth (independent hash rows). */
  val CmsDepth = 4

  /** Count-min width (counters per row). */
  val CmsWidth = 8192

  /** The md5-domain GRADED twin of [[cmsFreqAudit]]: a count-min
    * sketch is nothing but d hashed-row counters — group-by + min is
    * plain SQL once the hash is engine-reproducible. Depth-i bucket
    * of a token is md5-52(token‖"#cms"‖i) mod [[CmsWidth]]; the
    * counter table is the (i, bucket) count; a probe's estimate is
    * the MIN over its d counters. Probes are the exact top-20 corpus
    * tokens, so the classic CMS contract (never undercounts: every
    * probed counter saw all of the token's increments) is visible in
    * the graded rows as est_cms ≥ n_exact (ApproxSpec pins it).
    *
    * Scale shape: counter state is d×w rows regardless of corpus
    * size (the sketch property), built by one map-side-combinable
    * count over a d-way bounded fanout; the probe stage broadcasts
    * 20×d rows. The exact top-k the audit compares against is the
    * same (token, count) aggregation the exact path runs anyway.
    */
  def cmsFreqMd5(s: SparkSession, dir: String): DataFrame = {
    val toks = load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    def buckets: Column = explode(array((0 until CmsDepth).map(i =>
      struct(lit(i).as("i"),
        (h52(concat(col("tok"), lit(s"#cms$i"))) % CmsWidth)
          .as("bucket"))): _*))
    val counters = toks.select(buckets.as("e"))
      .select(col("e.i").as("i"), col("e.bucket").as("bucket"))
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val probes = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok")).limit(20)
      .select(col("tok"), col("n_exact"), buckets.as("e"))
      .select(col("tok"), col("n_exact"),
        col("e.i").as("i"), col("e.bucket").as("bucket"))
    counters.join(broadcast(probes), Seq("i", "bucket"))
      .groupBy(col("tok"), col("n_exact"))
      .agg(min(col("cnt")).as("est_cms"))
      .orderBy(col("n_exact").desc, col("tok"))
  }

  /** The MERGEABILITY contract of distributed sketches, made explicit
    * and measured — the property every 100 TB sketch aggregation
    * rests on (map-side partials merge into the same answer as a
    * single pass): per-source DataSketches HLL sketches are built
    * independently (as shards would), union-merged, and the merged
    * estimate is compared against the one-pass sketch AND the exact
    * distinct count. One output row; ApproxSpec pins merged ≡ direct
    * (register-exact under a shared lgConfigK) and both within the
    * sketch's error envelope of exact. At 100 TB the per-source
    * sketches are per-PARTITION partials that never reshuffle raw
    * ids; the union is a tiny final merge.
    */
  def hllMergeAudit(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents").cache()
    val direct = docs.agg(
      expr("hll_sketch_estimate(hll_sketch_agg(doc_id, 14))")
        .as("est_direct"),
      countDistinct(col("doc_id")).as("exact_distinct"))
    val merged = docs.groupBy(col("source"))
      .agg(expr("hll_sketch_agg(doc_id, 14)").as("sk"))
      .agg(count(lit(1)).as("n_shards"),
        // second arg = allowDifferentLgConfigK: all shards share
        // lgk 14, so strict mode documents the register-exact merge
        expr("hll_sketch_estimate(hll_union_agg(sk, false))")
          .as("est_merged"))
    direct.crossJoin(broadcast(merged))
      .select(col("exact_distinct"), col("n_shards"),
        col("est_direct"), col("est_merged"))
  }

  /** Count-min-sketch frequency audit: for the EXACT top-20 corpus
    * tokens, the exact count next to two sketch estimates — one from a
    * single-pass sketch, one from per-source sketches merged (as
    * shard partials would be at 100 TB). The classic CMS guarantees
    * are what the spec pins: never an undercount (every counter the
    * item hashes to saw all its increments), overcount bounded by
    * ε·N w.h.p., and counter-exact mergeability under a shared
    * (depth, width, seed) — the merged estimate EQUALS the direct one
    * because corresponding counters simply add.
    *
    * Scale shape: two map-side-combinable sketch aggregations (state
    * is the fixed ε×δ counter array, ~112 KB each, independent of
    * corpus size) plus the exact top-k's (token, count) aggregation.
    * Driver work is bounded: |sources| sketches merged + 20 probes.
    * Rows-only — sketch internals are engine-specific, like the rest
    * of the sketch family.
    */
  def cmsFreqAudit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    val (eps, conf, seed) = (0.001, 0.99, 42)
    val toks = load(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .cache() // three consumers: exact top-k, direct sketch, shards
    val topExact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok")).limit(20).collect()
    val agg = s"count_min_sketch(tok, ${eps}d, ${conf}d, $seed)"
    val direct = CountMinSketch.readFrom(
      toks.agg(expr(agg).as("sk")).head.getAs[Array[Byte]]("sk"))
    val merged = toks.groupBy(col("source")).agg(expr(agg).as("sk"))
      .collect().map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]]("sk")))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    toks.unpersist()
    val rows = topExact.toSeq.map { r =>
      val t = r.getAs[String]("tok")
      (t, r.getAs[Long]("n_exact"),
        direct.estimateCount(t), merged.estimateCount(t))
    }
    import s.implicits._
    rows.toDF("tok", "n_exact", "est_direct", "est_merged")
      .orderBy(col("n_exact").desc, col("tok"))
  }

  /** Heavy hitters: estimated top-20 corpus tokens via Spark's
    * `approx_top_k` sketch — bounded state per partition and a single
    * merge, vs the exact path's full (token, count) shuffle. With the
    * tracked-item budget ≥ the vocabulary size the sketch degrades to
    * exact (ApproxSpec pins set-equality with the exact top-k); at
    * 100 TB the budget stays fixed and accuracy degrades gracefully on
    * the tail, never on the head.
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(expr("approx_top_k(tok, 20, 65536)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("token"), col("e.count").as("est_count"))
      .orderBy(col("est_count").desc, col("token"))

  // --- KMV set-operation sketch: pairwise Jaccard / union estimates ---

  /** Pairwise source-similarity matrix from ONE KMV sketch per pair
    * (graded `approx_jaccard_kmv`, hash-oracled — the md5-domain KMV
    * discipline of `approx_distinct_kmv_md5` extended from cardinality
    * to SET OPERATIONS): for sources A and B, the k smallest md5-domain
    * hashes of A∪B form a uniform sample of the union, so
    *
    *   Ĵ(A,B)  = |{h ∈ K(A∪B) : h ∈ A ∧ h ∈ B}| / k        (Beyer et
    *   Û(A,B)  = (k−1) / frac(kth smallest)                 al., 2007)
    *
    * Every quantity is a deterministic function of md5 values, so the
    * whole estimator — not just its inputs — replays bit-identically
    * in DuckDB (`round 6` closes the two IEEE divisions). Grain is the
    * per-source distinct 3-token shingle set ([[Dedup.shingles]] —
    * document-level md5 would be trivially disjoint across sources on
    * this corpus; shingles overlap richly at both scales).
    *
    * Scale shape: the pair list is |S|² rows (tiny — broadcast), each
    * source's sketch rows fan out to its |S|−1 pairs, and the rank
    * filter `rn <= k` plans as WindowGroupLimit — a per-partition
    * top-k, never a full per-pair sort. The k-min property
    * K(A∪B) ⊆ K(A) ∪ K(B) (pinned in ApproxSpec) means per-source
    * sketches are all a cluster ever ships: the pairwise matrix is
    * computable from |S| bounded sketches, not from the corpus.
    */
  def kmvJaccardSources(s: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val docs = load(s, dir, "documents")
    val sigs = docs
      .select(col("source"), explode(Dedup.shingles(col("text"))).as("sh"))
      .select(col("source"),
        conv(substring(md5(col("sh")), 1, 13), 16, 10).cast("long").as("h"))
      .distinct()
    kmvJaccardFor(sigs, docs.select(col("source")).distinct(), k)
  }

  /** Estimator core over any (source, h) sketch-input frame — h must
    * be the 52-bit md5-domain hash (13 hex digits), distinct per
    * (source, h).
    */
  private[operators] def kmvJaccardFor(sigs: DataFrame, srcs: DataFrame,
      k: Int): DataFrame = {
    // sketch FIRST: the k smallest hashes per source (|S|·k rows) are
    // all the pair stage needs — K(A∪B) ⊆ K(A) ∪ K(B), and a union-
    // sketch member h is in A iff h ∈ K(A) (if h ∈ A it is among A's k
    // smallest, being among the union's). ApproxSpec pins this
    // mergeability; computing it this way turns the pair fanout from
    // corpus-sized (every signature × |S|−1 pairs) into KB-sized,
    // bit-identically. The per-source top-k itself plans as
    // WindowGroupLimit — a per-partition partial limit, no full sort.
    val w0 = Window.partitionBy(col("source")).orderBy(col("h"))
    val sk = sigs.withColumn("rn0", row_number().over(w0))
      .filter(col("rn0") <= k)
      .select(col("source"), col("h"))
    val pairs = srcs.as("a")
      .join(srcs.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"))
    val mem = pairs.select(col("src_a"), col("src_b"),
      explode(array(col("src_a"), col("src_b"))).as("member"))
    val g = sk.join(broadcast(mem), col("source") === col("member"))
      .groupBy(col("src_a"), col("src_b"), col("h"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))
    g.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("src_a"), col("src_b"))
      .agg(max(col("rn")).cast("long").as("k_used"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n_both"),
        max(col("h")).as("kth"))
      .select(col("src_a"), col("src_b"), col("k_used"), col("n_both"),
        round(col("n_both").cast("double") / col("k_used"), 6)
          .as("jaccard_est"),
        round(when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (col("kth").cast("double") / lit(4503599627370496.0))), 6)
          .as("union_est"))
      .orderBy(col("src_a"), col("src_b"))
  }
}
