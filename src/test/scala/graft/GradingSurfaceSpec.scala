package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Mechanical guards on the driver grading surface.
  *
  * 1. Schema: every registered query must produce a scalar-only
  *    top-level schema. The r8 red row happened exactly here —
  *    `sq_codes` shipped an `array<bigint>` column that broke the
  *    driver's pandas sort-before-hash.
  * 2. Plan size: every query's ANALYZED logical plan must stay under
  *    a hard node-count bound. The r11 zero-round happened exactly
  *    here — `graph_kcore`'s un-checkpointed 6-round peel folded
  *    ~5^6 copies of its 4-table upstream into ONE logical tree and
  *    Catalyst's analysis walks never returned, killing BOTH driver
  *    artifacts. A linear node count at test time catches the next
  *    lineage bomb before it reaches the graded surface.
  * 3. Provenance: every registered query must carry a committed
  *    `plans/<name>.txt` executed-plan artifact and a
  *    `BENCH_QUERIES.jsonl` timing row — i.e. it has actually been
  *    RUN at bench scale before shipping. 19 of r11's 22 new queries
  *    were registered without a single execution; this makes that
  *    impossible to repeat silently.
  */
class GradingSurfaceSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  /** Constructing all ~250 query frames caches whatever the operators
    * cache internally; the shared suite session then serves LATER
    * suites' scans from InMemoryRelation, breaking their plan-shape
    * pins (PlanSpec's "no exchange, pruned scan" assertions fail when
    * this suite runs immediately before it). Leave the session the
    * way we found it. */
  override def afterAll(): Unit = {
    Verify.safeClearCache(spark)
    super.afterAll()
  }

  /** Queries ALLOWED to ship nested top-level columns, with why.
    * Empty today — add an entry only with a note on how the driver
    * grades it (rows-only queries still flow through the same pandas
    * reader, so "rows-only" alone is not a reason).
    */
  private val nestedWhitelist: Map[String, String] = Map.empty

  /** Hard bound on analyzed-logical-plan node count per query. The
    * fleet's largest healthy plan (the capstone pipeline) sits well
    * under 1000 nodes; a geometric lineage bomb blows past this by
    * round 4 of any fold. Headroom is deliberate — the guard exists
    * to catch runaway growth, not to punish a wide-but-linear plan.
    */
  private val MaxPlanNodes = 2000

  /** Per-query construction bound: normal builders return in
    * milliseconds-to-seconds (analysis plus, for checkpointing
    * operators, small sf0.001 executions); only a plan whose ANALYSIS
    * never returns should trip this. */
  private val FrameBoundSec = 120L

  /** One frame per query, built once and shared by the schema and
    * plan-size tests (construction is analysis — and, for operators
    * with eager per-round checkpoints, small sf0.001 executions — so
    * building the fleet twice would double the suite's dominant
    * cost). Construction runs under the SAME watchdog as the driver
    * mains: the node-count test below only sees a plan that finished
    * analyzing, so a true geometric bomb (the r11 class) would
    * otherwise hang HERE, nameless, instead of failing the guard —
    * the bound turns it into a failure that names the query.
    */
  private lazy val frames: Seq[(String, DataFrame)] = {
    // force the session OUTSIDE the watchdog thread: same-object lazy
    // vals share the instance monitor, so a daemon thread initializing
    // `spark` while this thread initializes `frames` would deadlock
    // (observed as the very first query "timing out" at construction)
    val s = spark
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      Verify.bounded(name, FrameBoundSec)(fn(s, sf)) match {
        case Right(df) => name -> df
        case Left(msg) => fail(s"query $name did not construct within " +
          s"$FrameBoundSec s ($msg) — an analyzer bomb (cut the fold's " +
          "lineage with localCheckpoint per round) or a broken builder")
      }
    }
  }

  test("every registered query's schema is scalar at top level " +
      "(driver pandas sort-before-hash compatibility)") {
    val offenders = frames.flatMap { case (name, df) =>
      val bad = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
      if (bad.nonEmpty && !nestedWhitelist.contains(name)) bad
      else Nil
    }
    assert(offenders.isEmpty,
      s"nested top-level columns would break the driver's pandas " +
        s"sort (the r8 sq_codes failure):\n  ${offenders.mkString("\n  ")}")
  }

  test("every registered query's logical plan stays under the " +
      "analyzer-bomb node bound (the r11 graph_kcore failure)") {
    val sizes = frames.map { case (name, df) =>
      name -> df.queryExecution.logical.collect { case _ => 1 }.sum
    }
    val over = sizes.filter(_._2 > MaxPlanNodes).sortBy(-_._2)
    assert(over.isEmpty,
      s"logical plans over $MaxPlanNodes nodes — geometric lineage " +
        s"growth; cut it with localCheckpoint per round:\n  " +
        over.map { case (n, c) => s"$n: $c nodes" }.mkString("\n  "))
  }

  test("queries and oracleSql agree: every oracle names a registered " +
      "query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("no query ships unrun: every registered query has a committed " +
      "plans/ artifact and a BENCH_QUERIES.jsonl timing row") {
    val names = SparkEntry.queries.keySet
    val planless = names.filterNot(n =>
      java.nio.file.Files.exists(java.nio.file.Paths.get("plans", s"$n.txt")))
    val benchRows: Set[String] = {
      val p = java.nio.file.Paths.get("BENCH_QUERIES.jsonl")
      if (!java.nio.file.Files.exists(p)) Set.empty
      else {
        val re = "\"query\":\"([^\"]+)\"".r
        scala.jdk.CollectionConverters
          .IteratorHasAsScala(java.nio.file.Files.lines(p).iterator())
          .asScala.flatMap(l => re.findFirstMatchIn(l).map(_.group(1)))
          .toSet
      }
    }
    val benchless = names -- benchRows
    assert(planless.isEmpty && benchless.isEmpty,
      s"queries registered without execution evidence (regenerate with " +
        s"SPARK_GRAFT_DUMP_PLANS=plans sbt 'runMain graft.Bench'):\n" +
        s"  missing plans/: ${planless.toSeq.sorted.mkString(", ")}\n" +
        s"  missing bench row: ${benchless.toSeq.sorted.mkString(", ")}")
  }

  /** Committed bench time above which a query counts as HEAVY and must
    * carry a measured scaling row — plan-shape claims stop being
    * enough exactly where the time is already material at sf0.1.
    */
  private val ScaleGateSec = 1.5

  test("every heavy query (bench > 1.5 s at sf0.1) has a measured " +
      "SCALE_r*.json row — 100 TB claims are measurements, not prose") {
    // the r13 lesson: the exhaustive ADC family's x15-31 growth was
    // invisible until the first scale replay measured it; this gate
    // makes a new heavy query without a scaling row unshippable, the
    // way the plans/ + bench-row gate above ended register-without-run
    import scala.jdk.CollectionConverters._
    val secRe = "\"query\":\"([^\"]+)\",\"sec\":([0-9.]+)".r
    def heavyIn(lines: Iterable[String]): Set[String] = lines.iterator
      .flatMap(l => secRe.findFirstMatchIn(l))
      .collect { case m if m.group(2).toDouble > ScaleGateSec &&
        SparkEntry.queries.contains(m.group(1)) => m.group(1) }
      .toSet
    val benchPath = java.nio.file.Paths.get("BENCH_QUERIES.jsonl")
    val workHeavy =
      heavyIn(java.nio.file.Files.readAllLines(benchPath).asScala)
    // Two-session hysteresis (the r14 judge-run failure): a full bench
    // REWRITES the working-tree sidecar with the current host's
    // timings, and queries near the 1.5 s boundary flap ±30-40% across
    // hosts at unchanged plan_shas. A single hot session must not flip
    // the suite red — a query is gated only when it is heavy in BOTH
    // the working-tree record AND the committed (HEAD) record, i.e.
    // the weight persisted across two sessions. Queries absent from
    // HEAD (registered this session) gate on the working tree alone.
    //
    // Second tier: a working-tree time past HardGateSec gates
    // IMMEDIATELY even where HEAD was light — host spread of a
    // boundary query tops out around 2.1-2.5 s, so 3 s+ is a genuine
    // regression, and waiting a round for the hysteresis would ship
    // exactly the invisible-growth class (r13's ×15-31) the gate
    // exists to catch.
    val HardGateSec = 2.0 * ScaleGateSec
    val workHard: Set[String] = {
      val secRe2 = "\"query\":\"([^\"]+)\",\"sec\":([0-9.]+)".r
      java.nio.file.Files.readAllLines(benchPath).asScala.iterator
        .flatMap(l => secRe2.findFirstMatchIn(l))
        .collect { case m if m.group(2).toDouble > HardGateSec &&
          SparkEntry.queries.contains(m.group(1)) => m.group(1) }
        .toSet
    }
    val headRecord: Option[Set[String]] =
      graft.Bench.committedSidecarLines().map { lines =>
        // membership = rows WITH a timing (secRe): an error-only row
        // at HEAD is zero committed timing evidence — the same
        // epistemic state as "registered this session", so it gates
        // on the working tree alone rather than escaping the gate
        val inHead = lines.iterator
          .flatMap(l => "\"query\":\"([^\"]+)\",\"sec\":".r
            .findFirstMatchIn(l)).map(_.group(1)).toSet
        val heavyHead = heavyIn(lines)
        workHeavy.filter(q =>
          heavyHead(q) || !inHead(q) || workHard(q))
      }
    val heavy = headRecord.getOrElse(workHeavy)
    val scaled: Set[String] = {
      // whitespace-tolerant: SCALE_r13 writes `"query": "..."`,
      // ScaleReplay's own formatter writes `"query":"..."`
      val qRe = "\"query\":\\s*\"([^\"]+)\"".r
      val dir = java.nio.file.Paths.get(".")
      val files = scala.util.Using.resource(
        java.nio.file.Files.list(dir))(_.iterator().asScala
          .filter(_.getFileName.toString.matches("SCALE_r\\d+\\.json"))
          .toList)
      files.flatMap(p => qRe.findAllMatchIn(
        java.nio.file.Files.readString(p)).map(_.group(1))).toSet
    }
    val ungated = heavy -- scaled
    assert(ungated.isEmpty,
      s"heavy queries without a scale-replay row (run tools/" +
        s"make_scale_corpus.py + runMain graft.ScaleReplay, commit " +
        s"SCALE_r{N}.json): ${ungated.toSeq.sorted.mkString(", ")}")
  }
}
