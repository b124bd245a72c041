package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure containment (the r11 lesson — one query with an
  * exponential-lineage plan hung the Catalyst ANALYZER, which no
  * `catch Throwable` can interrupt, and the round's whole correctness
  * artifact came out empty):
  *   - `oracle_sql.json` is written BEFORE the query loop, so a
  *     mid-loop death still leaves every already-dumped result
  *     gradable;
  *   - each query body runs on a watchdog-bounded daemon thread; on
  *     expiry the query is recorded as a timeout and the loop MOVES
  *     ON (the stuck thread is abandoned — it burns one core until
  *     process exit, which is the acceptable price for 227 green
  *     results + 1 named timeout instead of zero results).
  */
object Verify {

  /** Per-query wall-clock bound, seconds. Generous: the sf0.01 sweep's
    * slowest healthy query is ~15 s cold; only a plan that will NEVER
    * finish should trip this. Overridable for local iteration. */
  def timeoutSec: Long =
    sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "300").toLong

  /** Run `body` on a daemon thread, at most `sec` seconds. Left(msg)
    * on timeout or throw. When `cancelIn` is given, the body runs
    * under a per-query Spark job group that is CANCELLED on expiry —
    * the abandoned thread's in-flight jobs die instead of burning
    * executor cores and skewing every subsequent query's timing. The
    * completion latch counts down strictly AFTER `out` is written, so
    * a true `await` can never observe a half-written result; a timed-
    * out body that finishes just after expiry is still reported as a
    * timeout (one verdict per query, decided at the deadline). */
  /** Monotonic suffix for job-group ids: `cancelJobGroupAndFutureJobs`
    * keeps the group id in the context's cancelled set for the session,
    * so REUSING `verify-$name` after a timeout auto-cancels every later
    * run of the same query (ScaleReplay's big-corpus pass, Bench's
    * plan-sha fingerprint rerun). Unique-per-invocation ids scope the
    * cancellation to the one timed-out attempt. */
  private val boundedSeq = new java.util.concurrent.atomic.AtomicLong(0)

  def bounded[A](name: String, sec: Long,
      cancelIn: Option[SparkSession] = None)(body: => A)
      : Either[String, A] = {
    val done = new java.util.concurrent.CountDownLatch(1)
    @volatile var out: Either[String, A] = Left("timeout")
    val group = s"verify-$name-${boundedSeq.incrementAndGet()}"
    val t = new Thread(() => {
      try {
        cancelIn.foreach(_.sparkContext
          .setJobGroup(group, s"verify $name", interruptOnCancel = true))
        out = try Right(body)
        catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: " +
          s"${String.valueOf(e.getMessage).take(200)}") }
      } finally done.countDown()
    }, s"verify-$name")
    t.setDaemon(true)
    t.start()
    val finished = done.await(sec, java.util.concurrent.TimeUnit.SECONDS)
    if (finished) out
    else {
      // AndFutureJobs: plain cancelJobGroup only kills jobs ACTIVE at
      // the deadline — an abandoned body caught BETWEEN two Spark jobs
      // (a driver-side count, then the main job) would submit its next
      // job into the cancelled group and run it to completion anyway
      cancelIn.foreach(_.sparkContext.cancelJobGroupAndFutureJobs(group))
      Left("timeout")
    }
  }

  /** `spark.catalog.clearCache()` under its own short watchdog.
    *
    * Why: a TIMED-OUT query's abandoned thread can still be inside
    * `CachedRDDBuilder.buildBuffers` (holding the builder monitor,
    * waiting on the CacheManager), while a bare clearCache on the
    * main thread takes the CacheManager and waits on that builder —
    * a lock-order inversion observed as a PERMANENT deadlock in the
    * r13 scale replay (jstack: main in `CachedRDDBuilder.clearCache`,
    * watchdog thread in `recacheByCondition`). One hung query must
    * cost its own timeout, never the rest of the run — so the clear
    * itself is bounded and simply skipped (caches stay pinned, the
    * lesser evil) if it cannot finish.
    */
  def safeClearCache(spark: SparkSession): Unit =
    bounded("clear-cache", 30) {
      spark.catalog.clearCache()
    }.left.foreach(msg =>
      System.err.println(s"[verify] clearCache skipped: $msg " +
        "(a timed-out query is still holding cache locks)"))

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter for cheap
    // iteration (the driver always passes exactly two)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      bounded(name, timeoutSec, Some(spark)) {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } match {
        case Left(msg) => System.err.println(s"[verify] $name failed: $msg")
        case Right(_) => ()
      }
      // release any frames an operator cached internally: CacheManager
      // entries are plan-keyed and never auto-dropped, so 80 queries in
      // one session would otherwise pin blocks until execution memory
      // starves (observed as 10-30x slowdowns late in the run).
      // Bounded: see safeClearCache (deadlocks against a timed-out
      // query's abandoned cache build otherwise)
      safeClearCache(spark)
    }
    spark.stop()
  }
}
