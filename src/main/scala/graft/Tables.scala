package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated TPC-H-ish parquet testdata
  * (see TESTDATA.md). All queries take the scale-factor directory as a
  * runtime argument so the same plan runs at any scale.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // self-install graft's native functions + nanos conf so queries work
    // even in sessions not built from `sessionConfs` (idempotent)
    GraftExtensions.ensure(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects outright. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see Verify/Bench), so
    * the column arrives as nanos-since-epoch longs; this loader restores
    * a microsecond timestamp with exact integer division — the same
    * ns→µs truncation DuckDB applies when it reads the file.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    restoreTs(load(spark, sfDir, "events"))

  /** ns-long → µs-timestamp restore (works on batch and streaming DFs). */
  def restoreTs(df: DataFrame): DataFrame =
    df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Session options every graft session needs: nanos handling + the
    * native-expression registry (vec_dot, minhash_sig).
    */
  val sessionConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.extensions" -> "graft.GraftExtensions",
    // let AQE re-plan cached frames too: several operators cache mid-
    // pipeline (CC loop rounds, shingle sets), and with the default
    // `false` those subtrees are planned WITHOUT adaptive execution —
    // full-width shuffles and no runtime broadcast conversion on
    // exactly the tiny iterative frames that benefit most
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning" -> "true")

}
