package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "embeddings") normalizeEmbedding(df) else df
  }

  /** `embeddings.embedding` must be `array<float>` — the typed collect
    * paths (KMeans / Pq codebook locals) decode `Array[Float]`. The
    * same physical-type-drift lesson as `restoreTs`: a regenerated
    * corpus delivering `array<double>` is cast once here, branching on
    * the ACTUAL schema (a float→float cast never enters the plan).
    */
  private def normalizeEmbedding(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "embedding").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, _)) =>
        df.withColumn("embedding", col("embedding").cast("array<float>"))
      case _ => df
    }

  /** `events.ts` arrives differently depending on how the parquet was
    * written, so normalization is schema-adaptive (see `restoreTs`).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    restoreTs(load(spark, sfDir, "events"))

  /** Normalize `ts` to a session-TZ TimestampType regardless of the
    * parquet physical type (works on batch and streaming DFs):
    *
    *  - TIMESTAMP(NANOS) files are rejected by Spark's reader unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, in which case the
    *    column arrives as nanos-since-epoch LONG → restore microseconds
    *    with exact integer division (the same ns→µs truncation DuckDB
    *    applies when it reads such a file).
    *  - TIMESTAMP_MICROS with isAdjustedToUTC=false reads as
    *    TIMESTAMP_NTZ → cast to TimestampType (value-identity under the
    *    UTC session TZ) so windows/watermarks behave identically.
    *  - Already TimestampType → pass through.
    */
  def restoreTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

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
