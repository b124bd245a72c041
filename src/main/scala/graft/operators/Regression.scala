package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Closed-form grouped ordinary least squares — per-group trend lines
  * (slope / intercept / R²) as ONE aggregation, no iteration: the
  * normal equations over {n, Σx, Σy, Σxy, Σx², Σy²} admit the same
  * exact-arithmetic discipline as `events_anomaly`'s z-scores
  * (Temporal.scala): every sum is an exact scale-0 DECIMAL (overflow
  * is loud NULL, never silent rounding), and each output statistic is
  * ONE short identical IEEE chain over those exact values, closed
  * under round 6 — so the whole regression hash-oracles in DuckDB
  * (graded `ols_trend`, both scales).
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *   intercept = (Σy − slope·Σx) / n        (the ROUNDED slope, so
  *                                           both engines agree)
  *   R² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))
  *
  * Scale shape: one shuffled join orders⋈customer on the key, then a
  * map-side-combinable 6-sum aggregation per group — the "model" per
  * group is six numbers, so a 100 TB fact table reduces to |groups|
  * rows with no second pass. This is the trend-detection primitive a
  * curation dashboard runs per source/domain (volume drift over time).
  */
object Regression {

  /** Grouped OLS over any (group, x, y) frame — x, y integral-exact
    * columns. Returns n plus the three statistics.
    */
  def olsBy(df: DataFrame, group: Column, x: Column, y: Column): DataFrame = {
    val d = df.select(group.as("grp"),
      x.cast("decimal(38,0)").as("x"), y.cast("decimal(38,0)").as("y"))
    val agg = d.groupBy(col("grp")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    // exact integer numerators/denominators, then one IEEE chain each
    val num  = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den  = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val deny = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    agg
      .withColumn("slope", round(num / den, 6))
      .withColumn("intercept",
        round((col("sy").cast("double") - col("slope")
          * col("sx").cast("double")) / col("n").cast("double"), 6))
      .withColumn("r2", round((num * num) / (den * deny), 6))
      .select(col("grp"), col("n"), col("slope"), col("intercept"), col("r2"))
  }

  /** Graded `ols_trend`: per-nation trend of order value (exact cents)
    * over months-since-1995 — is a market growing, and how linearly?
    */
  def olsTrend(s: SparkSession, dir: String): DataFrame = {
    val o = load(s, dir, "orders")
    val c = load(s, dir, "customer")
    val j = o.join(c, col("o_custkey") === col("c_custkey"))
    olsBy(j,
      col("c_nationkey").cast("long"),
      (year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1,
      round(col("o_totalprice") * 100, 0).cast("long"))
      .withColumnRenamed("grp", "nationkey")
      .orderBy(col("nationkey"))
  }
}
