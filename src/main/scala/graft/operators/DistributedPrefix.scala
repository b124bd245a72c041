package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The distributed exclusive prefix sum shared by [[Pack.packChunks]]
  * (token offsets) and [[Curriculum.order]] (global ranks, weight 1).
  * The naive Spark form — `Window.orderBy(...)` with no partition key —
  * silently collapses the corpus into ONE task; this is the
  * scale-correct three-phase shape:
  *
  *   1. range-partition by the order columns and sort within
  *      partitions, so partition order = the requested total order;
  *   2. per-partition weight totals — one row PER PARTITION, a frame
  *      bounded by cluster parallelism, never data size — and their
  *      exclusive running sum = each partition's starting offset;
  *   3. broadcast the offsets back (pid equi-join — map-side,
  *      preserves the range partitioning and sort) and one streaming
  *      `mapPartitions` pass turns offset + per-row weights into the
  *      per-row exclusive prefix.
  *
  * Invariants callers inherit (kept in ONE place on purpose — both
  * consumers used to carry private copies of this scaffolding):
  *
  *   - NO cache on the ranged frame: the sums subtree and the probe
  *     subtree contain the IDENTICAL exchange, so ReuseExchange
  *     materializes the range shuffle once and both sides read its
  *     files — same partitions (pid-consistent), no pinned storage
  *     leaking past a lazily-returned frame. Pinned in PackSpec /
  *     CurriculumSpec.
  *   - The broadcast pid join must stay map-side: a shuffle here
  *     would destroy the within-partition sort the phase-3 counter
  *     relies on.
  *   - `Long.MinValue` seeds the running counter so an all-zero
  *     offset (first partition) is distinguishable from "unseeded".
  *
  * The `mapPartitions` is the genuine per-partition-imperative case: a
  * running sum seeded per partition has no declarative form that
  * avoids a second full shuffle. Everything stays distributed; the
  * only single-point state is the P-row offsets frame.
  */
object DistributedPrefix {

  /** `df` plus a non-null `outName` long column = the exclusive
    * prefix sum of `weight` (cast to long) in the total order given
    * by `orderCols` (which may carry sort direction / null ordering,
    * e.g. `asc_nulls_first`). Output rows keep `df`'s schema, in
    * range-partition order.
    */
  private[operators] def exclusiveSum(df: DataFrame, orderCols: Seq[
      org.apache.spark.sql.Column], weight: org.apache.spark.sql.Column,
      outName: String): DataFrame = {
    // case-insensitive (Spark's default resolution) and covering
    // outName too: a duplicate output column or a case-variant "PID"
    // would corrupt the frame just as silently as an exact match
    val reserved = Set("__w", "pid", "offset")
    val lower = df.columns.map(_.toLowerCase)
    require(!lower.exists(reserved), s"input columns collide with " +
      s"the helper's internals: ${df.columns.mkString(",")}")
    require(!reserved(outName.toLowerCase) &&
      !lower.contains(outName.toLowerCase),
      s"outName '$outName' collides with an input or internal column")
    val rel = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__w", weight.cast("long"))
    val sums = rel.groupBy(spark_partition_id().as("pid"))
      .agg(sum(col("__w")).as("t"))
    val owin = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = sums
      .withColumn("offset", coalesce(sum(col("t")).over(owin), lit(0L)))
      .select(col("pid"), col("offset"))
    val keep = df.columns
    val out = StructType(df.schema.fields :+
      StructField(outName, LongType, nullable = false))
    rel.withColumn("pid", spark_partition_id())
      .join(broadcast(offs), "pid")
      .select(keep.map(col) ++ Seq(col("__w"), col("offset")): _*)
      .mapPartitions { it =>
        var run = Long.MinValue
        it.map { r =>
          val n = r.length
          val w = r.getLong(n - 2)
          val off = r.getLong(n - 1)
          if (run == Long.MinValue) run = off
          val start = run
          run += w
          Row.fromSeq(r.toSeq.dropRight(2) :+ start)
        }
      }(Encoders.row(out))
  }
}
