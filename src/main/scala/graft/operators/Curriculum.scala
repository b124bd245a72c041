package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum ordering — rank every document on a difficulty signal
  * (here: the [[TextAnalysis.lmScore]] fluency score) and cut the
  * corpus into training-stage deciles. The ordering question is the
  * same distributed prefix sum as [[Pack]]: a GLOBAL rank, which the
  * naive form (`row_number` over an unpartitioned window) computes on
  * one task. Here the Pack machinery generalizes from token offsets
  * to ranks — the prefix-summed value is simply 1 per row:
  *
  *   1. range-partition by (score, doc_id) — a deterministic total
  *      order, ties broken by id — and sort within partitions;
  *   2. per-partition ROW COUNTS (one row per partition), exclusive
  *      cumsum over that cluster-sized frame = each partition's rank
  *      offset;
  *   3. broadcast offsets back (map-side pid equi-join preserves the
  *      range order) and one streaming `mapPartitions` counter turns
  *      offset + local position into the global rank.
  *
  * The decile is integer arithmetic on the rank — `(rank−1)·10 div n`
  * — so the cut is engine-exact at any corpus size (an interpolated
  * percentile boundary would re-open the cross-engine float question
  * for no benefit: curriculum stages only need equal-mass cuts).
  */
object Curriculum {

  def order(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = TextAnalysis.lmScored(s, dir)
      .select(col("doc_id"), col("mean_lp"))
    val rel = scored.repartitionByRange(col("mean_lp"), col("doc_id"))
      .sortWithinPartitions(col("mean_lp"), col("doc_id"))
    val counts = rel.groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("c"))
    val owin = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("offset", coalesce(sum(col("c")).over(owin), lit(0L)))
      .select(col("pid"), col("offset"))
    val total = counts.agg(sum(col("c")).as("n"))
    rel.withColumn("pid", spark_partition_id())
      .join(broadcast(offs), "pid")
      .select(col("doc_id"), col("mean_lp"), col("offset"))
      .as[(Long, Double, Long)]
      .mapPartitions { it =>
        var rank = Long.MinValue
        it.map { case (id, lp, off) =>
          if (rank == Long.MinValue) rank = off
          rank += 1
          (id, lp, rank)
        }
      }
      .toDF("doc_id", "mean_lp", "rank")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("mean_lp"), col("rank"),
        expr("(rank - 1) * 10 div n").as("decile"))
      .orderBy(col("doc_id"))
  }
}
