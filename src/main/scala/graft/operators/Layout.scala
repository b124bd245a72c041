package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators — how 100 TB tables make their own scans
  * cheap. Two orthogonal techniques:
  *
  *   - **hive partitioning** on a low-cardinality derived key: the
  *     filter prunes whole directories at PLANNING time
  *     (`PartitionFilters` in the scan, pruned before any I/O);
  *   - **sort-within-files** on a second key: parquet row-group
  *     min/max stats skip pages inside the surviving files at READ
  *     time (`PushedFilters`).
  *
  * Together: a (month, sorted-by-day) layout answers a time-range
  * query touching 1/Nth of the partitions and a fraction of each.
  * The write pays one range shuffle, amortized over every later scan.
  */
object Layout {

  /** Write `df` hive-partitioned by a derived month key, rows sorted
    * by `sortCol` inside each file.
    */
  def writeTimePartitioned(df: DataFrame, tsCol: String, sortCol: String,
      path: String): Unit =
    df.withColumn("part_month", date_format(col(tsCol), "yyyy-MM"))
      .repartition(col("part_month"))
      .sortWithinPartitions(col("part_month"), col(sortCol))
      .write.partitionBy("part_month").mode("overwrite").parquet(path)

  /** Read back with partition pruning available to the planner. */
  def readTimePartitioned(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** Write the embeddings corpus hive-partitioned by its IVF cell
    * assignment (Similarity.cellAssignments): the coarse quantizer
    * becomes the directory structure, so an ANN probe reads only its
    * NProbe cells' directories — partition pruning before any vector
    * I/O. This is `ann_ivf_topk`'s probe in on-disk form: at 100 TB
    * the assignment is paid once at write time and every query
    * thereafter scans NProbe/C of the corpus.
    */
  def writeIvfPartitioned(s: SparkSession, dir: String, path: String): Unit =
    Similarity.cellAssignments(s, dir)
      .select(col("vec_id"), col("cv").as("embedding"),
        col("cell").as("part_cell"))
      .repartition(col("part_cell"))
      .write.partitionBy("part_cell").mode("overwrite").parquet(path)
}
