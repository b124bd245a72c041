package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Bucketed tables — the write-once/join-forever shuffle elimination
  * every 100 TB warehouse leans on. A fact⋈fact equi-join normally
  * shuffles BOTH sides on the key every time it runs; writing each
  * side `bucketBy(N, key).sortBy(key)` pays that partitioning once at
  * write time, and every subsequent join of the two tables reads
  * co-located, pre-sorted buckets: the plan is a SortMergeJoin with
  * NO Exchange on either side (BucketedJoinSpec pins the literal
  * absence). Same spirit as the z-order lifecycle — spend layout work
  * once, never pay the shuffle again — but for the JOIN axis instead
  * of the scan axis.
  *
  * Spark needs a table identity for bucket metadata (bucketing lives
  * in the catalog, not the parquet footer), so the demo registers
  * EXTERNAL tables under a scratch path — dropped and recreated per
  * run, idempotent.
  */
object Bucketed {

  val Buckets = 8

  /** Write lineitem and orders bucketed by the join key as external
    * tables under `base`, returning the two table names (dropped
    * first if present — rebuilds are idempotent).
    */
  private[operators] def writeBucketed(s: SparkSession, dir: String,
      base: String): (String, String) = {
    val (lt, ot) = ("graft_bkt_lineitem", "graft_bkt_orders")
    Seq(lt, ot).foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    // bucket-aligned write: without the repartition every scan task
    // writes its own file per bucket (tasks × Buckets small files +
    // as many commit-protocol moves); repartitioning on the bucket
    // key first makes each bucket exactly one file — the standard
    // small-files fix for bucketed writes at any scale
    load(s, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .repartition(Buckets, col("l_orderkey"))
      .write.option("path", s"$base/$lt")
      .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable(lt)
    load(s, dir, "orders")
      .select("o_orderkey", "o_orderpriority")
      .repartition(Buckets, col("o_orderkey"))
      .write.option("path", s"$base/$ot")
      .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable(ot)
    (lt, ot)
  }

  /** Graded query `bucketed_join` — revenue per order priority
    * through the bucket-co-located join; the oracle is the plain SQL
    * join, which cannot see the layout at all (same contract as
    * `skew_join_salted` and `bloom_join`: the physical technique must
    * be semantically invisible). BucketedJoinSpec pins what the
    * oracle can't: the join reads both sides with ZERO exchanges.
    */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val base = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      "graft_bkt_" + Integer.toHexString(dir.hashCode)).toString
    val (lt, ot) = writeBucketed(s, dir, base)
    joinOver(s, lt, ot)
  }

  /** The join half alone, over already-written tables — what every
    * run after the first looks like in production, and the frame the
    * spec inspects for exchanges.
    */
  private[operators] def joinOver(s: SparkSession, lt: String,
      ot: String): DataFrame =
    // merge hint: at 100 TB neither fact side broadcasts, and SMJ
    // over co-located buckets is the plan bucketing exists for. The
    // hint also makes the plan independent of the broadcast
    // threshold (at toy scale AQE would broadcast the orders side
    // and hide the feature under test), so the fingerprint is
    // data-size-stable.
    s.table(lt).hint("merge")
      .join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
}
