package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Skew-mitigation operators. AQE's skew-join handles most runtime
  * skew, but salting is the portable plan-level tool when a shuffle key
  * is known-hot (the classic 100 TB failure mode: one key's partition
  * OOMs an executor while the rest idle). These helpers implement it as
  * ordinary DataFrame transforms whose results are provably identical
  * to the unsalted plan — `skew_join_salted` is oracle-checked against
  * the plain SQL join.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways: the big
    * side gets a random-but-deterministic salt (hash of its row key
    * space via pmod of xxhash64), the small side is replicated once per
    * salt value, and the join key becomes (key, salt) — splitting each
    * hot key's rows across `salts` reducers. Exact same output rows as
    * the unsalted join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int)
      : DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Revenue per order-priority via a salted lineitem⋈orders join —
    * deliberately the same result contract as the plain join+agg, so
    * the DuckDB oracle proves salting changes the distribution, not
    * the answer. (Decimal sum: order-independent under any partial-agg
    * schedule.)
    */
  def skewJoinSalted(s: SparkSession, dir: String): DataFrame = {
    val l = load(s, dir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"),
        col("l_extendedprice").cast("decimal(12,2)").as("price"))
    val o = load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    saltedJoin(l, o, "o_orderkey", salts = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("price")).cast("double").as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Graded query `skew_report` — the measurement that picks `salts`.
    * Per-key row counts over a shuffle key, each key's share of the
    * table (one IEEE division of two exact longs — bit-identical in
    * any engine) and the split factor a 32-way shuffle needs to hold
    * that key's partition at the average size:
    * ceil(n_key · 32 / n_total), computed in exact integer arithmetic
    * as `(n·32 + total − 1) div total`. At 100 TB this is the cheap
    * pre-pass — one map-side-combined groupBy over the key column
    * alone — that decides between a plain shuffle join, AQE skew
    * splitting, and an explicit [[saltedJoin]], instead of discovering
    * the hot key from an executor OOM.
    */
  def skewReport(s: SparkSession, dir: String): DataFrame = {
    val keys = load(s, dir, "events").select("event_type")
    val total = keys.agg(count(lit(1)).as("n_total"))
    keys.groupBy(col("event_type")).agg(count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(total))
      .select(col("event_type"), col("n_rows"),
        round(col("n_rows").cast("double") / col("n_total"), 6)
          .as("share"),
        expr("(n_rows * 32 + n_total - 1) div n_total").as("salt_32"))
      .orderBy(col("n_rows").desc, col("event_type"))
  }
}
