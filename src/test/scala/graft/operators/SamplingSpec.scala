package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Universe-sampling properties beyond the oracle: determinism and the
  * cross-table coherence that makes hash sampling the right tool for
  * pipeline cuts (sampling each table independently on the SAME key
  * commutes with joining them — RNG sampling does not).
  */
class SamplingSpec extends SparkSpec {

  test("sampling on a shared key commutes with the join") {
    val keep = (k: org.apache.spark.sql.Column) =>
      Sampling.universeFilter(k.cast("string"), 4) // 4/16 of orderkeys
    val l = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))

    // sample-then-join: each table cut independently, same key
    val sampledJoin = l.filter(keep(col("l_orderkey")))
      .join(o.filter(keep(col("o_orderkey"))),
        col("l_orderkey") === col("o_orderkey"))
    // join-then-sample
    val joinSampled = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(keep(col("l_orderkey")))

    val a = sampledJoin.orderBy("l_orderkey", "l_quantity").collect()
    val b = joinSampled.orderBy("l_orderkey", "l_quantity").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("universe filter is deterministic and rate-monotone") {
    val keys = Tables.load(spark, sf, "orders").select(col("o_orderkey"))
    def n(sixteenths: Int): Long = keys
      .filter(Sampling.universeFilter(col("o_orderkey").cast("string"),
        sixteenths)).count()
    val counts = Seq(1, 4, 8, 12).map(n)
    assert(counts == counts.sorted, s"rates must be monotone: $counts")
    assert(n(4) == n(4)) // rerun-stable
    val total = keys.count()
    // 4/16 nominal rate lands near 25%
    assert(math.abs(n(4).toDouble / total - 0.25) < 0.05)
    intercept[IllegalArgumentException](Sampling.universeFilter(lit("x"), 16))
  }
}
