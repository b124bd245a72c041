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

  test("train/val/test split partitions the corpus: disjoint, " +
      "exhaustive, rerun-stable, rates near 14:1:1") {
    val assigns = Sampling.splitAssign(spark, sf).collect()
    val total = Tables.load(spark, sf, "documents").count()
    assert(assigns.length == total, "every document gets exactly one split")
    assert(assigns.map(_.getAs[Long]("doc_id")).distinct.length == total)
    val bySplit = assigns.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.length.toLong).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.values.sum == total)
    assert(math.abs(bySplit("train").toDouble / total - 14.0 / 16) < 0.1)
    // membership is a pure function of the key: rerun yields the
    // identical assignment (not just identical counts)
    val again = Sampling.splitAssign(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assigns.foreach { r =>
      assert(again(r.getAs[Long]("doc_id")) == r.getAs[String]("split"))
    }
    // the audit aggregates the same assignment
    val audit = Sampling.splitAudit(spark, sf).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(audit == bySplit)
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
