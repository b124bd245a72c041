package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Counting-algorithm IVM: retraction, group birth/death, and the
  * maintain ≡ recompute identity the graded oracle also pins.
  */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  private def view(rows: Seq[(Long, Long)]) =
    rows.toDF("k", "s").groupBy(col("k").as("cust"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("s"))
      .select(col("cust"), col("n"), col("s").cast("decimal(38,0)").as("s"))

  test("a fully-retracted group vanishes; a new key is born") {
    val v = view(Seq((1L, 10L), (1L, 20L), (2L, 5L)))
    val delta = Seq((1L, -1L, 10L), (1L, -1L, 20L), (9L, 1L, 7L))
      .toDF("cust", "m", "s")
    val out = Ivm.maintain(v, delta, Seq("cust"), Seq("s")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDecimal(2).longValue()))
      .toMap
    assert(!out.contains(1L), "retracted group survived")
    assert(out(2L) == ((1L, 5L)), "untouched group moved")
    assert(out(9L) == ((1L, 7L)), "new key not born")
  }

  test("over-retraction (net n < 0) fails loudly — a delta removing " +
      "rows the view does not hold is a corrupt feed, not a delete") {
    val v = view(Seq((1L, 10L)))
    val delta = Seq((1L, -1L, 10L), (1L, -1L, 10L)) // retracts 2 of 1
      .toDF("cust", "m", "s")
    val e = intercept[Exception] {
      Ivm.maintain(v, delta, Seq("cust"), Seq("s")).collect()
    }
    // raise_error surfaces as a SparkRuntimeException wrapping the
    // message; pin the diagnostic text so the failure stays explicable
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("retracts rows")),
      s"unexpected failure: $e")
  }

  test("multi-sum views maintain every sum column independently") {
    val v = Seq((1L, 2L, 30L, 300L)).toDF("cust", "n", "s", "t")
      .select(col("cust"), col("n"),
        col("s").cast("decimal(38,0)").as("s"),
        col("t").cast("decimal(38,0)").as("t"))
    val delta = Seq((1L, 1L, 5L, 50L), (1L, -1L, 10L, 100L))
      .toDF("cust", "m", "s", "t")
    val out = Ivm.maintain(v, delta, Seq("cust"), Seq("s", "t")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 2L) // 2 + 1 - 1
    assert(r.getDecimal(2).longValue() == 25L) // 30 + 5 - 10
    assert(r.getDecimal(3).longValue() == 250L) // 300 + 50 - 100
  }

  test("maintain equals a from-scratch recompute on the graded delta") {
    val maintained = Ivm.ivmMaintain(spark, sf).collect()
    // recompute: base rows minus deletes plus inserts, re-aggregated
    val o = graft.Tables.load(spark, sf, "orders").select(
      col("o_orderkey").cast("string").as("ok"),
      col("o_custkey").cast("long").as("cust"),
      round(col("o_totalprice") * 100, 0).cast("decimal(38,0)").as("s"))
    def h4(salt: String) =
      conv(substring(md5(concat(col("ok"), lit(salt))), 1, 4), 16, 10)
        .cast("long")
    val kept = o.filter(h4("#del") >= 6554).select(col("cust"), col("s"))
    val ins = o.filter(h4("#ins") < 3277)
      .select(when(h4("#new") < 16384, col("cust") + 10000000L)
        .otherwise(col("cust")).as("cust"), (col("s") + 12345).as("s"))
    val recomputed = kept.unionByName(ins).groupBy(col("cust"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("s"))
      .select(col("cust"), col("n"), col("s").cast("long").as("sum_cents"),
        round(col("s").cast("double") / col("n").cast("double"), 6)
          .as("avg_cents"))
      .orderBy(col("cust")).collect()
    assert(maintained.length == recomputed.length)
    maintained.zip(recomputed).foreach { case (a, b) =>
      assert(a == b, s"maintained $a vs recomputed $b")
    }
  }

  test("maintenance is join-free: one union + one re-aggregation") {
    val v = view(Seq((1L, 10L), (2L, 5L)))
    val delta = Seq((2L, 1L, 3L)).toDF("cust", "m", "s")
    val plan = Ivm.maintain(v, delta, Seq("cust"), Seq("s"))
      .queryExecution.executedPlan.toString()
    assert(!plan.toLowerCase.contains("join"), s"join in IVM plan:\n$plan")
  }
}
