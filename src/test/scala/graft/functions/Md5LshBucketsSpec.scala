package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.SparkSpec

/** Pins [[Md5LshBuckets]] bit-identical to the composed
  * `when(vec_dot(v, lit(md5Plane(t, b))) > 0, 1L << b)` form it
  * replaces in the md5-plane LSH queries — same planes, same
  * left-to-right double fold, same STRICT `> 0` sign test — so the
  * hash-oracled bucket ids cannot drift.
  */
class Md5LshBucketsSpec extends SparkSpec {

  private def composed(v: Column, bits: Int): Column =
    array((0 until Md5LshBuckets.NumTables).map { t =>
      (0 until bits).map { b =>
        when(call_function("vec_dot", v,
          typedLit(Md5LshBuckets.plane(t, b))) > 0,
          lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)

  private def check(bits: Int): Unit = {
    val df = graft.Tables.load(spark, sf, "embeddings")
    val rows = df.select(
      md5LshBuckets(col("embedding"), bits).as("fast"),
      composed(col("embedding"), bits).as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"bits=$bits fast=${r.getSeq[Long](0)} ref=${r.getSeq[Long](1)}")
    }
  }

  test("bits=4 (fixed md5 form): bucket ids identical on real embeddings") {
    check(4)
  }

  test("bits=6 and bits=12 (capacity-scaled forms): identical") {
    check(6)
    check(12)
  }

  test("null vector propagates null") {
    import spark.implicits._
    val df = Seq(Option.empty[Array[Float]]).toDF("v")
    assert(df.select(md5LshBuckets(col("v"), 4)).head.isNullAt(0))
  }
}
