package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native-expression semantics: vec_dot must be bit-identical to the
  * declarative fold it replaced (the DuckDB oracle reproduces that
  * fold); minhash_sig must be deterministic and well-formed.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot == interpreted left-to-right double fold, bit for bit") {
    val e = graft.Tables.load(spark, sf, "embeddings").limit(200)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val diff = e.select(
      call_function("vec_dot", col("embedding"), col("embedding")).as("nat"),
      hof.as("ref"))
      .filter(col("nat") =!= col("ref")) // exact comparison, no epsilon
    assert(diff.count() == 0)
  }

  test("vec_dot handles mixed float/double arrays and null propagation") {
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(2.0D, 0.5D)) AS d").head()
    assert(r.getDouble(0) == 4.0)
    val n = spark.sql(
      "SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS d").head()
    assert(n.isNullAt(0))
  }

  test("vec_dot participates in whole-stage codegen") {
    val e = graft.Tables.load(spark, sf, "embeddings")
    val df = e.select(call_function("vec_dot", col("embedding"),
      col("embedding")).as("d"))
    // codegen stages are marked "*(n)" in the simple plan string
    assert(df.queryExecution.executedPlan.toString.contains("*("))
    // and the generated java must actually contain the fused dot loop
    val gen = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(gen.contains("numElements"))
  }

  test("ensure() self-installs idempotently into a session registry") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    graft.GraftExtensions.ensure(spark)
    graft.GraftExtensions.ensure(spark) // second call must be a no-op
    Seq("vec_dot", "minhash_sig", "shingles3", "simhash64").foreach { f =>
      assert(spark.sessionState.functionRegistry
        .functionExists(new FunctionIdentifier(f)), s"$f missing")
    }
  }

  test("minhash_sig: deterministic, correct length, sensitive to content") {
    val df = Seq(
      (1L, Seq("a b c", "b c d")),
      (2L, Seq("a b c", "b c d")),
      (3L, Seq("x y z", "y z w"))).toDF("id", "sh")
    val sigs = df.select(col("id"),
      call_function("minhash_sig", col("sh"), lit(16)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).length == 16)
    assert(sigs(1L) == sigs(2L)) // same input, same signature
    assert(sigs(1L) != sigs(3L))
  }

  test("minhash_sig similarity tracks Jaccard (agreement fraction)") {
    val a = (1 to 40).map(i => s"sh$i")
    val b = (5 to 44).map(i => s"sh$i") // J = 36/44 ≈ 0.82
    val df = Seq((1L, a), (2L, b)).toDF("id", "sh")
    val sigs = df.select(
      call_function("minhash_sig", col("sh"), lit(128)).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val agree = sigs(0).zip(sigs(1)).count { case (x, y) => x == y } / 128.0
    assert(agree > 0.6 && agree < 0.95, s"agreement $agree off from ~0.82")
  }
}
