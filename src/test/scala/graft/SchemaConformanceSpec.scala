package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._

/** The declarative schema-conformance layer (`Tables.conform`): every
  * drift variant that has actually occurred across rounds — plus the
  * plausible neighbors — is PLANTED into a rewritten parquet copy and
  * must load back bit-identical to the canonical frame. Rounds 6 and 7
  * each lost green queries to regenerated-testdata physical-type drift
  * (`events.ts` nanos→micros; `embeddings` float→double); this spec
  * pins the one layer that now absorbs that whole failure class.
  */
class SchemaConformanceSpec extends SparkSpec {

  /** Write `df` to a fresh dir as `name`.parquet, load through
    * `Tables.load`, return the conformed frame.
    */
  private def roundTrip(name: String, df: DataFrame): DataFrame = {
    val dir = Files.createTempDirectory("conform").toString
    df.write.parquet(s"$dir/$name.parquet")
    Tables.load(spark, dir, name)
  }

  private def canonicalTypes(name: String): Seq[(String, DataType)] =
    Tables.canonical(name)

  private def assertCanonical(name: String, df: DataFrame): Unit =
    canonicalTypes(name).foreach { case (c, t) =>
      assert(df.schema(c).dataType == t,
        s"$name.$c: ${df.schema(c).dataType} != canonical $t") }

  /** Orderable full-row snapshot for value comparison. */
  private def rows(df: DataFrame, key: String): Seq[String] =
    df.orderBy(col(key)).collect().map(_.mkString("|")).toSeq

  test("no drift → the exact same DataFrame instance (no projection)") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
    assert(Tables.conform("lineitem", df) eq df)
  }

  test("events.ts planted as nanos-since-epoch long restores micros") {
    val want = Tables.events(spark, sf)
    val drifted = want.withColumn("ts", expr("unix_micros(ts) * 1000L"))
    val got = roundTrip("events", drifted)
    assertCanonical("events", got)
    assert(rows(got, "event_id") == rows(want, "event_id"))
  }

  test("events.ts planted as adjusted-to-UTC timestamp passes through") {
    val want = Tables.events(spark, sf)
    // Spark writes TimestampType as TIMESTAMP(MICROS, adjustedToUTC)
    val got = roundTrip("events", want)
    assertCanonical("events", got)
    assert(rows(got, "event_id") == rows(want, "event_id"))
  }

  test("events.ts planted as TIMESTAMP_NTZ casts to session-TZ ts") {
    val want = Tables.events(spark, sf)
    val drifted = want.withColumn("ts", col("ts").cast(TimestampNTZType))
    val got = roundTrip("events", drifted)
    assertCanonical("events", got)
    assert(rows(got, "event_id") == rows(want, "event_id"))
  }

  test("embeddings.embedding planted as array<double> casts back to float") {
    val want = Tables.load(spark, sf, "embeddings")
    val drifted = want.withColumn("embedding",
      col("embedding").cast(ArrayType(DoubleType)))
    val got = roundTrip("embeddings", drifted)
    assertCanonical("embeddings", got)
    // a float→double→float round trip is exact
    assert(rows(got, "vec_id") == rows(want, "vec_id"))
  }

  test("int64 key planted as int32 widens back (orders.o_orderkey)") {
    val want = Tables.load(spark, sf, "orders")
    val drifted = want
      .withColumn("o_orderkey", col("o_orderkey").cast(IntegerType))
      .withColumn("o_custkey", col("o_custkey").cast(IntegerType))
    val got = roundTrip("orders", drifted)
    assertCanonical("orders", got)
    assert(rows(got, "o_orderkey") == rows(want, "o_orderkey"))
  }

  test("int32 key planted as int64 narrows back (nation.n_nationkey)") {
    val want = Tables.load(spark, sf, "nation")
    val drifted = want
      .withColumn("n_nationkey", col("n_nationkey").cast(LongType))
    val got = roundTrip("nation", drifted)
    assertCanonical("nation", got)
    assert(rows(got, "n_nationkey") == rows(want, "n_nationkey"))
  }

  test("double measure planted as float casts back (l_quantity et al)") {
    val want = Tables.load(spark, sf, "lineitem")
    // l_quantity is integral-valued in TPC-H so float carries it
    // exactly; the schema (not the values) is what this pin is about
    val drifted = want.withColumn("l_quantity",
      col("l_quantity").cast(FloatType))
    val got = roundTrip("lineitem", drifted)
    assertCanonical("lineitem", got)
    assert(rows(got.select("l_orderkey", "l_linenumber", "l_quantity"),
        "l_orderkey") ==
      rows(want.select("l_orderkey", "l_linenumber", "l_quantity"),
        "l_orderkey"))
  }

  test("decimal(15,0) id and decimal price drift coerce back") {
    val want = Tables.load(spark, sf, "part")
    val drifted = want
      .withColumn("p_partkey", col("p_partkey").cast(DecimalType(15, 0)))
      .withColumn("p_retailprice",
        col("p_retailprice").cast(DecimalType(12, 2)))
    val got = roundTrip("part", drifted)
    assertCanonical("part", got)
    assert(rows(got.select("p_partkey"), "p_partkey") ==
      rows(want.select("p_partkey"), "p_partkey"))
  }

  test("timestamp_ntz date column planted as adjusted-UTC casts back") {
    val want = Tables.load(spark, sf, "orders")
    val drifted = want
      .withColumn("o_orderdate", col("o_orderdate").cast(TimestampType))
    val got = roundTrip("orders", drifted)
    assertCanonical("orders", got)
    assert(rows(got, "o_orderkey") == rows(want, "o_orderkey"))
  }

  test("unknown drift fails loudly with the named (table, column)") {
    val want = Tables.load(spark, sf, "documents")
    val drifted = want.withColumn("text", expr("encode(text, 'utf-8')"))
    val e = intercept[SchemaDriftError](roundTrip("documents", drifted))
    assert(e.table == "documents" && e.column == "text")
    assert(e.getMessage.contains("documents.text"))
  }

  test("fractional → integral truncation is refused, not silently cast") {
    val want = Tables.load(spark, sf, "documents")
    val drifted = want.withColumn("n_chars",
      col("n_chars").cast(DoubleType))
    val e = intercept[SchemaDriftError](roundTrip("documents", drifted))
    assert(e.table == "documents" && e.column == "n_chars")
  }

  test("a missing canonical column fails with MissingColumnError") {
    val want = Tables.load(spark, sf, "region")
    val e = intercept[MissingColumnError](
      roundTrip("region", want.drop("r_name")))
    assert(e.table == "region" && e.column == "r_name")
  }

  test("extra columns pass through untouched alongside coercions") {
    val want = Tables.load(spark, sf, "region")
    val drifted = want
      .withColumn("r_regionkey", col("r_regionkey").cast(LongType))
      .withColumn("annotation", expr("concat(r_name, '!')"))
    val got = roundTrip("region", drifted)
    assertCanonical("region", got)
    assert(got.columns.contains("annotation"))
    assert(got.select("annotation").collect().forall(
      _.getString(0).endsWith("!")))
  }

  test("restoreTs (streaming-side entry) applies the same ts rules") {
    val want = Tables.events(spark, sf)
    val nanos = want.withColumn("ts", expr("unix_micros(ts) * 1000L"))
    val ntz = want.withColumn("ts", col("ts").cast(TimestampNTZType))
    for (d <- Seq(nanos, ntz)) {
      val got = Tables.restoreTs(d)
      assert(got.schema("ts").dataType == TimestampType)
      assert(rows(got, "event_id") == rows(want, "event_id"))
    }
    assert(Tables.restoreTs(want) eq want)
  }
}
