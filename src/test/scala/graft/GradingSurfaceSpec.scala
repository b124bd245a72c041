package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Mechanical guard on the driver grading surface: every registered
  * query must produce a scalar-only top-level schema. The r8 red row
  * happened exactly here — `sq_codes` shipped an `array<bigint>`
  * column that broke the driver's pandas sort-before-hash, turning a
  * correct result into a graded failure; the fix was per-query. This
  * spec makes the failure class impossible to reintroduce: it
  * enumerates `SparkEntry.queries`, builds each frame (plan analysis
  * only — nothing executes), and rejects any top-level array / map /
  * struct column unless the query is explicitly whitelisted with a
  * reason.
  */
class GradingSurfaceSpec extends SparkSpec {

  /** Queries ALLOWED to ship nested top-level columns, with why.
    * Empty today — add an entry only with a note on how the driver
    * grades it (rows-only queries still flow through the same pandas
    * reader, so "rows-only" alone is not a reason).
    */
  private val nestedWhitelist: Map[String, String] = Map.empty

  test("every registered query's schema is scalar at top level " +
      "(driver pandas sort-before-hash compatibility)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
              f.dataType.isInstanceOf[MapType] ||
              f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
        if (bad.nonEmpty && !nestedWhitelist.contains(name)) bad
        else Nil
    }
    assert(offenders.isEmpty,
      s"nested top-level columns would break the driver's pandas " +
        s"sort (the r8 sq_codes failure):\n  ${offenders.mkString("\n  ")}")
  }

  test("queries and oracleSql agree: every oracle names a registered " +
      "query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }
}
