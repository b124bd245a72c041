package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Entity resolution: fuzzy record linkage via DELETION-NEIGHBORHOOD
  * blocking — match an incoming "dirty" batch (names carrying up to
  * one typo) against a clean master WITHOUT any quadratic pair
  * generation.
  *
  * The blocking identity (SymSpell's): lev(s, t) <= 1 iff s = t, or
  * t ∈ del1(s), or s ∈ del1(t), or del1(s) ∩ del1(t) != ∅ (the
  * substitution case — deleting the differing position from both
  * sides yields the same string). So each side explodes into at most
  * |s| + 1 keys (the string plus its single-deletion variants), the
  * candidate set is ONE equi-join on those keys, and an exact
  * `levenshtein` filter over the candidates removes the (few)
  * neighborhood collisions. Fanout is linear in name length — at
  * 100 TB this is a plain shuffled equi-join whose key space is
  * ~(L+1)× the corpus, with no broadcast of either corpus side and
  * no cartesian anywhere (ErSpec pins the plan).
  *
  * The graded batch is derived deterministically from `customer`:
  * every 4th record (md5 digit 2 < '4') arrives as the batch, and
  * half of those (md5 digit 1 < '8') have the character at an
  * md5-derived position deleted — a pure function of the input
  * tables, so DuckDB reproduces it exactly and both graded queries
  * hash-oracle.
  *
  * Honesty note (the [[NaiveBayes]] discipline): TPC-H names are
  * serial ("Customer#000001489"), so distance-1 NEIGHBORS abound and
  * the graded rows verify candidate generation + exact filtering
  * machinery, not disambiguation quality. ErSpec proves RESOLUTION on
  * a planted corpus of word-shaped names where the true parent is the
  * unique distance-<=1 match: accuracy 1.0 against planted typos.
  */
object Er {

  /** The string plus every single-deletion variant, deduplicated —
    * at most length+1 blocking keys per row.
    */
  private[operators] def delKeys(name: Column): Column =
    array_union(array(name),
      transform(sequence(lit(1), length(name)), i =>
        concat(name.substr(lit(1), i - 1),
          name.substr(i + 1, length(name)))))

  /** md5-derived deletion position in [1, len] — the corruption is a
    * pure function of the key, identical in any engine.
    */
  private def delPos(key: Column, name: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10)
      .cast("long") % length(name) + 1

  /** The deterministic incoming batch: 1/4 of customers, half with
    * one character deleted at an md5-derived position.
    */
  private[operators] def dirtyBatch(s: SparkSession, dir: String): DataFrame = {
    val c = load(s, dir, "customer")
    val key = col("c_custkey")
    val p = delPos(key, col("c_name"))
    c.filter(substring(md5(key.cast("string")), 2, 1) < "4")
      .select(key.as("dirty_id"),
        when(substring(md5(key.cast("string")), 1, 1) < "8",
          concat(col("c_name").substr(lit(1), p - 1),
            col("c_name").substr(p + 1, length(col("c_name")))))
          .otherwise(col("c_name")).as("dirty_name"))
  }

  /** All (dirty, clean) pairs within edit distance 1, via the blocked
    * equi-join (graded `er_matches`).
    */
  def matches(s: SparkSession, dir: String): DataFrame =
    graded(s, dir).orderBy(col("dirty_id"), col("clean_id"))

  private def graded(s: SparkSession, dir: String): DataFrame =
    matchesFor(dirtyBatch(s, dir),
      load(s, dir, "customer")
        .select(col("c_custkey").as("clean_id"),
          col("c_name").as("clean_name")))

  /** Frame-parametric core over any (dirty_id, dirty_name) batch and
    * (clean_id, clean_name) master.
    */
  private[operators] def matchesFor(dirty: DataFrame,
      clean: DataFrame): DataFrame = {
    val dk = dirty.select(col("dirty_id"), col("dirty_name"),
      explode(delKeys(col("dirty_name"))).as("k"))
    val ck = clean.select(col("clean_id"), col("clean_name"),
      explode(delKeys(col("clean_name"))).as("k"))
    dk.join(ck, Seq("k"))
      .select(col("dirty_id"), col("dirty_name"),
        col("clean_id"), col("clean_name"))
      .distinct()
      .withColumn("dist",
        levenshtein(col("dirty_name"), col("clean_name")).cast("long"))
      .filter(col("dist") <= 1)
  }

  /** Per-batch-record linkage readout (graded `er_candidates`):
    * candidate counts by distance and the resolved best match
    * ((dist ASC, clean_id ASC) — deterministic even under exact
    * ties).
    */
  def candidates(s: SparkSession, dir: String): DataFrame = {
    val m = graded(s, dir)
    val best = Window.partitionBy(col("dirty_id"))
      .orderBy(col("dist"), col("clean_id"))
    m.withColumn("rn", row_number().over(best))
      .groupBy(col("dirty_id"), col("dirty_name"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("dist") === 0, 1L).otherwise(0L)).as("n_exact"),
        min(when(col("rn") === 1, col("clean_id"))).as("best_id"),
        min(when(col("rn") === 1, col("dist"))).as("best_dist"))
      .orderBy(col("dirty_id"))
  }
}
