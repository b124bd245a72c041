package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** MERGE INTO / slowly-changing-dimension maintenance — the lakehouse
  * mutation family (Delta/Iceberg `MERGE`, Kimball SCD type 2)
  * expressed as pure relational algebra over immutable frames.
  *
  * Two verbs:
  *
  *   - [[upsert]] — one-shot MERGE semantics: a change batch carrying
  *     an action column ('U'pdate / 'D'elete / 'I'nsert) is applied to
  *     a target in ONE full-outer equi-join on the key. Matched
  *     updates apply the batch's NON-NULL columns (partial update,
  *     `UPDATE SET` style), matched deletes drop the row, unmatched
  *     inserts append; a matched 'I' keeps the target untouched and an
  *     unmatched 'U'/'D' is a no-op — exactly ANSI MERGE's
  *     matched/not-matched clause dispatch.
  *   - [[scd2Apply]] — type-2 history: applying a batch at tick T
  *     closes each current row whose tracked value actually CHANGED
  *     (`valid_to = T`), opens its successor (`valid_from = T`,
  *     `valid_to = NULL`), appends never-seen keys as first versions,
  *     and leaves no-change rows and closed history untouched. Chained
  *     applications build the full version history (graded
  *     `scd2_history` runs two ticks).
  *
  * Scale shape: each application is ONE shuffled equi-join on the key
  * plus unions — no iteration, no corpus-side broadcast (a real change
  * batch is a sizable fraction of the dimension; at 100 TB neither leg
  * broadcasts, so the batch leg carries an explicit `shuffle_hash`
  * hint — the deterministic choice is also the scale-honest one, the
  * [[Snapshot]] discipline). The graded batches are pure md5 functions
  * of `customer` (the [[Er]] discipline), so DuckDB reproduces them
  * exactly and both graded queries hash-oracle; balances are carried
  * as exact integer CENTS (`round(bal*100)`) so every comparison and
  * merge is integer arithmetic, bit-identical in any engine.
  */
object Merge {

  /** First 4 md5 hex digits of `e` as a long in [0, 65535] — the
    * deterministic "new value" generator (identical in DuckDB via the
    * digit-fold form).
    */
  private def hex4(e: Column): Column =
    conv(substring(md5(e), 1, 4), 16, 10).cast("long")

  private def salted(key: Column, salt: String): Column =
    concat(key.cast("string"), lit(salt))

  /** MERGE INTO target USING batch ON key: one full-outer equi-join.
    * `batch` carries `key`, an `action` column ('U'/'D'/'I'), and the
    * target's value columns (NULL = leave the target's value — partial
    * update). Appends an `op` readout column
    * ('kept'/'updated'/'inserted'); deleted rows are absent.
    */
  def upsert(target: DataFrame, batch: DataFrame, key: String): DataFrame = {
    val vals = target.columns.filterNot(_ == key)
    val j = target.as("t").join(
      batch.as("b").hint("shuffle_hash"),
      col("t." + key) === col("b." + key), "full_outer")
    val act     = col("b.action")
    val matched = col("t." + key).isNotNull && col("b." + key).isNotNull
    val tOnly   = act.isNull
    val bOnly   = col("t." + key).isNull
    // MERGE clause dispatch: matched D drops, unmatched U/D are no-ops
    val keep   = tOnly || (matched && act =!= "D") || (bOnly && act === "I")
    val applyB = (matched && act === "U") || (bOnly && act === "I")
    j.filter(keep).select(
      coalesce(col("t." + key), col("b." + key)).as(key) +:
        vals.map(v => when(applyB, coalesce(col("b." + v), col("t." + v)))
          .otherwise(col("t." + v)).as(v)) :+
        when(bOnly && act === "I", "inserted")
          .when(matched && act === "U", "updated")
          .otherwise("kept").as("op"): _*)
  }

  /** One SCD2 tick: apply `batch` (`key`, `newVal`) to a version table
    * (`key`, `valCol`, `valid_from`, `valid_to`) at tick `ts`. Closed
    * history passes through untouched; a current row whose value
    * changed is closed at `ts` and its successor opened; unchanged
    * matches and unmatched current rows pass through; never-seen keys
    * insert as first versions at `ts`.
    */
  def scd2Apply(dim: DataFrame, batch: DataFrame, key: String,
      valCol: String, ts: Long): DataFrame = {
    val hist = dim.filter(col("valid_to").isNotNull)
    val cur  = dim.filter(col("valid_to").isNull)
    val b    = batch.select(col(key), col("new_val"))
    val j = cur.join(b.hint("shuffle_hash"), Seq(key), "left")
    val changed = col("new_val").isNotNull && col("new_val") =!= col(valCol)
    val closedOrKept = j.select(col(key), col(valCol), col("valid_from"),
      when(changed, lit(ts)).otherwise(lit(null).cast("long")).as("valid_to"))
    val successors = j.filter(changed).select(col(key),
      col("new_val").as(valCol), lit(ts).as("valid_from"),
      lit(null).cast("long").as("valid_to"))
    val inserts = b.join(dim.select(col(key)).distinct(), Seq(key), "left_anti")
      .select(col(key), col("new_val").as(valCol), lit(ts).as("valid_from"),
        lit(null).cast("long").as("valid_to"))
    hist.select(col(key), col(valCol), col("valid_from"), col("valid_to"))
      .unionByName(closedOrKept).unionByName(successors).unionByName(inserts)
  }

  /** The customer dimension as merged state: key, name, exact integer
    * cents, segment.
    */
  private[operators] def customerDim(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "customer").select(
      col("c_custkey").as("custkey"), col("c_name").as("name"),
      round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents"),
      col("c_mktsegment").as("segment"))

  /** The deterministic MERGE batch (pure md5 function of `customer`):
    * first md5 digit of key#m1 < '4' → balance update; in ['4','6') →
    * delete; an independent 1/8 slice arrives as brand-new keys
    * (key + 10M). Update rows leave name/segment NULL — the partial-
    * update path.
    */
  private[operators] def changeBatch(s: SparkSession, dir: String): DataFrame = {
    val c   = load(s, dir, "customer")
    val key = col("c_custkey")
    val m   = substring(md5(salted(key, "#m1")), 1, 1)
    val nullStr = lit(null).cast("string")
    val upd = c.filter(m < "4").select(key.as("custkey"),
      lit("U").as("action"), nullStr.as("name"),
      hex4(salted(key, "#u1")).as("bal_cents"), nullStr.as("segment"))
    val del = c.filter(m >= "4" && m < "6").select(key.as("custkey"),
      lit("D").as("action"), nullStr.as("name"),
      lit(null).cast("long").as("bal_cents"), nullStr.as("segment"))
    val ins = c.filter(substring(md5(salted(key, "#i1")), 1, 1) < "2")
      .select((key + 10000000L).as("custkey"), lit("I").as("action"),
        concat(lit("Customer#NEW"), key.cast("string")).as("name"),
        hex4(salted(key, "#n1")).as("bal_cents"), lit("BUILDING").as("segment"))
    upd.unionByName(del).unionByName(ins)
  }

  /** Graded `merge_upsert`: the md5-derived batch merged into the
    * customer dimension.
    */
  def upsertGraded(s: SparkSession, dir: String): DataFrame =
    upsert(customerDim(s, dir), changeBatch(s, dir), "custkey")
      .orderBy(col("custkey"))

  /** SCD2 tick-`t` batch: 1/4 of keys (md5 digit of key#m<t>) get a
    * fresh md5-derived balance.
    */
  private[operators] def scd2Batch(s: SparkSession, dir: String, t: Int): DataFrame = {
    val key = col("c_custkey")
    load(s, dir, "customer")
      .filter(substring(md5(salted(key, s"#m$t")), 1, 1) < "4")
      .select(key.as("custkey"), hex4(salted(key, s"#v$t")).as("new_val"))
  }

  /** Graded `scd2_history`: the customer balance dimension after two
    * chained SCD2 ticks — full version history with close/open edges.
    */
  def scd2Graded(s: SparkSession, dir: String): DataFrame = {
    val dim0 = customerDim(s, dir).select(col("custkey"), col("bal_cents"),
      lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"))
    val s1 = scd2Apply(dim0, scd2Batch(s, dir, 1), "custkey", "bal_cents", 1L)
    val s2 = scd2Apply(s1, scd2Batch(s, dir, 2), "custkey", "bal_cents", 2L)
    s2.withColumn("is_current", col("valid_to").isNull)
      .orderBy(col("custkey"), col("valid_from"))
  }
}
