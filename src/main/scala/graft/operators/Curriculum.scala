package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Curriculum ordering — rank every document on a difficulty signal
  * (here: the [[TextAnalysis.lmScore]] fluency score) and cut the
  * corpus into training-stage deciles. The ordering question is the
  * same distributed prefix sum as [[Pack]]: a GLOBAL rank, which the
  * naive form (`row_number` over an unpartitioned window) computes on
  * one task. Here the Pack machinery generalizes from token offsets
  * to ranks — the prefix-summed value is simply 1 per row:
  *
  *   1. range-partition by (score, doc_id) — a deterministic total
  *      order, ties broken by id — and sort within partitions;
  *   2. per-partition ROW COUNTS (one row per partition), exclusive
  *      cumsum over that cluster-sized frame = each partition's rank
  *      offset;
  *   3. broadcast offsets back (map-side pid equi-join preserves the
  *      range order) and one streaming `mapPartitions` counter turns
  *      offset + local position into the global rank.
  *
  * The decile is integer arithmetic on the rank — `(rank−1)·10 div n`
  * — so the cut is engine-exact at any corpus size (an interpolated
  * percentile boundary would re-open the cross-engine float question
  * for no benefit: curriculum stages only need equal-mass cuts).
  *
  * EVERY document is ranked, including ones the LM cannot score
  * (fewer than two tokens → zero bigrams → no defined mean): those
  * keep a NULL `mean_lp` and sort FIRST (ties by id) — explicitly
  * `NULLS FIRST` on both engines, since Spark's ascending default is
  * nulls-first but DuckDB's is nulls-last. Unscoreable docs landing
  * in the earliest stage is the conservative curriculum choice; a
  * consumer wanting them excluded filters on `mean_lp IS NOT NULL`
  * without re-ranking (ranks of scored docs stay contiguous after
  * the prefix of NULLs).
  */
object Curriculum {

  def order(s: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.lmScored(s, dir)
      .select(col("doc_id"), col("mean_lp"))
    val all = graft.Tables.load(s, dir, "documents").select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
    // rank = exclusive prefix of weight 1, plus one; the three-phase
    // scaffolding lives in [[DistributedPrefix.exclusiveSum]]
    val ranked = DistributedPrefix.exclusiveSum(all,
      Seq(col("mean_lp").asc_nulls_first, col("doc_id").asc), lit(1L),
      "rank0")
    // corpus size straight off the documents scan (column-less count):
    // `all` is one row per document by construction (left join onto a
    // per-doc_id aggregate), so this avoids re-deriving the LM join
    val total = graft.Tables.load(s, dir, "documents")
      .agg(count(lit(1)).as("n"))
    ranked
      .select(col("doc_id"), col("mean_lp"),
        (col("rank0") + 1).as("rank"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("mean_lp"), col("rank"),
        expr("(rank - 1) * 10 div n").as("decile"))
      .orderBy(col("doc_id"))
  }
}
