package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Hierarchy flattening by POINTER DOUBLING (Wyllie's list-ranking /
  * Blelloch's pointer jumping): every node of a parent forest learns
  * its ROOT and DEPTH in O(log depth) rounds of one shuffled
  * self-equi-join each — the distributed answer to a recursive CTE,
  * which walks one edge per iteration (O(depth) rounds) and is the
  * form engines without recursion cannot run at all.
  *
  * Each round composes the current ancestor pointer with itself:
  * A'(x) = A(A(x)), depth'(x) = depth(x) + depth(A(x)). A root is its
  * own ancestor at depth 0, so composition through a root is a fixed
  * point and the loop converges once every pointer rests on a root —
  * the driver checks ONE count per round (the [[KMeans]] discipline:
  * KB-scale driver decisions, corpus stays out).
  *
  * The graded forest is a pure md5 function of `customer`: nodes
  * < [[RootBound]] are roots, every other node's parent is
  * `hex8(md5(node#p)) % node` — strictly smaller, so chains terminate
  * and expected depth is O(log n). DuckDB reproduces the forest
  * exactly and walks it with a RECURSIVE CTE — the two engines reach
  * the identical flattening through structurally different algorithms,
  * which is precisely what the hash oracle should pin (graded
  * `graph_roots`, both scales).
  *
  * Scale shape: rounds × (self-equi-join on the ancestor key + a
  * count) — every join is key-partitioned with no broadcast of the
  * corpus-sized side; `localCheckpoint` per round caps lineage. At
  * 100 TB a depth-1000 hierarchy costs 10 rounds.
  */
object Graph {

  /** Nodes below this are forest roots. */
  val RootBound = 10L

  private def hex8(e: Column): Column =
    conv(substring(md5(e), 1, 8), 16, 10).cast("long")

  /** The md5 parent forest over customer keys. */
  private[operators] def parentForest(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "customer").select(col("c_custkey").as("node"),
      when(col("c_custkey") < RootBound, col("c_custkey"))
        .otherwise(hex8(concat(col("c_custkey").cast("string"), lit("#p")))
          % col("c_custkey")).as("parent"))

  /** Root + depth per node over any (node, parent) forest — parents
    * must be acyclic (roots self-parented or flagged by node==parent).
    */
  def rootsFor(parents: DataFrame): DataFrame = {
    var st = parents.select(col("node"),
      col("parent").as("anc"),
      when(col("parent") === col("node"), 0L).otherwise(1L).as("depth"))
      .localCheckpoint(eager = true)
    var remaining = 1L
    while (remaining > 0) {
      val hop = st.select(col("node").as("j_node"), col("anc").as("j_anc"),
        col("depth").as("j_depth"))
      st = st.join(hop, col("anc") === col("j_node"))
        .select(col("node"), col("j_anc").as("anc"),
          (col("depth") + col("j_depth")).as("depth"))
        .localCheckpoint(eager = true)
      // converged when every pointer is a fixed point (rests on a root)
      remaining = st.as("a")
        .join(st.select(col("node").as("n2"), col("anc").as("anc2")),
          col("a.anc") === col("n2"))
        .filter(col("anc2") =!= col("a.anc")).count()
    }
    st.select(col("node"), col("anc").as("root"), col("depth"))
  }

  /** Graded `graph_roots`: the md5 forest flattened, against DuckDB's
    * recursive-CTE walk.
    */
  def graphRoots(s: SparkSession, dir: String): DataFrame =
    rootsFor(parentForest(s, dir)).orderBy(col("node"))
}
