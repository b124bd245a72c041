package graft.operators

import graft.SparkSpec

/** Seeded corpus shuffle: positions must be an exact permutation in
  * md5-key order, seeds must actually re-shuffle, and the plan must
  * stay distributed (the rank comes from the three-phase prefix sum,
  * never a global single-task window).
  */
class ShuffleSpec extends SparkSpec {

  test("positions are a 0..n-1 permutation in (h, doc_id) order; " +
      "shards are contiguous 512-doc slices") {
    val rows = Shuffle.permute(spark, sf).collect()
    val n = rows.length
    assert(n > 0)
    assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq ==
      (0L until n.toLong).toSeq)
    val seq = rows.sortBy(r =>
      (r.getAs[String]("h"), r.getAs[Long]("doc_id")))
    seq.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("pos") == i, s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("shard") == i / Shuffle.ShardDocs)
    }
  }

  test("a different seed yields a different permutation; the same seed " +
      "is bit-stable across runs") {
    val a = Shuffle.permuteSeeded(spark, sf, "epoch0").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    val b = Shuffle.permuteSeeded(spark, sf, "epoch1").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    assert(a.keySet == b.keySet)
    assert(a.count { case (id, p) => b(id) != p } > a.size / 2,
      "epoch reseed should move most documents")
    val a2 = Shuffle.permuteSeeded(spark, sf, "epoch0").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    assert(a == a2, "same seed must reproduce the permutation exactly")
  }

  test("plan: range partitioning on the hash, no corpus-sized " +
      "single-partition collapse") {
    val df = Shuffle.permute(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("rangepartitioning"))
    // the only SinglePartition frames allowed are the P-row offsets
    // cumsum and the final presentation sort's boundary sampling
    assert(!p.contains("windowspecdefinition(doc_id"),
      s"global window over the corpus:\n$p")
    val singles = "SinglePartition".r.findAllIn(p).length
    assert(singles <= 2, s"unexpected global collapse:\n$p")
  }
}
