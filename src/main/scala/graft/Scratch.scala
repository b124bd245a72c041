package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway decomposition of the ngram-Jaccard pairs pipeline. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeN(label: String, n: Int)(body: => Unit): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $label%-46s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def docs = Tables.load(spark, sfDir, "documents")
    timeN("scan only", 3) { noop(docs) }
    timeN("shingles3", 3) {
      noop(docs.select(col("doc_id"),
        graft.operators.Dedup.shingles(col("text")).as("sh")))
    }
    def index = docs
      .select(col("doc_id"),
        graft.operators.Dedup.shingles(col("text")).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n"),
        explode(col("sh")).as("shingle"))
      .select(col("doc_id"), col("n"), xxhash64(col("shingle")).as("shingle"))
    timeN("index (no cache)", 3) { noop(index) }
    timeN("index cache+materialize", 3) {
      val c = index.cache(); noop(c); c.unpersist()
    }
    timeN("index repartition(32) cache+mat", 3) {
      val c = index.repartition(32).cache(); noop(c); c.unpersist()
    }
    def pairsFrom(inv: org.apache.spark.sql.DataFrame) = {
      val a = inv.toDF("id_a", "n_a", "shingle")
      val b = inv.toDF("id_b", "n_b", "shingle")
      a.join(b, Seq("shingle"))
        .filter(col("id_a") < col("id_b") &&
          col("n_a") <= col("n_b") * 2 && col("n_b") <= col("n_a") * 2)
        .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
        .agg(count(lit(1)).as("shared"))
        .withColumn("jaccard", col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")))
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }
    timeN("pairs over cached index", 6) {
      val c = index.cache()
      noop(pairsFrom(c))
      c.unpersist()
    }
    timeN("pairs over UNcached index", 3) { noop(pairsFrom(index)) }
    timeN("pairs over repart(shingle)-cached index", 6) {
      val c = index.repartition(col("shingle")).cache()
      noop(pairsFrom(c))
      c.unpersist()
    }
    timeN("full dedup_ngram_jaccard query", 3) {
      SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir).count()
      Verify.safeClearCache(spark)
    }
    spark.stop()
  }
}
