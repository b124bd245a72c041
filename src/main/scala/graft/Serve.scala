package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.api.LakeServer
import graft.engine.Lake

/** Standalone lake server: `runMain graft.Serve [port] [lakeDir]`.
  * Serves the reference's 10-endpoint HTTP API over a local lake.
  * Runtime knobs resolve TOML config first (site then user `core.toml`,
  * `Config.scala` — the reference's `Configuration.java` analog), then
  * CLI args / env override.
  */
object Serve {
  def main(args: Array[String]): Unit = {
    // before any HttpServer can exist in this JVM (see LakeServer.noDelay)
    System.setProperty("sun.net.httpserver.nodelay", "true")
    val conf = Config.load()
    val port = args.lift(0).map(_.toInt).getOrElse(conf.port)
    val root = args.lift(1).map(Paths.get(_))
      .orElse(conf.lakeRoot)
      .getOrElse(Files.createTempDirectory("graft-lake"))
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .orElse(conf.cpus).getOrElse(4)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        conf.shufflePartitions.getOrElse(cpus).toString)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = LakeServer.start(new Lake(spark, root), port)
    println(s"lake root: $root")
    println(s"listening on http://localhost:${server.boundPort}")
    Thread.currentThread.join() // serve until killed
  }
}
