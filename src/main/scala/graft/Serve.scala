package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.api.LakeServer
import graft.engine.Lake

/** Standalone lake server: `runMain graft.Serve [port] [lakeDir]`.
  * Serves the reference's 10-endpoint HTTP API over a local lake.
  */
object Serve {
  def main(args: Array[String]): Unit = {
    // before any HttpServer can exist in this JVM (see LakeServer.noDelay)
    System.setProperty("sun.net.httpserver.nodelay", "true")
    val port = args.lift(0).map(_.toInt).getOrElse(8080)
    val root = args.lift(1).map(Paths.get(_))
      .getOrElse(Files.createTempDirectory("graft-lake"))
    val builder = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
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
