package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.engine.Lake
import graft.store.DatasetMeta

/** Usage example + runtime smoke for the lake core: ingest → register →
  * search → extract → schema, printing each result. Run with
  * `sbt 'runMain graft.Demo'` (uses a temp lake; add a path argument to
  * keep the lake on disk).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = args.headOption.map(java.nio.file.Paths.get(_))
      .getOrElse(Files.createTempDirectory("graft-demo"))
    val lake = new Lake(spark, root)

    val csv =
      """country_name,country_code,year,population
        |Vietnam,VNM,2019,96462106
        |Germany,DEU,2019,83092962
        |Chad,TCD,2019,15946876
        |""".stripMargin.getBytes("UTF-8")

    val cid = lake.addFile(csv, "text/csv")
    println(s"ingested: $cid")

    val id = lake.addDataset(DatasetMeta(cid, "World population 2019",
      "worldbank", Seq("population", "demography")))
    val id2 = lake.updateDataset(id,
      DatasetMeta.Partial(description = Some("World population (rev 2)"))).get
    println(s"dataset versions: $id -> $id2")

    println("find [\"&&\", topics, [population]]:")
    lake.find("""["&&", [".", ["$"], "topics"], ["population"]]""")
      .fold(e => println(s"  error: ${e.message}"), _.show(truncate = false))

    println("extract country_name ~ Vi.tnam:")
    lake.extract(cid, """["~", [".", ["$"], "country_name"], "Vi.tnam"]""")
      .fold(e => println(s"  error: ${e.message}"), _.show(truncate = false))

    println("schema:")
    println(lake.schema(cid).fold(_.message, identity))

    println("malformed query -> " +
      lake.extract(cid, """["%", 1]""").left.map(_.message))

    println("multimodal: decode+resize+features over sf0.001 media")
    val frames = graft.operators.Multimodal.decodeFrames(
      spark, "/root/testdata/sf0.001", stride = 2)
    graft.operators.Multimodal
      .features(graft.operators.Multimodal.resize(frames, 4, 4))
      .orderBy("media_id").show(5)

    spark.stop()
  }
}
