package graft.store

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.qast.{Compiler, Evaluator}

/** Metadata catalog — the engine's analog of the reference's PostgreSQL
  * metadata store (`/root/reference/src/comlake/core/db/PostgreSQL.java`),
  * holding the two relations of `resources/psql/table.sql`:
  *
  *   content (cid, type, extra)            — one row per stored blob
  *   dataset (id, file, description, source, topics, extra, parent)
  *
  * Storage is **append-only parquet** with last-writer-wins resolution at
  * read time — the lakehouse-native replacement for the reference's
  * `INSERT ... ON CONFLICT DO UPDATE` (`PostgreSQL.java:41-44`): every
  * mutation appends a full row stamped with a monotonic `seq`, and the
  * read view keeps `max_by(row, seq)` per key. That keeps writes
  * coordination-free (any number of concurrent ingests just append
  * files) and makes the mutable-metadata-on-immutable-storage problem
  * disappear; at warehouse scale the same layout swaps to Delta/Iceberg
  * MERGE without touching callers. Dataset rows are immutable *versions*
  * (`POST /update` inserts a child row pointing at its parent,
  * `PostgreSQL.java:128-154`), so they are append-only by nature already.
  *
  * Point lookups (`getType`, version parents) read the resolved view;
  * the view is tiny relative to content (metadata : data ratio), so
  * these are driver-cheap, and `search` stays a fully distributed
  * join+filter.
  */
final class Catalog(spark: SparkSession, root: Path,
    localIndexMaxRowsOverride: Long = -1L) {
  import spark.implicits._

  /** Driver-side materialization cap. The point-lookup indexes and the
    * `searchLocal` snapshot hold the RESOLVED metadata relations on the
    * driver — reference parity (its Postgres held them the same way)
    * and the measured hot-path win at metadata scale. At 100× metadata
    * that becomes a driver OOM, so above this row count the catalog
    * stops materializing: point lookups become pushed-down distributed
    * filters over the log and `searchLocal` falls back to the Catalyst
    * QAST backend (`searchWith`), which only collects MATCHES. Both
    * backends are semantics-equivalent (QastBackendsSpec), so callers
    * see identical results either side of the cap. Configurable via
    * `spark.graft.catalog.localIndexMaxRows` (or the constructor, for
    * tests).
    */
  private val localIndexMaxRows: Long =
    if (localIndexMaxRowsOverride >= 0L) localIndexMaxRowsOverride
    else spark.conf.getOption("spark.graft.catalog.localIndexMaxRows")
      .map(_.toLong).getOrElse(4L * 1000 * 1000)

  private val contentDir = root.resolve("content")
  private val datasetDir = root.resolve("dataset")
  Files.createDirectories(contentDir)
  Files.createDirectories(datasetDir)

  /** Monotonic sequence for ids and last-writer-wins ordering. Driver-side
    * like the reference's bigserial; survives restarts. The source of
    * truth on recovery is max(seq) over everything durable (WAL rows are
    * fsync'd per append; parquet is the compacted log) — the counter
    * file is only a fast hint, so it needs no fsync of its own and an
    * unparseable/partial file (crash mid-write) is tolerated. This
    * guarantees restarts never reissue a seq that reached any durable
    * row, so dataset ids stay unique and LWW `max_by(seq)` never ties.
    */
  private val counterFile = root.resolve("seq")
  private lazy val seqCounter =
    new java.util.concurrent.atomic.AtomicLong(recoverSeq())

  private def recoverSeq(): Long = {
    val fromFile =
      try {
        if (Files.exists(counterFile))
          new String(Files.readAllBytes(counterFile), "UTF-8").trim.toLong
        else 0L
      } catch { case _: Exception => 0L }
    val fromWal =
      (pending.valuesIterator.map(_.seq) ++
        pendingDatasets.valuesIterator.map(_.seq)).foldLeft(0L)(math.max)
    def parquetMax(dir: Path): Long =
      if (!hasData(dir)) 0L
      else spark.read.parquet(dir.toString)
        .agg(coalesce(max(col("seq")), lit(0L))).head.getLong(0)
    math.max(math.max(fromFile, fromWal),
      math.max(parquetMax(contentDir), parquetMax(datasetDir)))
  }

  private def nextSeq(): Long = {
    val v = seqCounter.incrementAndGet()
    counterFile.synchronized { // hint write: atomic rename, never partial
      val tmp = root.resolve("seq.tmp")
      Files.write(tmp, v.toString.getBytes("UTF-8"))
      Files.move(tmp, counterFile,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    v
  }

  import Catalog.{ContentRow, DatasetRow}

  // --- content write-ahead log ---------------------------------------
  //
  // Upload registration is the hot path (reference: 357 req/s of
  // Postgres INSERTs). A one-row Spark parquet append per upload costs
  // a full job (~70 ms) and a lookup over the re-resolved log costs
  // another — measured 13 req/s. Instead, content mutations append one
  // fsync'd JSON line to a WAL and update a driver-side index; the
  // distributed `content` view unions parquet with the pending WAL
  // rows, and `flush()` compacts the WAL into parquet with one Spark
  // job per batch. Durability per request comes from the synced file
  // append, exactly like the reference's per-request INSERT commit.

  private val walFile = root.resolve("content.wal")
  private val walMapper = new com.fasterxml.jackson.databind.ObjectMapper()
  /** Latest pending (not yet compacted) row per cid, insertion-ordered. */
  private val pending =
    scala.collection.mutable.LinkedHashMap.empty[String, ContentRow]
  /** Driver index of the resolved content relation (parquet ∪ WAL);
    * None until first lookup. ConcurrentHashMap because readers
    * (lookupContent on the request pool) race writers (appendContent
    * under the instance lock) — a plain mutable.HashMap can corrupt
    * during resize; the volatile only publishes the Option.
    */
  @volatile private var contentIndex
      : Option[java.util.concurrent.ConcurrentHashMap[String, ContentRow]] =
    None

  // recovery: reload pending rows from an existing WAL
  if (Files.exists(walFile)) {
    Files.readAllLines(walFile).forEach { line =>
      if (line.nonEmpty) {
        val r = walRowFromJson(line)
        pending.put(r.cid, r)
      }
    }
  }

  private def walRowToJson(r: ContentRow): String = {
    val node = walMapper.createObjectNode()
    node.put("cid", r.cid)
    if (r.`type` == null) node.putNull("type") else node.put("type", r.`type`)
    val extra = node.putObject("extra")
    r.extra.foreach { case (k, v) => extra.put(k, v) }
    node.put("seq", r.seq)
    walMapper.writeValueAsString(node)
  }

  private def walRowFromJson(line: String): ContentRow = {
    val n = walMapper.readTree(line)
    val extra = scala.collection.mutable.Map.empty[String, String]
    n.get("extra").properties().forEach(e => extra.put(e.getKey, e.getValue.asText))
    ContentRow(n.get("cid").asText,
      if (n.get("type").isNull) null else n.get("type").asText,
      extra.toMap, n.get("seq").asLong)
  }

  // dataset rows get the same WAL treatment (they are append-only —
  // no LWW resolution needed, just union + index)
  private val datasetWalFile = root.resolve("dataset.wal")
  private val pendingDatasets =
    scala.collection.mutable.LinkedHashMap.empty[Long, DatasetRow]
  @volatile private var datasetIndex
      : Option[java.util.concurrent.ConcurrentHashMap[Long, DatasetRow]] =
    None

  if (Files.exists(datasetWalFile)) {
    Files.readAllLines(datasetWalFile).forEach { line =>
      if (line.nonEmpty) {
        val r = datasetRowFromJson(line)
        pendingDatasets.put(r.id, r)
      }
    }
  }

  private def datasetRowToJson(r: DatasetRow): String = {
    val node = walMapper.createObjectNode()
    node.put("id", r.id)
    node.put("file", r.file)
    node.put("description", r.description)
    node.put("source", r.source)
    val t = node.putArray("topics")
    r.topics.foreach(t.add)
    val extra = node.putObject("extra")
    r.extra.foreach { case (k, v) => extra.put(k, v) }
    r.parent match {
      case Some(p) => node.put("parent", p)
      case None => node.putNull("parent")
    }
    node.put("seq", r.seq)
    walMapper.writeValueAsString(node)
  }

  private def datasetRowFromJson(line: String): DatasetRow = {
    val n = walMapper.readTree(line)
    val topics = scala.collection.mutable.ArrayBuffer.empty[String]
    n.get("topics").forEach(t => topics += t.asText)
    val extra = scala.collection.mutable.Map.empty[String, String]
    n.get("extra").properties().forEach(e => extra.put(e.getKey, e.getValue.asText))
    DatasetRow(n.get("id").asLong, n.get("file").asText,
      n.get("description").asText, n.get("source").asText, topics.toSeq,
      extra.toMap,
      if (n.get("parent").isNull) None else Some(n.get("parent").asLong),
      n.get("seq").asLong)
  }

  private def appendDataset(row: DatasetRow): Unit = synchronized {
    Files.writeString(datasetWalFile, datasetRowToJson(row) + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND,
      java.nio.file.StandardOpenOption.SYNC)
    pendingDatasets.put(row.id, row)
    datasetIndex.foreach { m =>
      m.put(row.id, row)
      // the cap must hold across the process LIFETIME, not just the
      // first build: a long-running server that ingests past it drops
      // the driver map and falls through to the distributed paths
      if (m.size > localIndexMaxRows) {
        datasetIndexDisabled = true
        datasetIndex = None
      }
    }
    datasetCache.foreach(_.unpersist())
    datasetCache = None
    snapshotCache = None
    if (pendingDatasets.size >= 1024) flush()
  }

  private def lookupDataset(id: Long): Option[DatasetRow] =
    dsIndex match {
      case Some(m) => Option(m.get(id))
      case None => // above the cap: pending rows first (no job for the
        // WAL hot path), then a pushed-down point filter over the log
        synchronized(pendingDatasets.get(id)).orElse {
          implicit val enc = org.apache.spark.sql.Encoders.product[DatasetRow]
          dataset.filter(col("id") === id).as[DatasetRow]
            .collect().headOption
        }
    }

  /** Parquet row counts are footer-metadata reads — no data scan. */
  private def logRows(dir: Path): Long =
    if (!hasData(dir)) 0L else spark.read.parquet(dir.toString).count()

  /** Once the log crosses the cap it never shrinks (append-only), so
    * the disabled decision is memoized — over-cap lookups pay one
    * filter job, not an extra count.
    */
  @volatile private var datasetIndexDisabled = false
  @volatile private var contentIndexDisabled = false

  private def dsIndex
      : Option[java.util.concurrent.ConcurrentHashMap[Long, DatasetRow]] =
    if (datasetIndexDisabled) None
    else datasetIndex.orElse(synchronized {
      datasetIndex.orElse {
        if (logRows(datasetDir) > localIndexMaxRows) {
          datasetIndexDisabled = true
          None
        } else {
          implicit val enc = org.apache.spark.sql.Encoders.product[DatasetRow]
          val m = new java.util.concurrent.ConcurrentHashMap[Long, DatasetRow]
          if (hasData(datasetDir)) {
            spark.read.parquet(datasetDir.toString)
              .as[DatasetRow].collect().foreach(r => m.put(r.id, r))
          }
          pendingDatasets.valuesIterator.foreach(r => m.put(r.id, r))
          datasetIndex = Some(m)
          datasetIndex
        }
      }
    })

  private def hasData(dir: Path): Boolean =
    Files.exists(dir.resolve("_SUCCESS")) || {
      val s = Files.list(dir)
      try s.anyMatch(p => p.toString.endsWith(".parquet"))
      finally s.close()
    }

  /** Resolved views are cached in memory (metadata is small relative
    * to content by design — the analog of the reference keeping them
    * in pooled PostgreSQL, its single biggest measured win,
    * `eval.tex:85-107`) and invalidated on every append, so repeated
    * `find`/lookup calls don't re-resolve the log.
    */
  @volatile private var contentCache: Option[DataFrame] = None
  @volatile private var datasetCache: Option[DataFrame] = None

  @volatile private var snapshotCache: Option[Seq[Evaluator.Row]] = None

  private def invalidate(): Unit = synchronized {
    contentCache.foreach(_.unpersist())
    datasetCache.foreach(_.unpersist())
    contentCache = None
    datasetCache = None
    snapshotCache = None
  }

  /** Resolved `content` relation: latest full row per cid, over
    * parquet ∪ pending WAL rows.
    */
  def content: DataFrame = contentCache.getOrElse(synchronized {
    contentCache.getOrElse {
      val parquetLog =
        if (!hasData(contentDir)) spark.emptyDataset[ContentRow].toDF()
        else spark.read.parquet(contentDir.toString)
      val walLog = pending.values.toSeq.toDS().toDF()
      val df = parquetLog.unionByName(walLog)
        .groupBy("cid")
        .agg(max_by(struct(col("type"), col("extra"), col("seq")),
          col("seq")).as("r"))
        .select(col("cid"), col("r.type").as("type"),
          col("r.extra").as("extra"), col("r.seq").as("seq"))
        .cache()
      contentCache = Some(df)
      df
    }
  })

  /** Compact pending WAL rows into the parquet log (one Spark job per
    * batch instead of one per mutation). Logical content is unchanged.
    */
  def flush(): Unit = synchronized {
    if (pending.nonEmpty) {
      pending.values.toSeq.toDS().write.mode("append")
        .parquet(contentDir.toString)
      pending.clear()
      Files.deleteIfExists(walFile)
      contentCache.foreach(_.unpersist())
      contentCache = None // rebuild from parquet on next read
    }
    if (pendingDatasets.nonEmpty) {
      pendingDatasets.values.toSeq.toDS().write.mode("append")
        .parquet(datasetDir.toString)
      pendingDatasets.clear()
      Files.deleteIfExists(datasetWalFile)
      datasetCache.foreach(_.unpersist())
      datasetCache = None
    }
  }

  /** Resolved `dataset` relation (rows are immutable versions already):
    * parquet ∪ pending WAL rows.
    */
  def dataset: DataFrame = datasetCache.getOrElse(synchronized {
    datasetCache.getOrElse {
      val parquetLog =
        if (!hasData(datasetDir)) spark.emptyDataset[DatasetRow].toDF()
        else spark.read.parquet(datasetDir.toString)
      val df = parquetLog
        .unionByName(pendingDatasets.values.toSeq.toDS().toDF())
        .cache()
      datasetCache = Some(df)
      df
    }
  })

  private def appendContent(row: ContentRow): Unit = synchronized {
    // durable per-request: synced append of one JSON line
    Files.writeString(walFile, walRowToJson(row) + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND,
      java.nio.file.StandardOpenOption.SYNC)
    pending.put(row.cid, row)
    contentIndex.foreach { m =>
      m.put(row.cid, row)
      // lifetime cap, same as the dataset index (see appendDataset)
      if (m.size > localIndexMaxRows) {
        contentIndexDisabled = true
        contentIndex = None
      }
    }
    contentCache.foreach(_.unpersist())
    contentCache = None
    snapshotCache = None
    if (pending.size >= 1024) flush()
  }

  /** Resolved driver index (lazy; updated incrementally on writes;
    * None above the cap — see `localIndexMaxRows`).
    */
  private def index
      : Option[java.util.concurrent.ConcurrentHashMap[String, ContentRow]] =
    if (contentIndexDisabled) None
    else contentIndex.orElse(synchronized {
      contentIndex.orElse {
        if (logRows(contentDir) > localIndexMaxRows) {
          contentIndexDisabled = true
          None
        } else {
          implicit val enc = org.apache.spark.sql.Encoders.product[ContentRow]
          val m = new java.util.concurrent.ConcurrentHashMap[String, ContentRow]
          if (hasData(contentDir)) {
            spark.read.parquet(contentDir.toString)
              .groupBy("cid")
              .agg(max_by(struct(col("type"), col("extra"), col("seq")),
                col("seq")).as("r"))
              .select(col("cid"), col("r.type").as("type"),
                col("r.extra").as("extra"), col("r.seq").as("seq"))
              .as[ContentRow].collect().foreach(r => m.put(r.cid, r))
          }
          pending.valuesIterator.foreach(r => m.put(r.cid, r))
          contentIndex = Some(m)
          contentIndex
        }
      }
    })

  /** Upsert-by-cid (reference I3, `PostgreSQL.java:84-94`): sets `type`,
    * preserves any existing extra (e.g. an inferred schema).
    */
  def insertFile(cid: String, mime: String): Unit = {
    val existing = lookupContent(cid)
    appendContent(ContentRow(cid, mime,
      existing.map(_.extra).getOrElse(Map.empty), nextSeq()))
  }

  /** Persist an inferred schema under `extra.schema` (reference A3,
    * `PostgreSQL.java:205-212`).
    */
  def setSchema(cid: String, schemaJson: String): Unit = lookupContent(cid) match {
    case Some(row) =>
      appendContent(row.copy(extra = row.extra + ("schema" -> schemaJson),
        seq = nextSeq()))
    case None =>
      appendContent(ContentRow(cid, null, Map("schema" -> schemaJson),
        nextSeq()))
  }

  /** `SELECT type FROM content WHERE cid=?` (reference L1). */
  def getType(cid: String): Option[String] =
    lookupContent(cid).flatMap(r => Option(r.`type`))

  def getSchema(cid: String): Option[String] =
    lookupContent(cid).flatMap(_.extra.get("schema"))

  private def lookupContent(cid: String): Option[ContentRow] =
    index match {
      case Some(m) => Option(m.get(cid)) // pure map access on uploads
      case None => // above the cap: WAL rows first, then a pushed-down
        // point filter over the LWW-resolved view
        synchronized(pending.get(cid)).orElse {
          implicit val enc = org.apache.spark.sql.Encoders.product[ContentRow]
          content.filter(col("cid") === cid).as[ContentRow]
            .collect().headOption
        }
    }

  /** Required dataset fields (`HttpHandler.java:138-142`); anything else
    * in `meta` is open-map `extra`.
    */
  def insertDataset(meta: DatasetMeta): Long = {
    val id = nextSeq()
    appendDataset(DatasetRow(id, meta.file, meta.description, meta.source,
      meta.topics, meta.extra, meta.parent, id))
    id
  }

  /** Version lineage: the chain from `id` back to its root revision
    * (reference data model: `dataset.parent` forms a version tree,
    * `PostgreSQL.java:48-50,128-154`; the reference stores the tree but
    * never walks it). Metadata-scale driver walk over the index — the
    * distributed form would be an iterative self-join, unnecessary for
    * a relation this size by design.
    */
  def lineage(id: Long): Seq[DatasetRow] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[DatasetRow]
    var cur = lookupDataset(id)
    val seen = scala.collection.mutable.Set.empty[Long] // cycle guard
    while (cur.isDefined && seen.add(cur.get.id)) {
      out += cur.get
      cur = cur.get.parent.flatMap(lookupDataset)
    }
    out.toSeq
  }

  /** Update-as-insert versioning (reference I2, `PostgreSQL.java:128-154`):
    * a new row inherits every field the override map omits and points back
    * at its parent, forming the version tree. Returns None if the parent
    * doesn't exist (reference: 400 "failed query").
    */
  def updateDataset(parentId: Long, overrides: DatasetMeta.Partial): Option[Long] = {
    lookupDataset(parentId).map { p =>
        insertDataset(DatasetMeta(
          file = overrides.file.getOrElse(p.file),
          description = overrides.description.getOrElse(p.description),
          source = overrides.source.getOrElse(p.source),
          topics = overrides.topics.getOrElse(p.topics),
          extra = p.extra ++ overrides.extra,
          parent = Some(parentId)))
      }
  }

  /** Metadata search (reference S5/S6, `PostgreSQL.java:51-54`):
    * `dataset ⋈ content ON file = cid`, QAST predicate over the joined
    * open row, fixed projection plus right-biased merge
    * `dataset.extra || content.extra` (jsonb `||` semantics). Join
    * strategy is left to Catalyst: at metadata scale both sides
    * auto-broadcast; past that a hint would force the OOM the
    * `localIndexMaxRows` cap exists to prevent. The predicate lands
    * in both scans.
    */
  def search(qastJson: String): Either[graft.qast.Ast.QastError, DataFrame] =
    graft.qast.Ast.parse(qastJson).flatMap {
      // beyond-reference frame verbs (group/having/top): the verb's own
      // predicate filters the PROJECTED search row (where `extra` is
      // the merged map), so rollups see exactly the row shape `/find`
      // returns
      case ast if Compiler.isFrameVerb(ast) =>
        Compiler.compileFrame(ast)
          .flatMap(_.checked(
            searchWith(org.apache.spark.sql.functions.lit(true))))
      case ast => Compiler.compile(ast).map(searchWith)
    }

  /** Driver-local metadata search — the closure backend of the QAST
    * "query polymorphism" (reference `qast->fn`): the joined+projected
    * search relation is snapshotted once on the driver (metadata is
    * small by design) and predicates evaluate as closures per row —
    * microseconds per query instead of a Spark job. Snapshot is
    * invalidated by every catalog write. Row shape equals `search`'s
    * output row (id, file, description, source, topics, type, parent,
    * extra), so both backends see the same fields; equivalence is
    * cross-checked in QastBackendsSpec.
    */
  def searchLocal(qastJson: String)
      : Either[graft.qast.Ast.QastError, Seq[Evaluator.Row]] =
    graft.qast.Ast.parse(qastJson).flatMap {
      case ast if Compiler.isFrameVerb(ast) => snapshot match {
        case Some(rows) => Evaluator.frame(rows, qastJson)
        case None =>
          // distributed frame verb, tiny result collected — a rollup
          // output is |groups| rows and a top-k is k rows, never the
          // relation
          Compiler.compileFrame(ast).flatMap(
            _.checked(searchWith(org.apache.spark.sql.functions.lit(true)))
              .map(_.collect().toSeq.map(genericRowToMap)))
      }
      case _ => snapshot match {
        case Some(rows) =>
          Evaluator.fromJson(qastJson)
            .map(pred => rows.filter(pred(_) == true))
        case None =>
          // Above the cap the full relation must not live on the
          // driver: run the SAME predicate through the Catalyst
          // backend (the two backends are equivalence-tested in
          // QastBackendsSpec) so the filter executes distributed and
          // only MATCHES are collected.
          Compiler.fromJson(qastJson).map(pred =>
            searchWith(pred).collect().toSeq.map(searchRowToMap))
      }
    }

  /** Schema-generic Row → Map (rollup outputs vary by query, unlike
    * the fixed search row shape). */
  private def genericRowToMap(r: org.apache.spark.sql.Row): Evaluator.Row =
    r.schema.fieldNames.zipWithIndex.map { case (n, i) =>
      n -> (r.get(i) match {
        case s: scala.collection.Seq[_] => s.toList
        case m: scala.collection.Map[_, _] => m.toMap
        case v => v
      })
    }.toMap

  private def searchRowToMap(r: org.apache.spark.sql.Row): Evaluator.Row =
    Map[String, Any](
      "id" -> r.getAs[Long]("id"),
      "file" -> r.getAs[String]("file"),
      "description" -> r.getAs[String]("description"),
      "source" -> r.getAs[String]("source"),
      "topics" -> r.getAs[Seq[String]]("topics").toList,
      "type" -> r.getAs[String]("type"),
      "parent" -> (if (r.isNullAt(r.fieldIndex("parent"))) null
                   else r.getAs[Long]("parent")),
      "extra" -> r.getAs[Map[String, String]]("extra"))

  @volatile private var snapshotDisabled = false

  private def snapshot: Option[Seq[Evaluator.Row]] =
    if (snapshotDisabled) None
    else snapshotCache.orElse(synchronized {
      snapshotCache.orElse {
        // dataset rows bound the joined search relation's size (the
        // join is on file=cid, one content row per key)
        if (logRows(datasetDir) + pendingDatasets.size > localIndexMaxRows) {
          snapshotDisabled = true
          None
        } else {
          val rows =
            searchWith(lit(true)).collect().toSeq.map(searchRowToMap)
          snapshotCache = Some(rows)
          snapshotCache
        }
      }
    })

  def searchWith(pred: Column): DataFrame = {
    val d = dataset
    val c = content.select(col("cid"), col("type"),
      col("extra").as("content_extra"))
    val mergedExtra = map_concat(
      map_filter(coalesce(col("extra"), map()),
        (k, _) => !map_contains_key(coalesce(col("content_extra"), map()), k)),
      coalesce(col("content_extra"), map()))
    // no broadcast hint: at metadata scale both sides fall under the
    // auto-broadcast threshold (same plan as before); above the
    // localIndexMaxRows cap a forced broadcast of either side would be
    // the driver OOM this cap exists to prevent — Catalyst/AQE pick
    // from actual sizes instead
    d.join(c, col("file") === col("cid"))
      .withColumn("merged_extra", mergedExtra)
      .filter(pred)
      .select(col("id"), col("file"), col("description"), col("source"),
        col("topics"), col("type"), col("parent"),
        col("merged_extra").as("extra"))
  }
}

object Catalog {
  /** Append-log row shapes (top-level so Spark can derive encoders). */
  case class ContentRow(cid: String, `type`: String,
      extra: Map[String, String], seq: Long)
  case class DatasetRow(id: Long, file: String, description: String,
      source: String, topics: Seq[String], extra: Map[String, String],
      parent: Option[Long], seq: Long)
}

/** The reference's required dataset fields + open extras
  * (`HttpHandler.java:138-144`).
  */
case class DatasetMeta(file: String, description: String, source: String,
    topics: Seq[String], extra: Map[String, String] = Map.empty,
    parent: Option[Long] = None)

object DatasetMeta {
  /** Field overrides for update-as-version; None = inherit from parent. */
  case class Partial(file: Option[String] = None,
      description: Option[String] = None, source: Option[String] = None,
      topics: Option[Seq[String]] = None,
      extra: Map[String, String] = Map.empty)
}
