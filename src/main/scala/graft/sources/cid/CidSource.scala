package graft.sources.cid

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.store.ContentStore

/** Spark DataSource V2 connector for CID-addressed content — the
  * north-star "Spark connector for IPFS-style storage": the content
  * store becomes an ordinary Spark table.
  *
  *   spark.read.format("cid").option("store", root).load()
  *     -> (cid STRING, length LONG, content BINARY)
  *   df.write.format("cid").option("store", root).mode("append").save()
  *     -> each row's `content` bytes ingested, addressed by sha256 CID
  *
  * Scale design, Catalyst-integrated rather than bolted on:
  *   - **partition planning**: the CID list splits into bounded groups,
  *     one `InputPartition` each — on a cluster every executor streams
  *     only its blobs from the store (local gateway in a real IPFS
  *     deployment);
  *   - **column pruning** (`SupportsPushDownRequiredColumns`): a query
  *     that never touches `content` (catalog audits, size accounting)
  *     reads zero content bytes — the reader materializes only the
  *     requested fields;
  *   - **filter pushdown** (`SupportsPushDownFilters`): `cid = x` /
  *     `cid IN (...)` predicates shrink the partition plan itself —
  *     point lookups read one blob, not the store;
  *   - **write-side**: each task ingests independently (the CAS
  *     temp+atomic-move protocol makes concurrent executor writes
  *     coordination-free and idempotent); commit is metadata-only.
  *
  * Reference analog: `fs/FileSystem.java:25-46` (add/fetch by CID),
  * re-expressed as a Spark table instead of an HTTP byte API.
  */
final class CidSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "cid"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CidTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new CidTable(Option(properties.get("store")).getOrElse(
      throw new IllegalArgumentException(
        "cid source requires option 'store' (content-store root)")),
      schema)

  /** Writes present the DataFrame's own schema (only a `content`
    * column is required); reads take the fixed shape from inferSchema.
    */
  override def supportsExternalMetadata(): Boolean = true
}

object CidTable {
  /** Fixed table shape: address, size, payload. */
  val Schema: StructType = new StructType()
    .add("cid", StringType, nullable = false)
    .add("length", LongType, nullable = false)
    .add("content", BinaryType, nullable = true)
}

final class CidTable(root: String, declaredSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"cid:$root"
  override def schema(): StructType = declaredSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CidScanBuilder(root, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new CidWriteBuilder(root, info)
}

final class CidScanBuilder(root: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = CidTable.Schema
  private var cidRestriction: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case EqualTo("cid", _: String) => true
      case In("cid", _) => true
      case _ => false
    }
    supported.foreach {
      case EqualTo("cid", v: String) => restrict(Set(v))
      case In("cid", vs) => restrict(vs.collect { case s: String => s }.toSet)
      case _ =>
    }
    pushed = supported
    residual // everything else evaluates above the scan
  }

  private def restrict(s: Set[String]): Unit =
    cidRestriction = Some(cidRestriction.fold(s)(_ intersect s))

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val explicit = Option(options.get("cids"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    // the table IS the store: an explicitly-requested cid that holds
    // no blob yields no row (same semantics as a `cid = x` filter on
    // an absent key), rather than a mid-scan task failure
    val blobs = Paths.get(root, "blobs")
    val all = explicit match {
      case Some(cs) => cs.filter(c => Files.exists(blobs.resolve(c)))
      case None =>
        if (!Files.isDirectory(blobs)) Seq.empty
        else {
          val s = Files.list(blobs)
          try s.iterator().asScala.map(_.getFileName.toString)
            .toVector.sorted
          finally s.close()
        }
    }
    val cids = cidRestriction.fold(all)(keep => all.filter(keep))
    val maxParts = Option(options.get("maxPartitions")).map(_.toInt)
      .getOrElse(32)
    // streaming ignores the batch listing but keeps the restriction:
    // explicit cids option ∩ pushed cid filters
    val restriction = (explicit.map(_.toSet), cidRestriction) match {
      case (Some(a), Some(b)) => Some(a intersect b)
      case (a, b) => a.orElse(b)
    }
    new CidScan(root, cids, required, maxParts, restriction)
  }
}

final case class CidInputPartition(cids: Array[String]) extends InputPartition

final class CidScan(root: String, cids: Seq[String], required: StructType,
    maxPartitions: Int, restriction: Option[Set[String]]) extends Scan
    with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"CidScan(store=$root, cids=${cids.length}, " +
      s"cols=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    if (cids.isEmpty) return Array.empty
    val nParts = math.min(maxPartitions, cids.length)
    cids.grouped(math.ceil(cids.length.toDouble / nParts).toInt)
      .map(g => CidInputPartition(g.toArray): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CidReaderFactory(root, required.fieldNames)

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new CidMicroBatchStream(root, required.fieldNames, maxPartitions,
      restriction)
}

/** Streaming side of the connector: tails the store's ingest commit
  * log. The offset is the NAME of the last consumed manifest (empty =
  * nothing consumed): each micro-batch reads the cids of manifests in
  * the lexicographic window (start, end]. A name frontier — unlike a
  * count — never re-points already-consumed positions if a slow
  * writer's manifest lands sorting into the past, so consumed batches
  * are immutable (such a late manifest is skipped; ordering across
  * writer clocks is the same visibility assumption Spark's own file
  * source makes). Manifests are immutable, appended atomically after
  * their blobs, and consumed in name order — exactly-once relative to
  * the log.
  */
final case class CidOffset(frontier: String) extends Offset {
  override def json(): String = frontier
}

final class CidMicroBatchStream(root: String, fields: Array[String],
    maxPartitions: Int, restriction: Option[Set[String]])
    extends MicroBatchStream {
  private val store = new ContentStore(Paths.get(root))

  private def names: Seq[String] =
    store.ingestLog.map(_.getFileName.toString)

  override def initialOffset(): Offset = CidOffset("")
  override def latestOffset(): Offset =
    CidOffset(names.lastOption.getOrElse(""))
  override def deserializeOffset(json: String): Offset = CidOffset(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[CidOffset].frontier,
      end.asInstanceOf[CidOffset].frontier)
    val window = store.ingestLog.filter { p =>
      val n = p.getFileName.toString
      n > s && n <= e
    }
    val cids = window
      .flatMap(p => Files.readAllLines(p).asScala.filter(_.nonEmpty))
      .distinct
      .filter(c => restriction.forall(_.contains(c)))
    if (cids.isEmpty) return Array.empty
    val nParts = math.max(1, math.min(maxPartitions, cids.length))
    cids.grouped(math.ceil(cids.length.toDouble / nParts).toInt)
      .map(g => CidInputPartition(g.toArray): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CidReaderFactory(root, fields)
}

final class CidReaderFactory(root: String, fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new CidPartitionReader(root,
      partition.asInstanceOf[CidInputPartition].cids, fields)
}

/** Reads one partition's blobs; touches content bytes ONLY when the
  * `content` column survived pruning.
  */
final class CidPartitionReader(root: String, cids: Array[String],
    fields: Array[String]) extends PartitionReader[InternalRow] {
  private val blobs = Paths.get(root, "blobs")
  private var i = -1

  override def next(): Boolean = { i += 1; i < cids.length }

  override def get(): InternalRow = {
    val cid = cids(i)
    val p = blobs.resolve(cid)
    InternalRow.fromSeq(fields.toSeq.map {
      case "cid" => UTF8String.fromString(cid)
      case "length" => Files.size(p)
      case "content" => Files.readAllBytes(p)
      case other => throw new IllegalArgumentException(s"no column $other")
    })
  }

  override def close(): Unit = ()
}

// --- write path ------------------------------------------------------

final class CidWriteBuilder(root: String, info: LogicalWriteInfo)
    extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val idx = info.schema().fieldNames.indexOf("content")
      require(idx >= 0, "cid sink requires a 'content' binary column")
      new CidBatchWrite(root, idx)
    }
  }
}

final case class CidCommitMessage(cids: Seq[String])
    extends WriterCommitMessage

final class CidBatchWrite(root: String, contentIdx: Int) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = new CidWriterFactory(root, contentIdx)

  /** CAS writes are complete once each task lands its blobs; commit
    * appends ONE manifest to the store's ingest log — metadata-only,
    * like a lakehouse commit, and the very record the streaming scan
    * tails (a batch write becomes one streaming micro-batch).
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val all = messages.collect { case CidCommitMessage(cs) => cs }
      .flatten.sorted
    new ContentStore(Paths.get(root)).logIngest(all)
  }

  /** Orphaned CAS blobs from failed tasks are harmless (idempotent,
    * content-addressed) — abort is a no-op by design.
    */
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class CidWriterFactory(root: String, contentIdx: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private lazy val store = new ContentStore(Paths.get(root))
    private val written = scala.collection.mutable.ArrayBuffer.empty[String]

    override def write(row: InternalRow): Unit =
      if (!row.isNullAt(contentIdx))
        written += store.add(row.getBinary(contentIdx))

    override def commit(): WriterCommitMessage =
      CidCommitMessage(written.toSeq)

    override def abort(): Unit = ()
    override def close(): Unit = ()
  }
}
