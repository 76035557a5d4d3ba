package graft.sources

import java.nio.ByteBuffer
import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualNullSafe, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * DataSource V2 reader for the reference's on-disk store — the single
 * MessagePack `.bin` blob `MerkonDatabase.Load/Save` round-trips
 * (MerkonDatabase.cs:128-162). `spark.read.format("merkon-legacy")
 * .load(path)` yields one row per `DatabaseEntry` in the RAW reference
 * shape (all-string fields, MerkonDatabase.cs:243-254) plus the owning
 * collection name; [[graft.store.MerkonStore.importLegacy]] layers the
 * typed decode (metadata JSON, embedding JSON, "u" timestamps) on top in
 * codegen'd Catalyst, so this source only speaks msgpack.
 *
 * Scale shape: the format is ONE self-contained blob per database — by
 * the reference's own in-memory design it is not splittable, so each
 * file becomes exactly one input partition and parallelism comes from
 * the number of files (a glob over many exported stores fans out one
 * task each). Two pushdowns keep the single-file cost honest:
 *
 *  - `SupportsPushDownRequiredColumns` — unprojected fields are JUMPED
 *    by their msgpack length header, never UTF-8-decoded. Embedding
 *    JSON dominates the bytes, so `select(collection, key)` touches a
 *    small fraction of the file.
 *  - `SupportsPushDownFilters` — `collection = 'x'` / `collection IN`
 *    skips entire non-matching collections the same way (the map layout
 *    makes that a single length-walk per rejected collection).
 */
class MerkonLegacySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "merkon-legacy"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MerkonLegacySource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MerkonLegacyTable(properties.get("path"))
}

object MerkonLegacySource {
  /** `DatabaseEntry` verbatim (MerkonDatabase.cs:243-254) + owner. */
  val schema: StructType = StructType(Seq(
    StructField("collection", StringType),
    StructField("key", StringType),
    StructField("metadata_string", StringType),
    StructField("embedding_string", StringType),
    StructField("timestamp_u", StringType)))
}

private[sources] class MerkonLegacyTable(pathSpec: String)
    extends Table with SupportsRead {
  require(pathSpec != null && pathSpec.nonEmpty,
    "merkon-legacy needs a path: spark.read.format(\"merkon-legacy\").load(path)")

  override def name(): String = s"merkon-legacy($pathSpec)"
  override def schema(): StructType = MerkonLegacySource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MerkonLegacyScanBuilder(pathSpec)
}

private[sources] class MerkonLegacyScanBuilder(pathSpec: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = MerkonLegacySource.schema
  private var pushed: Array[Filter] = Array.empty
  private var collections: Option[Set[String]] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept collection-equality shapes; everything is also returned as a
    * post-scan filter (re-checking an equality on the emitted rows is
    * free and keeps the plan correct if a pushed set ever widens). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val accepted = ArrayBuffer.empty[Filter]
    filters.foreach {
      case f @ EqualTo("collection", v: String) =>
        collections = Some(intersect(Set(v))); accepted += f
      case f @ EqualNullSafe("collection", v: String) =>
        collections = Some(intersect(Set(v))); accepted += f
      case f @ In("collection", vs) if vs.forall(_.isInstanceOf[String]) =>
        collections = Some(intersect(vs.map(_.asInstanceOf[String]).toSet)); accepted += f
      case _ => ()
    }
    pushed = accepted.toArray
    filters
  }
  private def intersect(s: Set[String]): Set[String] =
    collections.fold(s)(_.intersect(s))

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new MerkonLegacyScan(pathSpec, required, collections, pushed)
}

private[sources] class MerkonLegacyScan(pathSpec: String, required: StructType,
    collections: Option[Set[String]], pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"merkon-legacy $pathSpec, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val path = new Path(pathSpec)
    val fs = path.getFileSystem(conf)
    val files = fs.globStatus(path) match {
      case null => Array.empty
      case stats => stats.flatMap { s =>
        if (s.isDirectory) fs.listStatus(s.getPath).filter(_.isFile) else Array(s)
      }
    }
    if (files.isEmpty) throw new IllegalArgumentException(
      s"merkon-legacy: no files match $pathSpec")
    // Executors rebuild the Hadoop conf from this explicit copy (the
    // Configuration object itself is not serializable).
    val confMap = {
      val m = scala.collection.mutable.Map.empty[String, String]
      val it = conf.iterator(); while (it.hasNext) { val e = it.next(); m(e.getKey) = e.getValue }
      m.toMap
    }
    files.map(s => MerkonLegacyPartition(s.getPath.toString, s.getLen, confMap))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MerkonLegacyReaderFactory(required.fieldNames, collections)
}

private[sources] case class MerkonLegacyPartition(path: String, length: Long,
    conf: Map[String, String]) extends InputPartition

private[sources] class MerkonLegacyReaderFactory(fields: Array[String],
    collections: Option[Set[String]]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MerkonLegacyPartition]
    new MerkonLegacyReader(p, fields, collections)
  }
}

/** Streams entries out of one legacy blob: outer 1-element array
  * (the `[Key(0)]` wrapper), then the collection map, then per-entry
  * 4-element arrays. Unrequested fields and rejected collections are
  * length-jumped, not decoded. */
private[sources] class MerkonLegacyReader(part: MerkonLegacyPartition,
    fields: Array[String], collections: Option[Set[String]])
    extends PartitionReader[InternalRow] {

  import MsgPack._

  require(part.length <= Int.MaxValue, s"legacy store ${part.path} exceeds " +
    "2 GiB — not a plausible single-blob Merkon database")

  private val buf: ByteBuffer = {
    val conf = new Configuration(false)
    part.conf.foreach { case (k, v) => conf.set(k, v) }
    val path = new Path(part.path)
    val in = path.getFileSystem(conf).open(path)
    try {
      val bytes = new Array[Byte](part.length.toInt)
      in.readFully(0, bytes)
      ByteBuffer.wrap(bytes)
    } finally in.close()
  }

  // schema-order extractors: entry field index (1..4) per output column,
  // 0 = the collection name
  private val outIdx: Array[Int] = fields.map {
    case "collection" => 0
    case "key" => 1
    case "metadata_string" => 2
    case "embedding_string" => 3
    case "timestamp_u" => 4
  }
  private val needField: Array[Boolean] =
    Array.tabulate(5)(i => outIdx.contains(i))

  private var collectionsLeft: Int = {
    val outer = readArrayHeader(buf)
    require(outer >= 1, s"${part.path}: empty VectorDatabase wrapper")
    readMapHeader(buf)
  }
  private var currentName: UTF8String = _
  private var entriesLeft = 0
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (entriesLeft == 0) {
      if (collectionsLeft == 0) return false
      collectionsLeft -= 1
      val name = readString(buf)
      if (collections.forall(_.contains(name))) {
        currentName = UTF8String.fromString(name)
        entriesLeft = readArrayHeader(buf)
      } else skipValue(buf)
    }
    entriesLeft -= 1
    val n = readArrayHeader(buf)
    val vals = new Array[UTF8String](5)
    vals(0) = currentName
    var i = 1
    while (i <= 4) {
      if (i <= n) {
        if (needField(i)) {
          val s = readStringOrNil(buf)
          vals(i) = if (s == null) null else UTF8String.fromString(s)
        } else skipValue(buf)
      }
      i += 1
    }
    var extra = n - 4
    while (extra > 0) { skipValue(buf); extra -= 1 }
    val out = new GenericInternalRow(outIdx.length)
    i = 0
    while (i < outIdx.length) { out.update(i, vals(outIdx(i))); i += 1 }
    row = out
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
