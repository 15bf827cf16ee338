package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.GraftTable

/** DataSource-V2 `TableCatalog` over the graft registry (SURVEY.md
  * §2.A49): DSv2-native tooling — multi-part identifiers
  * (`graft_cat.db.t`), `CREATE/DROP TABLE`, `SHOW TABLES IN
  * graft_cat.db` — sees graft tables without the session-catalog
  * bridge. Reads and writes still execute through the manifest-planned
  * V1 path: [[GraftRelationRule]] rewrites the analyzer's
  * `DataSourceV2Relation`/`AppendData` nodes over a [[GraftV2Table]]
  * into the same snapshot scan / snapshot-creating insert every other
  * surface uses, so there is exactly ONE read and ONE write
  * implementation (the reference is V1-bound; this is forward-parity).
  *
  * Register with
  * `spark.conf.set("spark.sql.catalog.graft_cat", "graft.sql.GraftV2Catalog")`
  * (plus optional `spark.sql.catalog.graft_cat.warehouse` for
  * LOCATION-less CREATE TABLE).
  */
class GraftV2Catalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var warehouse: Option[String] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Option(options.get("warehouse"))
  }

  override def name(): String = catName

  /** `graft_cat.db.t` → registry key `db.t`; `graft_cat.t` → `t`. */
  private def key(ident: Identifier): String = {
    require(ident.namespace().length <= 1,
      s"graft tables have at most one namespace level, got ${ident.namespace().mkString(".")}")
    (ident.namespace().toSeq :+ ident.name()).map(_.toLowerCase).mkString(".")
  }

  private def identOf(registryKey: String): Identifier = {
    val parts = registryKey.split('.')
    Identifier.of(parts.init, parts.last)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    GraftCatalog.entries.map(_._1).map(identOf)
      .filter(_.namespace().toSeq == namespace.toSeq.map(_.toLowerCase)).toArray

  override def tableExists(ident: Identifier): Boolean =
    GraftCatalog.lookup(key(ident)).isDefined

  override def loadTable(ident: Identifier): Table =
    GraftCatalog.lookup(key(ident)) match {
      case Some(root) => GraftV2Table(key(ident), root)
      case None => throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catName) ++ ident.namespace().toSeq :+ ident.name())
    }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val k = key(ident)
    require(GraftCatalog.lookup(k).isEmpty, s"graft table already exists: $k")
    val root = Option(properties.get(TableCatalog.PROP_LOCATION))
      .orElse(warehouse.map(w => s"$w/${k.replace('.', '/')}"))
      .getOrElse(throw new IllegalArgumentException(
        s"CREATE TABLE $catName.$k needs LOCATION or the catalog's 'warehouse' option"))
    val partCols = partitions.collect {
      case t if t.name == "identity" => t.references.head.fieldNames.last
    }.toSeq
    val deps = Option(properties.get("columnDependencies"))
      .orElse(Option(properties.get("columndependencies")))
      .map(GraftTable.parseDeps).getOrElse(Seq.empty)
    GraftCreateValidation.validate(schema, partCols, deps)
    val full = deps.foldLeft(schema) { (sch, dep) =>
      if (sch.fieldNames.contains(dep.dest)) sch
      else StructType(sch.fields :+ org.apache.spark.sql.types.StructField(
        dep.dest, GraftCreateValidation.destType(dep, sch), nullable = true))
    }
    GraftTable.createEmpty(SparkSession.active, root, full, partCols, deps)
    GraftCatalog.register(k, root)
    GraftV2Table(k, root)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER through the V2 catalog is not supported — use the graft SQL surface " +
        "(ALTER TABLE via the session bridge) or the GraftTable API")

  override def dropTable(ident: Identifier): Boolean = {
    val k = key(ident)
    GraftCatalog.lookup(k) match {
      case None => false
      case Some(root) =>
        // delete through the Hadoop FS resolved from the root — java.nio
        // silently no-ops on object-store/HDFS roots, which would
        // unregister the table while orphaning the entire dataset
        val rootP = new org.apache.hadoop.fs.Path(root)
        val hfs = rootP.getFileSystem(
          SparkSession.active.sparkContext.hadoopConfiguration)
        if (hfs.exists(rootP)) hfs.delete(rootP, true)
        GraftCatalog.unregister(k)
        true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val k = key(oldIdent)
    val root = GraftCatalog.lookup(k).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catName) ++ oldIdent.namespace().toSeq :+ oldIdent.name()))
    val nk = key(newIdent)
    // refusing an occupied target: a silent re-register would shadow
    // the existing table's registration (its data would orphan)
    if (GraftCatalog.lookup(nk).isDefined)
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Seq(catName) ++ newIdent.namespace().toSeq :+ newIdent.name())
    GraftCatalog.unregister(k)
    GraftCatalog.register(nk, root)
    // a session-catalog mirror of the old name would keep resolving to
    // the root under the dead name — move it along with the rename
    GraftSparkBridge.renameMirror(SparkSession.active, k, nk)
  }

  // ---- namespaces (db prefixes of registry keys) ---------------------

  override def listNamespaces(): Array[Array[String]] =
    GraftCatalog.entries.map(_._1.split('.')).collect {
      case parts if parts.length == 2 => Array(parts(0))
    }.distinct.toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || listNamespaces().exists(_.toSeq == namespace.toSeq)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) new util.HashMap[String, String]()
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
      Seq(catName) ++ namespace.toSeq)

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit = ()

  override def alterNamespace(
      namespace: Array[String], changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    listTables(namespace).isEmpty // nothing to drop: namespaces are implicit
}

/** Marker V2 table: identity + schema only. Never scanned directly —
  * [[GraftRelationRule]] replaces its relations with the manifest-
  * planned V1 scan before any capability check runs.
  */
case class GraftV2Table(registryName: String, root: String) extends Table {
  override def name(): String = registryName
  override def schema(): StructType =
    new GraftTable(root, SparkSession.active).schema
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ,
      org.apache.spark.sql.connector.catalog.TableCapability.BATCH_WRITE)
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put(TableCatalog.PROP_LOCATION, root)
    m.put("provider", "graft")
    m
  }
}
