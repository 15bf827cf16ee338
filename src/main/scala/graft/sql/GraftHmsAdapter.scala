package graft.sql

import java.net.URI

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogDatabase, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.types.StructType

/** HMS-shaped persistence adapter for [[GraftCatalog]] (SURVEY.md
  * §2.A28): mirrors every graft registration into the session's
  * `ExternalCatalog` as an EXTERNAL `provider = "graft"` table inside
  * a `graft` database, with the table root in both the storage
  * location and a `graft.root` property — the shape a Hive-metastore
  * deployment persists (reference parity: the reference leans on the
  * Hive metastore for table registration; graft's own JSON warehouse
  * file covers the no-HMS case).
  *
  * What the adapter buys WHERE: under a real HMS-backed SparkSession
  * (`enableHiveSupport`), `ExternalCatalog` IS the metastore client,
  * so mirrored entries persist across JVMs and are visible to every
  * engine that reads the metastore. This sandbox has no HMS, so the
  * `ExternalCatalog` is Spark's `InMemoryCatalog` — entries live for
  * the JVM only (documented limit, exercised by SqlSurfaceSpec's
  * drop-memory/reload round-trip) and durability stays with the
  * warehouse JSON ([[GraftCatalog.setWarehouse]]), which is
  * authoritative either way: on conflict the JSON/in-memory entry
  * wins and the mirror is re-stamped.
  *
  * Mirroring is BEST-EFFORT by design: catalog trouble (no active
  * session, a concurrent drop, an HMS hiccup) must never fail the
  * graft-side registration, exactly like the stats commit listener
  * ([[GraftSparkBridge]]).
  */
object GraftHmsAdapter {

  val Db = "graft"
  val RootProp = "graft.root"
  val NameProp = "graft.name"

  /** External-catalog-safe table name: multi-part graft names keep
    * their exact form in [[NameProp]]; the catalog identifier flattens
    * `.` (illegal in a table name) to `__`.
    */
  private def tableName(name: String): String =
    name.toLowerCase.replace(".", "__")

  private def ensureDb(spark: SparkSession): Unit = {
    val ext = spark.sharedState.externalCatalog
    if (!ext.databaseExists(Db)) {
      val base = spark.sessionState.conf.warehousePath.stripSuffix("/")
      ext.createDatabase(
        CatalogDatabase(Db, "graft table registrations",
          new URI(s"$base/$Db.db"), Map.empty),
        ignoreIfExists = true)
    }
  }

  /** Mirror one registration into the ExternalCatalog (create or
    * re-stamp). Never throws.
    */
  def mirror(spark: SparkSession, name: String, root: String): Unit =
    try {
      ensureDb(spark)
      val ext = spark.sharedState.externalCatalog
      val tn = tableName(name)
      val tbl = CatalogTable(
        identifier = TableIdentifier(tn, Some(Db)),
        tableType = CatalogTableType.EXTERNAL,
        storage = CatalogStorageFormat.empty.copy(
          locationUri = Some(new URI(root))),
        // schema lives in the graft manifest (snapshot-versioned — a
        // catalog copy would go stale on evolution); the entry is a
        // POINTER, like a Delta/Iceberg HMS entry whose real schema
        // is in the table's own metadata
        schema = new StructType(),
        provider = Some("graft"),
        properties = Map(RootProp -> root, NameProp -> name.toLowerCase))
      if (ext.tableExists(Db, tn)) ext.alterTable(tbl)
      else ext.createTable(tbl, ignoreIfExists = true)
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Drop a registration's mirror. Never throws. */
  def unmirror(spark: SparkSession, name: String): Unit =
    try {
      val ext = spark.sharedState.externalCatalog
      if (ext.databaseExists(Db))
        ext.dropTable(Db, tableName(name), ignoreIfNotExists = true, purge = false)
    } catch { case scala.util.control.NonFatal(_) => () }

  /** All graft entries the ExternalCatalog currently holds, as
    * (registered name, root).
    */
  def mirroredEntries(spark: SparkSession): Seq[(String, String)] =
    try {
      val ext = spark.sharedState.externalCatalog
      if (!ext.databaseExists(Db)) Seq.empty
      else ext.listTables(Db).flatMap { tn =>
        val t = ext.getTable(Db, tn)
        if (!t.provider.contains("graft")) None
        else for {
          n <- t.properties.get(NameProp)
          r <- t.properties.get(RootProp)
        } yield (n, r)
      }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** Fill [[GraftCatalog]]'s memory from the ExternalCatalog (an HMS
    * deployment's cross-JVM reload path). Existing in-memory/JSON
    * entries win — the mirror never overrides the authoritative layer.
    */
  def reloadInto(spark: SparkSession): Int = {
    val entries = mirroredEntries(spark)
    entries.count { case (n, r) => GraftCatalog.adopt(n, r) }
  }
}
