package graft.lake

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.{ClassTagExtensions, DefaultScalaModule}

/** Snapshot / manifest model for a graft-managed table — the
  * Iceberg-equivalent control plane re-expressed natively (reference:
  * src/main/scala/org/apache/spark/sql/iceberg/IcebergTableScan.scala
  * and utils/TableUtils.scala drive scans off Iceberg snapshots +
  * manifests; here the manifest is a single JSON document per
  * snapshot).
  *
  * Planning cost is O(#files-in-metadata): a scan never lists the
  * filesystem, it reads one version pointer + one manifest. At 100 TB
  * with ~1e5 files a manifest is a few tens of MB of JSON on the
  * driver — the same order as Iceberg's avro manifests; sharding the
  * file list per partition would be the next step, not a redesign.
  */

/** Per-file, per-column min/max/null stats harvested from the parquet
  * footer at commit time (reference: utils/ParquetMetrics.scala does
  * the same via Iceberg's Metrics). Values are serialized as strings,
  * tagged with a type ("long" | "double" | "string") so pruning can
  * compare them without the schema in hand.
  */
final case class ColStat(tpe: String, min: String, max: String, nulls: Long)

/** One data file registered in a snapshot. `path` is relative to the
  * table root; `partition` maps partition-column name → string value
  * exactly as spelled in the hive-style directory.
  */
final case class FileEntry(
    path: String,
    partition: Map[String, String],
    rows: Long,
    bytes: Long,
    stats: Map[String, ColStat])

/** A column dependency `src → dest : transform` (reference:
  * utils/Transforms.scala:30; Config.scala:77 COLUMN_DEPENDENCIES option). Declares
  * dest = transform(src) so predicates on src can be rewritten into
  * partition predicates on dest at scan time.
  */
final case class DepSpec(src: String, dest: String, transform: String)

final case class Snapshot(
    id: Long,
    parentId: Long, // -1 = none (plain Long: jackson-scala erases Option[Long] to boxed Int)
    tsMillis: Long,
    operation: String, // create | append | overwrite | overwrite-partition | overwrite-dynamic | rollback | add-column
    schemaJson: String,
    partitionCols: Seq[String],
    deps: Seq[DepSpec],
    files: Seq[FileEntry],
    addedFiles: Int,
    deletedFiles: Int) {
  def totalRows: Long = files.map(_.rows).sum
}

object SnapshotCodec {
  private val mapper: ObjectMapper with ClassTagExtensions = {
    val m = new ObjectMapper() with ClassTagExtensions
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }
  def toJson(s: Snapshot): String = mapper.writerWithDefaultPrettyPrinter.writeValueAsString(s)
  def fromJson(json: String): Snapshot = mapper.readValue[Snapshot](json)
}
