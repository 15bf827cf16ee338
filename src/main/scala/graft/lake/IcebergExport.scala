package graft.lake

import scala.collection.immutable.ListMap

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.types._

/** One-way Iceberg-format interop bridge (SURVEY.md §2.A69): export a
  * graft table's metadata as Iceberg-spec v2 table metadata — the
  * structure other engines' catalogs consume (reference embeds the
  * real Iceberg library for this role: utils/Transforms.scala:20,
  * table/SparkTableOperations.scala). Emitted under `<out>/metadata/`:
  *
  *  - `v1.metadata.json` — spec-v2 table metadata: format-version 2,
  *    deterministic table-uuid, field-id'd schema, partition-spec with
  *    source-id/field-id/transform (column dependencies map to Iceberg
  *    transforms: sbucket/bucket → bucket[n], truncate[n] → truncate[n],
  *    year/month/day/hour → the time transforms), snapshot list with
  *    sequence numbers + parent chain, snapshot-log, properties.
  *  - `snap-<id>.manifest-list.json` per retained snapshot — entries
  *    with content kind (0 = data, 1 = position deletes, 2 = equality
  *    deletes), file/row counts and sequence numbers.
  *  - `manifest-<id>.json` / `delete-manifest-<id>.json` — file
  *    entries: status (1 = added by this snapshot, 0 = existing),
  *    absolute `file_path`, `file_format`, partition values,
  *    `record_count`, `file_size_in_bytes`, and per-field
  *    lower/upper/null-count stats keyed by Iceberg field id;
  *    equality-delete entries carry `equality_ids`.
  *
  * HONEST LIMITS (documented, not hidden): the Iceberg spec serializes
  * manifest lists and manifests as AVRO with binary-encoded bounds; this
  * sandbox has no Iceberg writer dependency (zero-dep constraint), so
  * the bridge emits the same logical structure as JSON with readable
  * stat strings. A real Iceberg reader needs the Avro serialization
  * layer on top; everything an engine must KNOW — ids, transforms,
  * sequence numbers, delete-file contents, parent chains — is here,
  * and a structural spec validates it in-sandbox (no external reader
  * exists in this environment).
  */
object IcebergExport {

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m
  }

  private[graft] def icebergType(dt: DataType): String = dt match {
    case LongType             => "long"
    case IntegerType          => "int"
    case ShortType            => "int"
    case ByteType             => "int"
    case StringType           => "string"
    case DoubleType           => "double"
    case FloatType            => "float"
    case BooleanType          => "boolean"
    case DateType             => "date"
    case TimestampType        => "timestamptz"
    case TimestampNTZType     => "timestamp"
    case BinaryType           => "binary"
    case d: DecimalType       => s"decimal(${d.precision}, ${d.scale})"
    case ArrayType(et, _)     => s"list<${icebergType(et)}>"
    case other                => other.simpleString
  }

  private val BucketRe = """s?bucket\[(\d+)\]""".r
  private val TruncRe = """truncate\[(\d+)\]""".r

  private[graft] def icebergTransform(t: String): String = t match {
    case "identity"   => "identity"
    case BucketRe(n)  => s"bucket[$n]"
    case TruncRe(n)   => s"truncate[$n]"
    case "year" | "month" | "day" | "hour" => t
    case other        => other
  }

  /** Export the table's retained history as Iceberg-spec v2 metadata
    * under `outDir/metadata/`; returns the table-metadata file path.
    */
  def exportMetadata(t: GraftTable, outDir: String): String = {
    val conf = t.io.conf
    val metaDir = new HPath(new HPath(outDir), "metadata")
    val fs = metaDir.getFileSystem(conf)
    fs.mkdirs(metaDir)
    def write(name: String, value: Any): String = {
      val p = new HPath(metaDir, name)
      val out = fs.create(p, true)
      try out.write(mapper.writerWithDefaultPrettyPrinter.writeValueAsBytes(value))
      finally out.close()
      p.toString
    }

    val schema = t.schema
    val fieldIds: Map[String, Int] =
      schema.fields.zipWithIndex.map { case (f, i) => f.name -> (i + 1) }.toMap
    val snaps = t.snapshots.sortBy(_.id)
    val cur = t.current
    val qualifiedRoot = fs.makeQualified(new HPath(t.root)).toString

    def statsOf(stats: Map[String, ColStat]): (Map[String, String], Map[String, String], Map[String, Long]) = {
      val known = stats.filter { case (c, _) => fieldIds.contains(c) }
      (known.collect { case (c, st) if st.min != null => fieldIds(c).toString -> st.min },
        known.collect { case (c, st) if st.max != null => fieldIds(c).toString -> st.max },
        known.map { case (c, st) => fieldIds(c).toString -> st.nulls })
    }

    // one data manifest (+ optional delete manifest) per snapshot: a
    // flattened per-snapshot view; graft's own content-addressed shards
    // are the reuse layer, the export is the interchange layer
    val manifestPaths = snaps.map { s =>
      val entries = s.files.map { f =>
        val (lo, hi, nulls) = statsOf(f.stats)
        ListMap(
          "status" -> (if (f.addedBy == s.id) 1 else 0),
          "snapshot_id" -> (if (f.addedBy > 0) f.addedBy else s.id),
          "sequence_number" -> (if (f.addedBy > 0) f.addedBy else s.id),
          "data_file" -> ListMap(
            "content" -> 0,
            "file_path" -> GraftTable.resolveEntry(qualifiedRoot, f.path),
            "file_format" -> "PARQUET",
            "partition" -> f.partition,
            "record_count" -> f.rows,
            "file_size_in_bytes" -> f.bytes,
            "lower_bounds" -> lo,
            "upper_bounds" -> hi,
            "null_value_counts" -> nulls))
      }
      val dataPath = write(s"manifest-${s.id}.json",
        ListMap("schema_id" -> 0, "content" -> "data", "entries" -> entries))
      val delPath =
        if (s.deleteFiles.isEmpty) None
        else Some(write(s"delete-manifest-${s.id}.json",
          ListMap("schema_id" -> 0, "content" -> "deletes",
            "entries" -> s.deleteFiles.map { d =>
              ListMap(
                "status" -> (if (d.addedBy == s.id) 1 else 0),
                "snapshot_id" -> (if (d.addedBy > 0) d.addedBy else s.id),
                "sequence_number" -> (if (d.addedBy > 0) d.addedBy else s.id),
                "data_file" -> ListMap(
                  "content" -> (if (d.equalityCols.nonEmpty) 2 else 1),
                  "file_path" -> GraftTable.resolveEntry(qualifiedRoot, d.path),
                  "file_format" -> "PARQUET",
                  "record_count" -> d.rows,
                  "file_size_in_bytes" -> d.bytes,
                  "equality_ids" -> d.equalityCols.flatMap(fieldIds.get)))
            })))
      s.id -> (dataPath, delPath)
    }.toMap

    val manifestLists = snaps.map { s =>
      val (dataPath, delPath) = manifestPaths(s.id)
      val entries =
        ListMap(
          "manifest_path" -> dataPath,
          "manifest_length" -> fs.getFileStatus(new HPath(dataPath)).getLen,
          "partition_spec_id" -> 0,
          "content" -> 0,
          "sequence_number" -> s.id,
          "added_files_count" -> s.files.count(f => f.addedBy == s.id || f.addedBy == 0L),
          "existing_files_count" -> s.files.count(f => f.addedBy != 0L && f.addedBy != s.id),
          "deleted_files_count" -> 0,
          "added_rows_count" -> s.files.filter(f => f.addedBy == s.id || f.addedBy == 0L).map(_.rows).sum) +:
        delPath.toSeq.map(dp =>
          ListMap(
            "manifest_path" -> dp,
            "manifest_length" -> fs.getFileStatus(new HPath(dp)).getLen,
            "partition_spec_id" -> 0,
            "content" -> 1,
            "sequence_number" -> s.id,
            "added_files_count" -> s.deleteFiles.size,
            "existing_files_count" -> 0,
            "deleted_files_count" -> 0,
            "added_rows_count" -> s.deleteFiles.map(_.rows).sum))
      s.id -> write(s"snap-${s.id}.manifest-list.json", entries)
    }.toMap

    // partition spec: dep destinations carry their transform against
    // the SOURCE field id (Iceberg's model — the derived column is not
    // a schema field there; graft materializes it, so it appears in
    // both places, documented)
    val depByDest = cur.deps.map(d => d.dest -> d).toMap
    val specFields = cur.partitionCols.zipWithIndex.map { case (p, i) =>
      val (srcCol, transform) = depByDest.get(p)
        .map(d => (d.src, icebergTransform(d.transform)))
        .getOrElse((p, "identity"))
      ListMap(
        "name" -> p,
        "transform" -> transform,
        "source-id" -> fieldIds.getOrElse(srcCol, fieldIds.getOrElse(p, 0)),
        "field-id" -> (1000 + i))
    }

    val metadata = ListMap(
      "format-version" -> 2,
      "table-uuid" -> java.util.UUID.nameUUIDFromBytes(
        qualifiedRoot.getBytes("UTF-8")).toString,
      "location" -> qualifiedRoot,
      "last-sequence-number" -> cur.id,
      "last-updated-ms" -> cur.tsMillis,
      "last-column-id" -> schema.fields.length,
      "current-schema-id" -> 0,
      "schemas" -> Seq(ListMap(
        "type" -> "struct",
        "schema-id" -> 0,
        "fields" -> schema.fields.map(f => ListMap(
          "id" -> fieldIds(f.name),
          "name" -> f.name,
          "required" -> !f.nullable,
          "type" -> icebergType(f.dataType))))),
      "default-spec-id" -> 0,
      "partition-specs" -> Seq(ListMap("spec-id" -> 0, "fields" -> specFields)),
      "last-partition-id" -> (999 + cur.partitionCols.size),
      "default-sort-order-id" -> 0,
      "sort-orders" -> Seq(ListMap("order-id" -> 0, "fields" -> Seq.empty[String])),
      "properties" -> cur.properties,
      "current-snapshot-id" -> cur.id,
      "snapshots" -> snaps.map(s => ListMap(
        "snapshot-id" -> s.id,
        "parent-snapshot-id" -> s.parentId,
        "sequence-number" -> s.id,
        "timestamp-ms" -> s.tsMillis,
        "summary" -> ListMap(
          "operation" -> (s.operation match {
            case "create" | "append" => "append"
            case op if op.startsWith("overwrite") => "overwrite"
            case "delete" | "update" | "merge" | "merge-delete" => "overwrite"
            case _ => "replace"
          }),
          "graft-operation" -> s.operation),
        "manifest-list" -> manifestLists(s.id),
        "schema-id" -> 0)),
      "snapshot-log" -> snaps.map(s => ListMap(
        "timestamp-ms" -> s.tsMillis, "snapshot-id" -> s.id)),
      "metadata-log" -> Seq.empty[String])

    write("v1.metadata.json", metadata)
  }
}
