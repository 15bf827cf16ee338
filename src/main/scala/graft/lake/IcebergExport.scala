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
    case other                => other.simpleString
  }

  /** Iceberg-spec JSON value for a type: primitives serialize as the
    * spec's type STRING, lists as the spec's NESTED OBJECT
    * `{"type":"list","element-id":…,"element":…,"element-required":…}`
    * (a bare "list<x>" string is not spec JSON and no reader — ours
    * included — can parse it). `nextId` allocates the element field id
    * from the table's id space, so `last-column-id` covers it.
    */
  private[graft] def icebergTypeValue(dt: DataType, nextId: () => Int): Any = dt match {
    case ArrayType(et, containsNull) =>
      ListMap(
        "type" -> "list",
        "element-id" -> nextId(),
        "element" -> icebergTypeValue(et, nextId),
        "element-required" -> !containsNull)
    case other => icebergType(other)
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
          // addedBy==0 = "unknown — predates everything" (legacy
          // manifests, Snapshot.scala): export it as sequence 0, the
          // conservative stamp, so an imported equality delete (seq > 0)
          // still applies to the file. Stamping s.id instead would make
          // those deletes inert after a round-trip and resurrect rows.
          "sequence_number" -> f.addedBy,
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
                // a delete file with addedBy==0 is INERT in graft
                // (nothing predates sequence 0) — keep it inert after
                // a round-trip instead of stamping s.id, which would
                // make it apply to every prior data file
                "sequence_number" -> d.addedBy,
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
          // counts mirror the per-entry status field exactly (legacy
          // addedBy==0 entries are status=existing in every snapshot)
          "added_files_count" -> s.files.count(_.addedBy == s.id),
          "existing_files_count" -> s.files.count(_.addedBy != s.id),
          "deleted_files_count" -> 0,
          "added_rows_count" -> s.files.filter(_.addedBy == s.id).map(_.rows).sum) +:
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
        "field-id" -> (1000 + i),
        // extra key (Iceberg readers ignore unknown fields): the exact
        // graft transform, so a round-trip import reconstructs the
        // same hash function — Iceberg's bucket hash is murmur3 over
        // its own serialization, NOT interchangeable with graft's
        "graft-transform" -> depByDest.get(p).map(_.transform).getOrElse("identity"))
    }

    // nested-type element ids are allocated AFTER the column ids so
    // last-column-id covers every id in the schema (spec requirement)
    var lastColumnId = schema.fields.length
    val schemaFieldJsons = schema.fields.map { f =>
      ListMap(
        "id" -> fieldIds(f.name),
        "name" -> f.name,
        "required" -> !f.nullable,
        "type" -> icebergTypeValue(f.dataType, () => { lastColumnId += 1; lastColumnId }))
    }

    val metadata = ListMap(
      "format-version" -> 2,
      "table-uuid" -> java.util.UUID.nameUUIDFromBytes(
        qualifiedRoot.getBytes("UTF-8")).toString,
      "location" -> qualifiedRoot,
      "last-sequence-number" -> cur.id,
      "last-updated-ms" -> cur.tsMillis,
      "last-column-id" -> lastColumnId,
      "current-schema-id" -> 0,
      "schemas" -> Seq(ListMap(
        "type" -> "struct",
        "schema-id" -> 0,
        "fields" -> schemaFieldJsons)),
      "default-spec-id" -> 0,
      "partition-specs" -> Seq(ListMap("spec-id" -> 0, "fields" -> specFields)),
      "last-partition-id" -> (999 + cur.partitionCols.size),
      "default-sort-order-id" -> 0,
      "sort-orders" -> Seq(ListMap("order-id" -> 0, "fields" -> Seq.empty[String])),
      "properties" -> cur.properties,
      "current-snapshot-id" -> cur.id,
      // spec-v2 refs: named branches/tags with their snapshot ids;
      // `main` is the current branch per the spec's convention
      // a user-created ref literally named "main" is dropped: the spec
      // requires refs.main.snapshot-id == current-snapshot-id, and the
      // synthesized main ref must win the merge
      "refs" -> (ListMap("main" ->
        ListMap("snapshot-id" -> cur.id, "type" -> "branch")) ++
        t.refEntries.toSeq.filterNot(_._1 == "main").sortBy(_._1)
          .map { case (n, (id, isBranch)) =>
            n -> ListMap("snapshot-id" -> id,
              "type" -> (if (isBranch) "branch" else "tag"))
          }),
      "snapshots" -> snaps.map(s => ListMap(
        "snapshot-id" -> s.id,
        "parent-snapshot-id" -> s.parentId,
        "sequence-number" -> s.id,
        "timestamp-ms" -> s.tsMillis,
        "summary" -> ListMap(
          "operation" -> (s.operation match {
            case "create" | "append" => "append"
            case op if op.startsWith("overwrite") => "overwrite"
            // spec v2 defines 'delete' as its own operation kind
            case "delete" | "merge-delete" => "delete"
            case "update" | "merge" => "overwrite"
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

  private[graft] def sparkType(t: String): DataType = t match {
    case "long"        => LongType
    case "int"         => IntegerType
    case "string"      => StringType
    case "double"      => DoubleType
    case "float"       => FloatType
    case "boolean"     => BooleanType
    case "date"        => DateType
    case "timestamptz" => TimestampType
    case "timestamp"   => TimestampNTZType
    case "binary"      => BinaryType
    case DecRe(p, sc)  => DecimalType(p.toInt, sc.toInt)
    case other => throw new IllegalArgumentException(s"unsupported Iceberg type $other")
  }
  private val DecRe = """decimal\((\d+),\s*(\d+)\)""".r

  /** Parse an Iceberg-spec type VALUE: primitive type strings or the
    * nested list object [[icebergTypeValue]] emits.
    */
  private[graft] def sparkTypeNode(n: com.fasterxml.jackson.databind.JsonNode): DataType =
    if (n.isTextual) sparkType(n.asText())
    else if (n.isObject && n.get("type").asText() == "list")
      ArrayType(sparkTypeNode(n.get("element")),
        containsNull = !Option(n.get("element-required")).exists(_.asBoolean()))
    else throw new IllegalArgumentException(s"unsupported Iceberg type $n")

  /** The other direction of the bridge: IMPORT exported Iceberg-spec
    * metadata as a graft table at `destRoot` — zero bytes copied, the
    * imported snapshot references the exported table's data files by
    * absolute path (the same mechanics as a shallow clone, so
    * expire/vacuum on the import never touch the source bytes).
    *
    * Scope, stated honestly: the import consumes THIS bridge's JSON
    * serialization (a real Iceberg table's Avro manifests need the
    * Iceberg reader dependency — out of scope under zero-dep) and
    * materializes the CURRENT snapshot (graft snapshots are per-table
    * history; an imported table starts a fresh history, like
    * `CREATE TABLE … SHALLOW CLONE`). Dependency transforms round-trip
    * through the `graft-transform` spec extra; a foreign table
    * claiming Iceberg's own `bucket[n]` imports WITHOUT the dep
    * (Iceberg's bucket murmur3 is not graft's hash — claiming it
    * would prune the wrong files; identity partition pruning over the
    * imported per-file partition values still works).
    */
  def importMetadata(spark: org.apache.spark.sql.SparkSession,
      metadataPath: String, destRoot: String): GraftTable = {
    val conf = spark.sparkContext.hadoopConfiguration
    def parse(p: String) = {
      val hp = new HPath(p)
      val fs = hp.getFileSystem(conf)
      val len = fs.getFileStatus(hp).getLen.toInt
      val in = fs.open(hp)
      try { val buf = new Array[Byte](len); in.readFully(0, buf); mapper.readTree(buf) }
      finally in.close()
    }
    import scala.jdk.CollectionConverters._
    val md = parse(metadataPath)
    require(md.get("format-version").asInt() == 2,
      s"unsupported format-version ${md.get("format-version")}")
    val fieldNodes = md.get("schemas").get(0).get("fields").elements().asScala.toSeq
    val idToName = fieldNodes.map(f => f.get("id").asInt() -> f.get("name").asText()).toMap
    val schema = StructType(fieldNodes.map(f =>
      StructField(f.get("name").asText(), sparkTypeNode(f.get("type")),
        nullable = !f.get("required").asBoolean())))

    val specFields = md.get("partition-specs").get(0).get("fields").elements().asScala.toSeq
    val partitionCols = specFields.map(_.get("name").asText())
    val deps = specFields.flatMap { sf =>
      val name = sf.get("name").asText()
      val src = idToName.getOrElse(sf.get("source-id").asInt(), name)
      val gt = Option(sf.get("graft-transform")).map(_.asText())
      gt match {
        case Some(t) if t != "identity" => Some(DepSpec(src, name, t))
        case Some(_) => None
        case None => None // foreign metadata: no graft hash claim (see scaladoc)
      }
    }

    def statType(c: String): Option[String] = schema.fields.find(_.name == c).map(_.dataType match {
      case LongType | IntegerType | ShortType | ByteType => "long"
      case DoubleType | FloatType                        => "double"
      case StringType                                    => "string"
      case _                                             => ""
    }).filter(_.nonEmpty)

    val curId = md.get("current-snapshot-id").asLong()
    val snapNode = md.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == curId)
      .getOrElse(throw new IllegalArgumentException(s"current snapshot $curId absent"))
    val mlist = parse(snapNode.get("manifest-list").asText()).elements().asScala.toSeq
    def manifestEntries(contentKind: Int): Seq[com.fasterxml.jackson.databind.JsonNode] =
      mlist.filter(_.get("content").asInt() == contentKind)
        .flatMap(m => parse(m.get("manifest_path").asText())
          .get("entries").elements().asScala.toSeq)

    val files = manifestEntries(0).map { e =>
      val df = e.get("data_file")
      val stats = Option(df.get("lower_bounds")).map { lo =>
        val hi = df.get("upper_bounds"); val nu = df.get("null_value_counts")
        lo.fieldNames().asScala.flatMap { fid =>
          val cName = idToName.getOrElse(fid.toInt, "")
          statType(cName).map { tpe =>
            cName -> ColStat(tpe, lo.get(fid).asText(),
              Option(hi.get(fid)).map(_.asText()).orNull,
              Option(nu.get(fid)).map(_.asLong()).getOrElse(0L))
          }
        }.toMap
      }.getOrElse(Map.empty[String, ColStat])
      FileEntry(
        path = df.get("file_path").asText(), // absolute — never owned
        partition = Option(df.get("partition")).map(p =>
          p.fieldNames().asScala.map(k => k -> p.get(k).asText()).toMap)
          .getOrElse(Map.empty),
        rows = df.get("record_count").asLong(),
        bytes = df.get("file_size_in_bytes").asLong(),
        stats = stats,
        // PER-ENTRY sequence, not curId: equality deletes apply only to
        // files with addedBy < the delete's — a uniform stamp would make
        // every imported equality delete inert (commit-time pruning
        // drops a delete nothing predates) and resurrect its victims
        addedBy = Option(e.get("sequence_number")).map(_.asLong()).getOrElse(curId))
    }
    val deleteFiles = manifestEntries(1).map { e =>
      val df = e.get("data_file")
      DeleteFileEntry(
        path = df.get("file_path").asText(),
        rows = df.get("record_count").asLong(),
        addedBy = Option(e.get("sequence_number")).map(_.asLong()).getOrElse(curId),
        bytes = df.get("file_size_in_bytes").asLong(),
        equalityCols =
          if (df.get("content").asInt() == 2)
            Option(df.get("equality_ids")).map(_.elements().asScala
              .map(n => idToName.getOrElse(n.asInt(), "")).filter(_.nonEmpty).toSeq)
              .getOrElse(Seq.empty)
          else Seq.empty)
    }

    val destP = new HPath(destRoot)
    val hfs = destP.getFileSystem(conf)
    if (hfs.exists(destP)) hfs.delete(destP, true)
    GraftTable.invalidate(destRoot)
    hfs.mkdirs(destP)
    val t = new GraftTable(destRoot, spark)
    // keep the SOURCE snapshot id (like cloneTo) so inherited addedBy /
    // equality-delete sequencing survives the import
    t.commit(Snapshot(
      id = curId, parentId = -1L, tsMillis = System.currentTimeMillis(),
      operation = "iceberg-import", schemaJson = schema.json,
      partitionCols = partitionCols, deps = deps, files = files,
      addedFiles = 0, deletedFiles = 0, deleteFiles = deleteFiles,
      properties = Option(md.get("properties")).map(p =>
        p.fieldNames().asScala.map(k => k -> p.get(k).asText()).toMap)
        .getOrElse(Map.empty) +
        ("import.source" -> metadataPath)))
    // named refs: re-create the ones that resolve against the imported
    // snapshot (the import starts a fresh single-snapshot history, so
    // refs at other snapshots have nothing to point at — skipped, like
    // a shallow clone's fresh ref namespace)
    Option(md.get("refs")).foreach { refs =>
      refs.fieldNames().asScala.filterNot(_ == "main").foreach { n =>
        val r = refs.get(n)
        if (r.get("snapshot-id").asLong() == curId) {
          if (r.get("type").asText() == "tag") t.tag(n, curId)
          else t.branch(n, curId)
          ()
        }
      }
    }
    t
  }
}
