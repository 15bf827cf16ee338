package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.functions._

import graft.lake.{DepSpec, GraftTable, IcebergExport}

/** Structural validation of the Iceberg-spec v2 metadata export (A69).
  * No external Iceberg reader exists in this sandbox (zero-dep
  * constraint, JSON serialization — limits documented on
  * [[IcebergExport]]), so the spec validates the structure an Iceberg
  * reader needs: field-id'd schema, transform-mapped partition spec,
  * sequence-numbered snapshot chain, manifest-list/manifest counts
  * that reconcile with the graft manifest, existing absolute file
  * paths, and delete-file content kinds with equality ids.
  */
class IcebergExportSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private def parse(path: String): JsonNode =
    mapper.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path.stripPrefix("file:"))))

  test("export emits spec-v2 metadata that reconciles with the graft manifest") {
    val o = Tables.orders(spark, sfDir).limit(2000)
    val root = "/root/repo/target/laketest/iceexport"
    val t = GraftTable.create(spark, root,
      o.repartition(col("o_orderstatus")), Seq("o_orderstatus", "ok_b"),
      Seq(DepSpec("o_orderkey", "ok_b", "bucket[4]")))
    t.append(o.limit(100).repartition(col("o_orderstatus")))
    t.setProperty(GraftTable.DeleteModeProp, "merge-on-read")
    val victim = t.read().select(col("o_orderkey")).orderBy(col("o_orderkey"))
      .head().getLong(0)
    t.delete(col("o_orderkey") === victim)

    val metaPath = IcebergExport.exportMetadata(t, root + "-ice")
    val md = parse(metaPath)

    // table metadata shape
    assert(md.get("format-version").asInt() === 2)
    assert(md.get("current-snapshot-id").asLong() === t.currentId)
    assert(md.get("last-sequence-number").asLong() === t.currentId)
    // deterministic uuid: re-export reproduces it
    assert(md.get("table-uuid").asText() ===
      parse(IcebergExport.exportMetadata(t, root + "-ice2")).get("table-uuid").asText())

    // schema: unique contiguous field ids, every graft column present
    import scala.jdk.CollectionConverters._
    val fields = md.get("schemas").get(0).get("fields").elements().asScala.toSeq
    val ids = fields.map(_.get("id").asInt())
    assert(ids.sorted === (1 to t.schema.fields.length))
    assert(fields.map(_.get("name").asText()).toSet === t.schema.fieldNames.toSet)
    val byName = fields.map(f => f.get("name").asText() -> f).toMap
    assert(byName("o_orderkey").get("type").asText() === "long")
    assert(byName("o_orderstatus").get("type").asText() === "string")

    // partition spec: identity on the real column, bucket[4] against
    // the dependency SOURCE's field id, spec field-ids from 1000
    val spec = md.get("partition-specs").get(0).get("fields").elements().asScala.toSeq
    assert(spec.map(_.get("name").asText()) === Seq("o_orderstatus", "ok_b"))
    val bucketField = spec.find(_.get("name").asText() == "ok_b").get
    assert(bucketField.get("transform").asText() === "bucket[4]")
    assert(bucketField.get("source-id").asInt() ===
      byName("o_orderkey").get("id").asInt())
    assert(spec.map(_.get("field-id").asInt()) === Seq(1000, 1001))

    // snapshot chain: ids, parents, sequence numbers
    val snaps = md.get("snapshots").elements().asScala.toSeq
    assert(snaps.map(_.get("snapshot-id").asLong()) === t.snapshotIds)
    snaps.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b.get("parent-snapshot-id").asLong() === a.get("snapshot-id").asLong())
      case _ =>
    }

    // current snapshot's manifest list reconciles with the manifest
    val curSnap = snaps.last
    val mlist = parse(curSnap.get("manifest-list").asText()).elements().asScala.toSeq
    val dataEntry = mlist.find(_.get("content").asInt() == 0).get
    val delEntry = mlist.find(_.get("content").asInt() == 1).get
    assert(delEntry.get("added_rows_count").asLong() === t.current.deletedRows)
    val manifest = parse(dataEntry.get("manifest_path").asText())
    val entries = manifest.get("entries").elements().asScala.toSeq
    assert(entries.size === t.current.files.size)
    assert(entries.map(_.get("data_file").get("record_count").asLong()).sum ===
      t.current.totalRows)
    // every referenced data file exists at its absolute path
    entries.foreach { e =>
      val p = e.get("data_file").get("file_path").asText()
      assert(p.contains(":/") || p.startsWith("/"), s"not absolute: $p")
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
        p.stripPrefix("file:"))), s"missing $p")
      // partition values carried per file
      assert(e.get("data_file").get("partition").has("o_orderstatus"))
      // field-id-keyed stats present for the stats-bearing columns
      assert(e.get("data_file").get("lower_bounds").size() > 0)
    }
    // delete manifest: position content kind, real file, row count
    val delManifest = parse(delEntry.get("manifest_path").asText())
    val dels = delManifest.get("entries").elements().asScala.toSeq
    assert(dels.size === t.current.deleteFiles.size)
    assert(dels.forall(_.get("data_file").get("content").asInt() === 1))
    assert(dels.map(_.get("data_file").get("record_count").asLong()).sum ===
      t.current.deletedRows)
  }

  test("round-trip: import of exported metadata reads identically, zero bytes copied") {
    val o = Tables.orders(spark, sfDir).limit(3000)
    val root = "/root/repo/target/laketest/iceroundtrip"
    val t = GraftTable.create(spark, root,
      o.repartition(col("o_orderstatus")), Seq("o_orderstatus"))
    t.setProperty(GraftTable.DeleteModeProp, "merge-on-read")
    val victim = t.read().select(col("o_orderkey")).orderBy(col("o_orderkey"))
      .head().getLong(0)
    t.delete(col("o_orderkey") === victim) // pending MOR delete must survive
    t.tag("audited", t.currentId).tag("old", 1L)
    val metaPath = IcebergExport.exportMetadata(t, root + "-ice")
    // refs export: main + both tags with their snapshot ids
    val refs = parse(metaPath).get("refs")
    assert(refs.get("main").get("type").asText() === "branch")
    assert(refs.get("audited").get("snapshot-id").asLong() === t.currentId)
    assert(refs.get("old").get("snapshot-id").asLong() === 1L)

    val imp = IcebergExport.importMetadata(spark, metaPath, root + "-imported")
    // a ref at the imported snapshot re-materializes; one at an absent
    // snapshot is skipped (fresh single-snapshot history)
    assert(imp.refId("audited").contains(imp.currentId))
    assert(imp.refId("old").isEmpty)
    // multiset equality both ways, MOR delete applied on read
    assert(imp.read().exceptAll(t.read()).count() === 0)
    assert(t.read().exceptAll(imp.read()).count() === 0)
    assert(imp.read().filter(col("o_orderkey") === victim).count() === 0)
    // zero-copy: every imported entry is absolute (source-owned)
    assert(imp.current.files.forall(f => GraftTable.isAbsoluteEntry(f.path)))
    // identity partition pruning works over imported partition values
    val (pruned, total, _) = imp.pruneFiles(col("o_orderstatus") === "F")
    assert(pruned.nonEmpty && pruned.size < total)
    // the import's own expire never touches source bytes
    imp.expire(keepFrom = imp.currentId + 1)
    assert(t.read().count() > 0, "source intact after import-side expire")
  }

  test("equality-delete export carries equality_ids; transforms map per spec") {
    import spark.implicits._
    val base = (1L to 500L).map(k => (k, s"v$k")).toDF("k", "v")
    val root = "/root/repo/target/laketest/iceexport-eq"
    val t = GraftTable.create(spark, root, base.repartition(2))
    t.setProperty(GraftTable.MergeModeProp, "merge-on-read")
    t.setProperty(GraftTable.MergeDeleteKindProp, "equality")
    t.merge((1L to 3L).map(k => (k, "nv")).toDF("k", "v"), Seq("k"))
    assert(t.current.deleteFiles.exists(_.equalityCols.nonEmpty))

    val md = parse(IcebergExport.exportMetadata(t, root + "-ice"))
    import scala.jdk.CollectionConverters._
    val curSnap = md.get("snapshots").elements().asScala.toSeq.last
    val mlist = parse(curSnap.get("manifest-list").asText()).elements().asScala.toSeq
    val delManifest = parse(mlist.find(_.get("content").asInt() == 1).get
      .get("manifest_path").asText())
    val eqEntries = delManifest.get("entries").elements().asScala.toSeq
      .filter(_.get("data_file").get("content").asInt() == 2)
    assert(eqEntries.nonEmpty, "equality deletes must export as content=2")
    // equality_ids name the key column's schema field id
    val kId = md.get("schemas").get(0).get("fields").elements().asScala
      .find(_.get("name").asText() == "k").get.get("id").asInt()
    eqEntries.foreach(e =>
      assert(e.get("data_file").get("equality_ids").elements().asScala
        .map(_.asInt()).toSeq === Seq(kId)))

    // EQUALITY round-trip READ: the import must preserve per-entry
    // sequence numbers, or the equality delete goes inert (nothing
    // predates a uniformly-stamped delete) and resurrects pre-images
    val imp = IcebergExport.importMetadata(
      spark, IcebergExport.exportMetadata(t, root + "-ice-rt"), root + "-imp-eq")
    assert(imp.current.deleteFiles.exists(_.equalityCols.nonEmpty),
      "imported equality delete must survive the commit (sequence preserved)")
    assert(imp.read().count() === t.read().count())
    assert(imp.read().filter(col("k") <= 3L).collect()
      .forall(_.getAs[String]("v") == "nv"),
      "post-images win after the round-trip; pre-images stay deleted")
    assert(imp.read().exceptAll(t.read()).count() === 0)

    // transform mapping: sbucket exports as Iceberg bucket
    assert(IcebergExport.icebergTransform("sbucket[8]") === "bucket[8]")
    assert(IcebergExport.icebergTransform("truncate[3]") === "truncate[3]")
    assert(IcebergExport.icebergTransform("day") === "day")
    assert(IcebergExport.icebergType(org.apache.spark.sql.types.TimestampType)
      === "timestamptz")
  }
}
