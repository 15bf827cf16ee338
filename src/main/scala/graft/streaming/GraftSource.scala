package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType

import graft.lake.GraftTable

/** A graft table as a Structured Streaming SOURCE: offsets are snapshot
  * ids, and each micro-batch reads exactly the data files added in
  * `(startId, endId]` through the manifest scan path — the Delta-style
  * "streaming read of a table" (SURVEY.md §2.D6). Combined with the
  * exactly-once [[graft.lake.GraftTable.appendBatch]] sink, two graft
  * tables chain into an incremental pipeline with end-to-end
  * exactly-once semantics.
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format("graft.streaming.GraftSourceProvider")
  *     .option("path", tableRoot)
  *     .load()
  * }}}
  *
  * Scale notes: getOffset is one version-hint read; getBatch plans from
  * manifests only (no listing), and a batch's input is exactly the
  * appended files — consumers never rescan history. Snapshots that
  * REWRITE files (delete/update/compact) surface rewritten files as
  * additions, same contract as [[graft.lake.GraftTable.readIncremental]];
  * pure-append workloads (the streaming case) see each row once.
  * Schema is pinned at stream start (streaming requires it); evolve
  * the table ⇒ restart the stream.
  */
class GraftSourceProvider extends StreamSourceProvider {

  private def root(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft source requires option 'path'"))

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    ("graft", schema.getOrElse(
      new GraftTable(root(parameters), sqlContext.sparkSession).schema))

  override def createSource(
      sqlContext: SQLContext, metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source =
    new GraftSource(sqlContext.sparkSession, root(parameters),
      parameters.get("maxSnapshotsPerTrigger").map(_.toLong))
}

class GraftSource(
    spark: SparkSession, root: String,
    maxSnapshotsPerTrigger: Option[Long] = None) extends Source {

  private val table = new GraftTable(root, spark)

  override val schema: StructType = table.schema

  // admission control: highest end offset handed out so far. Restart
  // recovery initializes it via the recovered-batch getBatch call
  // before the first new getOffset, so the cap is always relative to
  // real progress (the standard v1-Source rate-limit pattern).
  @volatile private var lastEnd: Long = 0L

  /** Latest committed snapshot id (one version-hint read), capped at
    * `maxSnapshotsPerTrigger` snapshots beyond the last batch — a
    * backlogged stream catches up in bounded micro-batches instead of
    * one batch containing the whole history's files.
    *
    * Snapshot ids are explicitly NON-DENSE (parked write-audit-publish
    * stages, abandoned stages, step-over commits all leave gaps), and a
    * staged-but-unpublished snapshot must never become an end offset
    * (its files are unaudited). So the cap counts ACTUAL ids on the
    * MAIN LINEAGE — the parent chain from current back to the last
    * batch — never `lastEnd + n` arithmetic, which can name an id that
    * does not exist (getBatch would crash) or one that was never
    * published. The walk reads O(delta) cached manifests per trigger.
    */
  override def getOffset: Option[Offset] = {
    val id = table.currentId
    if (id <= 0) return None
    val capped = maxSnapshotsPerTrigger match {
      case Some(n) if id > lastEnd =>
        var lineage = List.empty[Long] // (lastEnd, id] oldest-first
        var a = id
        var walking = true
        while (walking && a > lastEnd && a >= 0) {
          // An intermediate snapshot expired while the stream was
          // backlogged is not an error: stop the walk there — the head
          // of `lineage` is then the oldest RETAINED id, and a batch
          // ending at it still carries the expired snapshots' files
          // (they live on in retained manifests with their original
          // addedBy stamps, all > lastEnd).
          table.snapshotIfExists(a) match {
            case Some(s) => lineage = a :: lineage; a = s.parentId
            case None    => walking = false
          }
        }
        lineage.take(math.min(n, lineage.size.toLong).toInt)
          .lastOption.getOrElse(id)
      case _ => id
    }
    if (capped <= 0) None else Some(LongOffset(capped))
  }

  // offsets arrive as LongOffset within a run and as SerializedOffset
  // (raw json, here just the number) after a checkpoint restart
  private def idOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other         => other.json.trim.toLong
  }

  /** A batch plans the files ADDED in `(start, end]` by filtering each
    * entry's `addedBy` stamp — O(batch delta), no per-trigger
    * materialization of the start snapshot's whole file list (at 10⁷
    * table files the old set-difference rebuilt a 10⁷-entry set every
    * micro-batch). Exactly-once per FILE: a rollback that re-exposes
    * previously-deleted files does NOT re-emit them (their rows were
    * already delivered when first added). Manifests predating the
    * `addedBy` field (stamp 0) fall back to the set difference.
    */
  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endId = idOf(end)
    lastEnd = math.max(lastEnd, endId)
    val endSnap = table.snapshot(endId)
    val startId = start.map(idOf).getOrElse(0L)
    val delta =
      if (endSnap.files.forall(_.addedBy > 0L))
        endSnap.files.filter(f => f.addedBy > startId && f.addedBy <= endId)
      else {
        val seen = start.map(o => table.snapshot(idOf(o)).files.map(_.path).toSet)
          .getOrElse(Set.empty[String])
        endSnap.files.filterNot(f => seen.contains(f.path))
      }
    org.apache.spark.sql.graft.GraftFileIndex
      .relation(spark, root, endSnap.copy(files = delta), isStreaming = true)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftSource[$root]"
}
