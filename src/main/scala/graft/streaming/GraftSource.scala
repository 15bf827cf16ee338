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
  * Admission control (all optional, composable):
  *  - `maxSnapshotsPerTrigger` — at most n snapshots per micro-batch.
  *  - `maxFilesPerTrigger` / `maxBytesPerTrigger` — split WITHIN a
  *    snapshot: one huge backfill commit drains across many bounded
  *    micro-batches instead of landing as one. Sub-snapshot progress is
  *    checkpointed as [[GraftFileOffset]] `(id, k)` = "all files
  *    through snapshot id, except files of id itself ranked > k" —
  *    files rank by path within their adding snapshot, which is stable,
  *    so restart mid-snapshot replays exactly-once.
  *
  * Scale notes: getOffset is one version-hint read (plus O(delta)
  * cached manifest reads under admission caps); getBatch plans from
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
      parameters.get("maxSnapshotsPerTrigger").map(_.toLong),
      parameters.get("maxFilesPerTrigger").map(_.toLong),
      parameters.get("maxBytesPerTrigger").map(_.toLong))
}

/** Sub-snapshot offset: everything through snapshot `id`, minus the
  * files ADDED BY `id` whose path-rank within the snapshot exceeds `k`.
  * `(id, Long.MaxValue)` ≡ the plain snapshot offset `id` — which is
  * also how legacy checkpointed [[LongOffset]]s deserialize, so a
  * stream can turn file caps on or off across restarts.
  */
case class GraftFileOffset(id: Long, k: Long) extends Offset {
  override def json: String = s"""{"id":$id,"k":$k}"""
}

class GraftSource(
    spark: SparkSession, root: String,
    maxSnapshotsPerTrigger: Option[Long] = None,
    maxFilesPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None) extends Source {

  private val table = new GraftTable(root, spark)

  override val schema: StructType = table.schema

  // admission control: highest end offset handed out so far. Restart
  // recovery initializes it via the recovered-batch getBatch call
  // before the first new getOffset, so the cap is always relative to
  // real progress (the standard v1-Source rate-limit pattern).
  @volatile private var lastEnd: (Long, Long) = (0L, Long.MaxValue)

  /** Latest committed snapshot id (one version-hint read), capped at
    * `maxSnapshotsPerTrigger` snapshots beyond the last batch — a
    * backlogged stream catches up in bounded micro-batches instead of
    * one batch containing the whole history's files — then capped
    * again at `maxFilesPerTrigger`/`maxBytesPerTrigger` files within
    * the admitted range.
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
    val (startId, startK) = lastEnd
    val capped = maxSnapshotsPerTrigger match {
      case Some(n) if id > startId =>
        var lineage = List.empty[Long] // (startId, id] oldest-first
        var a = id
        var walking = true
        while (walking && a > startId && a >= 0) {
          // An intermediate snapshot expired while the stream was
          // backlogged is not an error: stop the walk there — the head
          // of `lineage` is then the oldest RETAINED id, and a batch
          // ending at it still carries the expired snapshots' files
          // (they live on in retained manifests with their original
          // addedBy stamps, all > startId).
          table.snapshotIfExists(a) match {
            case Some(s) => lineage = a :: lineage; a = s.parentId
            case None    => walking = false
          }
        }
        lineage.take(math.min(n, lineage.size.toLong).toInt)
          .lastOption.getOrElse(id)
      case _ => id
    }
    if (capped <= 0) return None
    if (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty)
      return Some(LongOffset(capped))
    // file/byte admission: rank the pending files (those past the last
    // offset, through `capped`) in (addedBy, path) order and take a
    // bounded prefix — always at least one file, or the stream stalls
    val endSnap = table.snapshot(capped)
    if (!endSnap.files.forall(_.addedBy > 0L)) // pre-addedBy manifests
      return Some(LongOffset(capped))          // can't rank: whole snapshots
    val pending = GraftSource.rankedFiles(endSnap.files)
      .filter { case (f, a, r) =>
        (a > startId || (a == startId && r > startK)) && a <= capped
      }
    if (pending.isEmpty)
      return if (capped > startId) Some(LongOffset(capped))
             else Some(if (startK == Long.MaxValue) LongOffset(startId)
                       else GraftFileOffset(startId, startK))
    val maxF = maxFilesPerTrigger.getOrElse(Long.MaxValue)
    val maxB = maxBytesPerTrigger.getOrElse(Long.MaxValue)
    var nF = 0L; var nB = 0L; var cut = 0
    while (cut < pending.size &&
           (cut == 0 || (nF + 1 <= maxF && nB + pending(cut)._1.bytes <= maxB))) {
      nF += 1; nB += pending(cut)._1.bytes; cut += 1
    }
    if (cut == pending.size) Some(LongOffset(capped))
    else {
      val (_, lastA, lastR) = pending(cut - 1)
      // a cut exactly between snapshots is a plain snapshot offset
      // (canonical form, so cap-on/cap-off streams share offset jsons);
      // only a true mid-snapshot cut needs the (id, k) form
      if (pending(cut)._2 > lastA) Some(LongOffset(lastA))
      else Some(GraftFileOffset(lastA, lastR))
    }
  }

  // offsets arrive as LongOffset/GraftFileOffset within a run and as
  // SerializedOffset (raw json) after a checkpoint restart
  private def parseOffset(o: Offset): (Long, Long) = o match {
    case l: LongOffset      => (l.offset, Long.MaxValue)
    case g: GraftFileOffset => (g.id, g.k)
    case other =>
      val s = other.json.trim
      if (s.startsWith("{")) {
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
        (node.get("id").asLong(), node.get("k").asLong())
      } else (s.toLong, Long.MaxValue)
  }

  /** A batch plans the files ADDED in `(start, end]` by filtering each
    * entry's `addedBy` stamp (and, under file caps, its path-rank
    * within the adding snapshot) — O(batch delta), no per-trigger
    * materialization of the start snapshot's whole file list (at 10⁷
    * table files the old set-difference rebuilt a 10⁷-entry set every
    * micro-batch). Exactly-once per FILE: a rollback that re-exposes
    * previously-deleted files does NOT re-emit them (their rows were
    * already delivered when first added). Manifests predating the
    * `addedBy` field (stamp 0) fall back to the set difference.
    */
  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val (endId, endK) = parseOffset(end)
    if (lastEnd._1 < endId || (lastEnd._1 == endId && lastEnd._2 < endK))
      lastEnd = (endId, endK)
    val endSnap = table.snapshot(endId)
    val (startId, startK) = start.map(parseOffset).getOrElse((0L, Long.MaxValue))
    val delta =
      if (endSnap.files.forall(_.addedBy > 0L))
        GraftSource.rankedFiles(endSnap.files).collect {
          case (f, a, r)
              if (a > startId || (a == startId && r > startK)) &&
                 (a < endId || (a == endId && r <= endK)) => f
        }
      else {
        val seen = start.map(o => table.snapshot(parseOffset(o)._1).files.map(_.path).toSet)
          .getOrElse(Set.empty[String])
        endSnap.files.filterNot(f => seen.contains(f.path))
      }
    org.apache.spark.sql.graft.GraftFileIndex
      .relation(spark, root, endSnap.copy(files = delta, shards = Seq.empty), isStreaming = true)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftSource[$root]"
}

object GraftSource {
  /** Each manifest file with its adding snapshot and its 1-based
    * path-rank within that snapshot — the stable total order
    * sub-snapshot offsets are defined over.
    */
  private[streaming] def rankedFiles(
      files: Seq[graft.lake.FileEntry]): Seq[(graft.lake.FileEntry, Long, Long)] =
    files.groupBy(_.addedBy).toSeq.sortBy(_._1).flatMap { case (a, fs) =>
      fs.sortBy(_.path).zipWithIndex.map { case (f, i) => (f, a, (i + 1).toLong) }
    }
}
