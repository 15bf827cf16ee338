package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType

import graft.lake.{DeleteFileEntry, GraftTable, Snapshot}

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
  *  - `maxFilesPerTrigger` / `maxBytesPerTrigger` / `maxRowsPerTrigger`
  *    (rows budgeted from manifest counts, file-granular like Delta's)
  *    — split WITHIN a
  *    snapshot: one huge backfill commit drains across many bounded
  *    micro-batches instead of landing as one. Sub-snapshot progress is
  *    checkpointed as [[GraftFileOffset]] `(id, p)` = "all files
  *    through snapshot id, except files of id itself with path > p" —
  *    the cut is a file PATH, not a rank, so it stays stable even when
  *    a COW rewrite removes already-consumed files of a
  *    partially-streamed snapshot from later manifests; restart
  *    mid-snapshot replays exactly-once.
  *
  * Scale notes: getOffset is one version-hint read (plus O(delta)
  * cached manifest reads under admission caps); getBatch plans from
  * manifests only (no listing), and a batch's input is exactly the
  * appended files — consumers never rescan history. Content-invariant
  * rewrites (compact/auto-compact/OPTIMIZE/apply-deletes) are SKIPPED
  * when everything they repacked was already consumed
  * ([[graft.lake.GraftTable.rewriteCarrySkips]], the dataChange=false
  * contract) — so a table that is both a streaming sink with
  * `write.auto-compact=true` AND a streaming source stays
  * exactly-once. Data-CHANGING rewrites (copy-on-write
  * delete/update) still surface rewritten files as additions, same
  * contract as [[graft.lake.GraftTable.readIncremental]];
  * pure-append workloads (the streaming case) see each row once.
  * Schema is pinned at stream start (streaming requires it); evolve
  * the table ⇒ restart the stream.
  *
  * Change-data feed: `readChangeFeed=true` appends a `_change_type`
  * column and emits row-level `insert`/`delete` changes per
  * micro-batch instead of raw appends — see [[GraftSource.cdcBatch]]
  * for the commit-classification contract (`skipChangeCommits` streams
  * past copy-on-write rewrites, dropping their changes, like Delta).
  */
class GraftSourceProvider extends StreamSourceProvider {

  private def root(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft source requires option 'path'"))

  private def flag(parameters: Map[String, String], key: String): Boolean =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase(key) => v.toBoolean
    }.getOrElse(false)

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val base = schema.getOrElse(
      new GraftTable(root(parameters), sqlContext.sparkSession).schema)
    ("graft",
      if (flag(parameters, "readChangeFeed"))
        base.add(GraftSource.ChangeTypeCol, org.apache.spark.sql.types.StringType,
          nullable = false)
      else if (flag(parameters, "deletesAsRetractions"))
        base.add(GraftSource.RetractCol, org.apache.spark.sql.types.BooleanType,
          nullable = false)
      else base)
  }

  override def createSource(
      sqlContext: SQLContext, metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source = {
    val changeFeed = flag(parameters, "readChangeFeed")
    val retractions = flag(parameters, "deletesAsRetractions")
    require(!(changeFeed && retractions),
      "readChangeFeed and deletesAsRetractions are two shapes of the same " +
        "feed — pick one")
    val maxFiles = parameters.get("maxFilesPerTrigger").map(_.toLong)
    val maxBytes = parameters.get("maxBytesPerTrigger").map(_.toLong)
    val maxRows = parameters.get("maxRowsPerTrigger").map(_.toLong)
    require(!((changeFeed || retractions) &&
        (maxFiles.isDefined || maxBytes.isDefined || maxRows.isDefined)),
      "readChangeFeed/deletesAsRetractions emit whole-snapshot change sets; " +
        "maxFilesPerTrigger/maxBytesPerTrigger/maxRowsPerTrigger cannot " +
        "split a change commit — use maxSnapshotsPerTrigger for admission control")
    new GraftSource(sqlContext.sparkSession, root(parameters),
      parameters.get("maxSnapshotsPerTrigger").map(_.toLong),
      maxFiles, maxBytes, maxRows,
      changeFeed = changeFeed,
      skipChangeCommits = flag(parameters, "skipChangeCommits"),
      retractions = retractions)
  }
}

/** Sub-snapshot offset: everything through snapshot `id`, minus the
  * files ADDED BY `id` whose path sorts after `p`. Keying the cut on
  * the PATH (not a recomputed rank) keeps it stable when later commits
  * remove files of the partially-streamed snapshot. A legacy
  * checkpointed [[LongOffset]] deserializes as "all of id", so a
  * stream can turn file caps on or off across restarts.
  */
case class GraftFileOffset(id: Long, p: String) extends Offset {
  override def json: String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("id", id); node.put("p", p)
    mapper.writeValueAsString(node)
  }
}

class GraftSource(
    spark: SparkSession, root: String,
    maxSnapshotsPerTrigger: Option[Long] = None,
    maxFilesPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None,
    maxRowsPerTrigger: Option[Long] = None,
    changeFeed: Boolean = false,
    skipChangeCommits: Boolean = false,
    retractions: Boolean = false) extends Source {

  private val table = new GraftTable(root, spark)

  override val schema: StructType =
    if (changeFeed)
      table.schema.add(GraftSource.ChangeTypeCol,
        org.apache.spark.sql.types.StringType, nullable = false)
    else if (retractions)
      table.schema.add(GraftSource.RetractCol,
        org.apache.spark.sql.types.BooleanType, nullable = false)
    else table.schema

  // admission control: highest end offset handed out so far. Restart
  // recovery initializes it via the recovered-batch getBatch call
  // before the first new getOffset, so the cap is always relative to
  // real progress (the standard v1-Source rate-limit pattern).
  // (snapshot id, last consumed path within it — None = whole snapshot)
  @volatile private var lastEnd: (Long, Option[String]) = (0L, None)

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
    val (startId, startP) = lastEnd
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
    if (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty &&
        maxRowsPerTrigger.isEmpty)
      return Some(LongOffset(capped))
    // file/byte admission: rank the pending files (those past the last
    // offset, through `capped`) in (addedBy, path) order and take a
    // bounded prefix — always at least one file, or the stream stalls
    val endSnap = table.snapshot(capped)
    if (!endSnap.files.forall(_.addedBy > 0L)) // pre-addedBy manifests
      return Some(LongOffset(capped))          // can't rank: whole snapshots
    val pending = GraftSource.orderedFiles(endSnap.files)
      .filter { case (f, a) =>
        (a > startId || (a == startId && startP.exists(f.path > _))) && a <= capped
      }
    if (pending.isEmpty)
      return if (capped > startId) Some(LongOffset(capped))
             else Some(startP match {
               case None    => LongOffset(startId)
               case Some(p) => GraftFileOffset(startId, p)
             })
    val maxF = maxFilesPerTrigger.getOrElse(Long.MaxValue)
    val maxB = maxBytesPerTrigger.getOrElse(Long.MaxValue)
    // rows cap is FILE-granular like Delta's: admit whole files until
    // the manifest row budget is reached (never a partial file), and
    // always at least one file or the stream stalls
    val maxR = maxRowsPerTrigger.getOrElse(Long.MaxValue)
    var nF = 0L; var nB = 0L; var nR = 0L; var cut = 0
    while (cut < pending.size &&
           (cut == 0 || (nF + 1 <= maxF && nB + pending(cut)._1.bytes <= maxB &&
                         nR + pending(cut)._1.rows <= maxR))) {
      nF += 1; nB += pending(cut)._1.bytes; nR += pending(cut)._1.rows; cut += 1
    }
    if (cut == pending.size) Some(LongOffset(capped))
    else {
      val (lastF, lastA) = pending(cut - 1)
      // a cut exactly between snapshots is a plain snapshot offset
      // (canonical form, so cap-on/cap-off streams share offset jsons);
      // only a true mid-snapshot cut needs the (id, path) form
      if (pending(cut)._2 > lastA) Some(LongOffset(lastA))
      else Some(GraftFileOffset(lastA, lastF.path))
    }
  }

  // offsets arrive as LongOffset/GraftFileOffset within a run and as
  // SerializedOffset (raw json) after a checkpoint restart
  private def parseOffset(o: Offset): (Long, Option[String]) = o match {
    case l: LongOffset      => (l.offset, None)
    case g: GraftFileOffset => (g.id, Some(g.p))
    case other =>
      val s = other.json.trim
      if (s.startsWith("{")) {
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
        (node.get("id").asLong(), Some(node.get("p").asText()))
      } else (s.toLong, None)
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
    val (endId, endP) = parseOffset(end)
    val newer = lastEnd._1 < endId ||
      (lastEnd._1 == endId && ((lastEnd._2, endP) match {
        case (Some(a), Some(b)) => a < b
        case (Some(_), None)    => true // whole snapshot supersedes a partial cut
        case _                  => false
      }))
    if (newer) lastEnd = (endId, endP)
    val endSnap = table.snapshot(endId)
    val (startId, startP) = start.map(parseOffset).getOrElse((0L, None))
    if (changeFeed) return cdcBatch(startId, endId, endSnap)
    if (retractions) return retractionBatch(startId, endId, endSnap)
    // a file added by an in-window content-invariant rewrite (A92
    // auto-compaction, OPTIMIZE) whose repacked sources were all on
    // the consumed side of the start cut carries zero unseen rows —
    // skip it, or a table used as sink AND source re-emits every
    // packed row each time compaction fires (the dataChange=false
    // contract; rewriteCarrySkips never skips unseen content)
    lazy val startPaths =
      start.map(o => table.snapshot(parseOffset(o)._1).files.map(_.path).toSet)
        .getOrElse(Set.empty[String])
    val consumedAtStart: graft.lake.FileEntry => Boolean = f =>
      if (f.addedBy > 0L)
        f.addedBy < startId || (f.addedBy == startId && startP.forall(f.path <= _))
      else startPaths.contains(f.path) // pre-stamp manifests: membership
    val carry =
      if (start.isEmpty) Set.empty[String]
      else table.rewriteCarrySkips(startId, endId, consumedAtStart)
    val delta =
      if (endSnap.files.forall(_.addedBy > 0L))
        GraftSource.orderedFiles(endSnap.files).collect {
          case (f, a)
              if (a > startId || (a == startId && startP.exists(f.path > _))) &&
                 (a < endId || (a == endId && endP.forall(f.path <= _))) &&
                 !carry.contains(f.path) => f
        }
      else {
        val seen = start.map(o => table.snapshot(parseOffset(o)._1).files.map(_.path).toSet)
          .getOrElse(Set.empty[String])
        endSnap.files.filterNot(f => seen.contains(f.path) || carry.contains(f.path))
      }
    // a batch can span an append AND a later merge-on-read delete of
    // rows in the appended files — without the filter below those rows
    // stream out despite never having been logically visible at the end
    // offset. Only deletes committed AFTER the start offset can target
    // delta files (a delete's targets have addedBy <= the delete's own
    // stamp), so a long-pending old delete costs nothing per batch.
    val liveDels = endSnap.deleteFiles
      .filter(d => d.addedBy == 0L || d.addedBy > startId)
    val rel = org.apache.spark.sql.graft.GraftFileIndex.relation(
      spark, root, endSnap.copy(files = delta, shards = Seq.empty),
      isStreaming = true, withRowPos = liveDels.nonEmpty)
    if (liveDels.isEmpty) rel
    else {
      // the delete lists are STATIC frames, so these are plain
      // stream-static anti-joins with no state (broadcast-hinted only
      // while small — GraftTable.deleteRowsHinted/minusEqDeletes); an
      // append-only stream never retracts earlier batches.
      import org.apache.spark.sql.graft.GraftFileIndex.{PosFileCol, PosIdxCol}
      val (eqLive, rest) = liveDels.partition(_.equalityCols.nonEmpty)
      // deletion vectors (A90): a dv entry's parquet is (file_name,
      // dv, rows) bitmaps, NOT (file_name, row_index) coordinates —
      // it must go through the bitmap probe, never the position
      // anti-join. A dv entry stamped ≤ startId cannot target delta
      // files (its bitmap froze at its commit), so the same age filter
      // applies.
      val (dvLive, posLive) = rest.partition(_.dv)
      var out = rel
      if (posLive.nonEmpty) {
        val dels = table.deleteRowsHinted(endSnap.properties, posLive)
        out = out.join(dels,
          out(PosFileCol) === dels("file_name") && out(PosIdxCol) === dels("row_index"),
          "left_anti")
      }
      if (dvLive.nonEmpty)
        out = table.minusDvDeletes(out, endSnap.properties, dvLive)
      if (eqLive.nonEmpty)
        out = table.minusEqDeletes(out,
          endSnap.copy(files = delta, shards = Seq.empty), eqLive)
      out.drop(PosFileCol, PosIdxCol)
    }
  }

  // ---- change-data feed ---------------------------------------------

  private def withChangeType(df: DataFrame, t: String): DataFrame =
    df.withColumn(GraftSource.ChangeTypeCol, org.apache.spark.sql.functions.lit(t))

  /** `deletesAsRetractions=true`: the change feed re-shaped for
    * incremental-aggregate consumers — the table schema plus a boolean
    * `_graft_retract` column (false = the row was added in-window,
    * true = a merge-on-read delete/update removed this pre-window row,
    * subtract it). Downstream `foreachBatch` state updated with
    * add-on-false / remove-on-true converges to the batch table state
    * under MOR DML, which plain streaming (additions only) cannot do.
    * Same commit-classification contract as the change feed
    * ([[cdcBatch]]): COW rewrites refuse unless `skipChangeCommits`.
    */
  private def retractionBatch(startId: Long, endId: Long, endSnap: Snapshot): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    cdcBatch(startId, endId, endSnap)
      .withColumn(GraftSource.RetractCol,
        col(GraftSource.ChangeTypeCol) === lit("delete"))
      .drop(GraftSource.ChangeTypeCol)
  }

  /** Row-level changes in `(startId, endId]` as `insert` / `delete`
    * rows (an update is its delete+insert pair, like the batch
    * [[graft.lake.GraftTable.changelog]] and Iceberg's changelog scan).
    * Commit classification, per snapshot in the window:
    *
    *  - additive (append / adopt / batch tags / any merge-on-read DML):
    *    its added files are inserts, its added position-delete files
    *    are deletes of pre-window rows. Row-level reconstructible.
    *  - data-preserving rewrite (compact / optimize / apply-deletes /
    *    repartition-spec): bytes move, logical content doesn't —
    *    contributes NOTHING to the feed (emitting its rewritten files
    *    would re-insert the whole table).
    *  - data-CHANGING rewrite (copy-on-write DELETE/UPDATE/MERGE,
    *    overwrite, truncate, rollback): the removed rows are not
    *    row-level recoverable from the manifest — refuse, unless
    *    `skipChangeCommits` accepts dropping them (Delta's contract).
    *
    * Inserts and delete targets are planned from each committing
    * snapshot's OWN manifest, not the end snapshot's — an in-window
    * compaction that replaced those files in later manifests doesn't
    * lose them (the physical files live until expire).
    */
  private def cdcBatch(startId: Long, endId: Long, endSnap: Snapshot): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graft.GraftFileIndex
    import org.apache.spark.sql.graft.GraftFileIndex.{PosFileCol, PosIdxCol}
    // output order: the CONSTRUCTION-TIME table columns + _change_type
    // (derived from the pinned source schema, NOT the live table.schema
    // — a mid-stream ALTER TABLE must not change a running stream's
    // batch shape; under retractions the pinned schema carries
    // _graft_retract instead, which retractionBatch re-shapes to)
    val order = (schema.fieldNames.toSeq
      .filterNot(n => n == GraftSource.ChangeTypeCol || n == GraftSource.RetractCol)
      :+ GraftSource.ChangeTypeCol).map(col)
    // position joins keep the pos columns (dropped once every delete
    // flavor is applied); delete frames arrive broadcast-hinted or not
    // from GraftTable.deleteRowsHinted — size-gated, never unconditional
    def posJoin(rel: DataFrame, dels: DataFrame, how: String): DataFrame =
      rel.join(dels,
        rel(PosFileCol) === dels("file_name") && rel(PosIdxCol) === dels("row_index"), how)
    // hide rows a (position ++ dv ++ equality) delete set kills;
    // `files` is the addedBy-stamp universe equality sequencing reads
    def applyDels(rel: DataFrame, files: Seq[graft.lake.FileEntry],
        pos: Seq[DeleteFileEntry], eq: Seq[DeleteFileEntry],
        dv: Seq[DeleteFileEntry] = Seq.empty): DataFrame = {
      var out = rel
      if (pos.nonEmpty)
        out = posJoin(out, table.deleteRowsHinted(endSnap.properties, pos), "left_anti")
      if (dv.nonEmpty)
        out = table.minusDvDeletes(out, endSnap.properties, dv)
      if (eq.nonEmpty)
        out = table.minusEqDeletes(out, endSnap.copy(files = files, shards = Seq.empty), eq)
      out
    }
    if (startId <= 0) {
      // initial load: the end snapshot's full logical content, as inserts
      val (eqD, restD) = endSnap.deleteFiles.partition(_.equalityCols.nonEmpty)
      val (dvD, posD) = restD.partition(_.dv)
      val rel = GraftFileIndex.relation(spark, root, endSnap.copy(shards = Seq.empty),
        isStreaming = true, withRowPos = endSnap.deleteFiles.nonEmpty)
      val visible =
        if (endSnap.deleteFiles.isEmpty) rel
        else applyDels(rel, endSnap.files, posD, eqD, dvD).drop(PosFileCol, PosIdxCol)
      return withChangeType(visible, "insert").select(order: _*)
    }
    // window lineage (startId, endId], oldest-first
    var snaps = List.empty[Snapshot]
    var a = endId
    while (a > startId) {
      val s = table.snapshotIfExists(a).getOrElse(throw new IllegalStateException(
        s"changelog stream window ($startId, $endId] crosses snapshot $a, which " +
          "has been expired — the change history is gone. Retain snapshots at " +
          "least as long as stream downtime, or restart the stream."))
      snaps ::= s
      a = s.parentId
    }
    def isRewrite(s: Snapshot): Boolean =
      s.deletedFiles > 0 || s.operation == "rollback"
    snaps.find(s => isRewrite(s) && !GraftSource.DataPreservingOps.contains(s.operation))
      .foreach { s =>
        if (!skipChangeCommits) throw new UnsupportedOperationException(
          s"snapshot ${s.id} ('${s.operation}') rewrites data in place; its " +
            "row-level changes cannot be reconstructed from the manifest. Run " +
            "DML in merge-on-read mode (write.delete.mode etc.) for a " +
            "streamable change feed, or set skipChangeCommits=true to stream " +
            "past it (its changes are then silently dropped).")
      }
    val additive = snaps.filterNot(isRewrite)
    val insFiles = additive.flatMap(s => s.files.filter(_.addedBy == s.id))
      .groupBy(_.path).map(_._2.head).toSeq
    // in-window position deletes, from the committing snapshot's own
    // manifest (robust to an in-window applyDeletes folding them away);
    // pre-addedBy manifests (stamp 0) fall back to the end-minus-start diff
    val winDels: Seq[DeleteFileEntry] =
      if (snaps.exists(_.deleteFiles.exists(_.addedBy == 0L))) {
        val startDel = table.snapshot(startId).deleteFiles.map(_.path).toSet
        endSnap.deleteFiles.filterNot(d => startDel.contains(d.path))
      } else
        additive.flatMap(s => s.deleteFiles.filter(d => d.addedBy == s.id && !d.dv))
          .groupBy(_.path).map(_._2.head).toSeq
    val (winEq, winPos) = winDels.filterNot(_.dv).partition(_.equalityCols.nonEmpty)
    // deletion vectors diff by BITMAP, not by entry path (a merge
    // commit rewrites a file's vector under a new path while the old
    // entry shrinks): the in-window victims are exactly dv(end) ∖
    // dv(start) per file, reconstructed below. The END snapshot's
    // age-filtered entries are the current owners of every bitmap an
    // in-window dv commit touched (an entry stamped ≤ startId cannot
    // target in-window files).
    val winDv: Seq[DeleteFileEntry] = endSnap.deleteFiles.filter(d =>
      d.dv && (d.addedBy == 0L || d.addedBy > startId))
    val anyDels = winDels.nonEmpty || winDv.nonEmpty
    val insRel = GraftFileIndex.relation(spark, root,
      endSnap.copy(files = insFiles, shards = Seq.empty),
      isStreaming = true, withRowPos = anyDels)
    val inserts = applyDels(insRel, insFiles, winPos, winEq, winDv)
    val insTagged = withChangeType(
      if (!anyDels) inserts else inserts.drop(PosFileCol, PosIdxCol),
      "insert").select(order: _*)
    if (!anyDels) return insTagged
    def base(p: String): String = p.substring(p.lastIndexOf('/') + 1)
    // deletes committed at or before the window start — rows they
    // already killed were never visible at startId and must not re-emit
    // as pre-images (position deletes never overlap them by
    // construction, equality deletes are applied explicitly below)
    val startEq = endSnap.deleteFiles.filter(d =>
      d.equalityCols.nonEmpty && d.addedBy != 0L && d.addedBy <= startId)
    val startPos = endSnap.deleteFiles.filter(d =>
      d.equalityCols.isEmpty && d.addedBy != 0L && d.addedBy <= startId)
    // position pre-images: the target list is control-plane small by
    // design (MOR position deletes ARE the point-delete path), so
    // collecting its file names prunes the scan to the touched files
    val posPre: Option[DataFrame] =
      if (winPos.isEmpty) None
      else {
        val delRows = table.deleteRowsHinted(endSnap.properties, winPos)
        val targets = delRows.select(col("file_name")).distinct()
          .collect().map(_.getString(0)).toSet
        val preFiles = snaps.flatMap(s => s.files.filter(f =>
            targets.contains(base(f.path)) && f.addedBy <= startId))
          .groupBy(_.path).map(_._2.head).toSeq
        if (preFiles.isEmpty) None
        else {
          val preRel = GraftFileIndex.relation(spark, root,
            endSnap.copy(files = preFiles, shards = Seq.empty),
            isStreaming = true, withRowPos = true)
          val preBase = applyDels(preRel, preFiles, Seq.empty, startEq)
          Some(posJoin(preBase, delRows, "left_semi").drop(PosFileCol, PosIdxCol))
        }
      }
    // equality pre-images: no coordinates to collect — candidates come
    // from metadata key-bounds + age pruning, then the split's killed
    // half IS the delete stream (stream-static-safe joins throughout)
    val eqPre: Option[DataFrame] =
      if (winEq.isEmpty) None
      else {
        val preAll = snaps.flatMap(s => s.files.filter(_.addedBy <= startId))
          .groupBy(_.path).map(_._2.head).toSeq
        val cands = table.eqDeleteCandidates(preAll, winEq)
        if (cands.isEmpty) None
        else {
          val preRel = GraftFileIndex.relation(spark, root,
            endSnap.copy(files = cands, shards = Seq.empty),
            isStreaming = true, withRowPos = true)
          // winPos and the dv bitmaps apply here too: a row position-
          // or dv-deleted IN-WINDOW already streamed as its own delete
          // (and a row dv-dead BEFORE the window was never visible at
          // start) — letting either reach the equality split would
          // emit a pre-image twice / wrongly (a retraction consumer
          // would subtract it twice)
          val preBase = applyDels(preRel, cands, startPos ++ winPos, startEq,
            endSnap.deleteFiles.filter(_.dv))
          table.eqDeleteSplit(preBase,
              endSnap.copy(files = cands, shards = Seq.empty), winEq)._2
            .map(_.drop(PosFileCol, PosIdxCol))
        }
      }
    // dv pre-images: in-window victims = dv(end) ∖ dv(start) coordinates
    // on PRE-WINDOW files (in-window insert files were suppressed on the
    // insert side instead — Delta CDC semantics: added-and-deleted
    // in-window appears as neither). Coordinates are exact, so no
    // overlap with posPre (each victim is claimed by exactly one delete
    // mechanism: the dv scan at its commit applied all pending deletes)
    val dvPre: Option[DataFrame] =
      if (winDv.isEmpty) None
      else {
        val diff = table.dvDiffRows(
          endSnap.deleteFiles.filter(_.dv),
          table.snapshot(startId).deleteFiles.filter(_.dv))
        // touched-file pull: bounded by the dv target lists, which the
        // manifest already holds driver-side
        val targets = winDv.flatMap(_.targets).toSet
        val preFiles = snaps.flatMap(s => s.files.filter(f =>
            targets.contains(base(f.path)) && f.addedBy <= startId))
          .groupBy(_.path).map(_._2.head).toSeq
        if (preFiles.isEmpty) None
        else {
          val preRel = GraftFileIndex.relation(spark, root,
            endSnap.copy(files = preFiles, shards = Seq.empty),
            isStreaming = true, withRowPos = true)
          // startPos matters here: a position→dv CONVERSION in-window
          // makes the bitmap diff name coordinates that were already
          // position-dead at the window start — those rows were never
          // visible at startId and must not emit as deletes
          val preBase = applyDels(preRel, preFiles, startPos, startEq)
          Some(preBase.join(diff,
              preBase(PosFileCol) === diff("file_name") &&
                preBase(PosIdxCol) === diff("row_index"),
              "left_semi")
            .drop(PosFileCol, PosIdxCol))
        }
      }
    (posPre.toSeq ++ eqPre.toSeq ++ dvPre.toSeq).foldLeft(insTagged)((acc, d) =>
      acc.unionByName(withChangeType(d, "delete").select(order: _*)))
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftSource[$root]"
}

object GraftSource {

  /** Change-type column appended by `readChangeFeed=true` (values
    * `insert` | `delete`; an update is its delete+insert pair).
    */
  val ChangeTypeCol = "_change_type"

  /** Retraction flag appended by `deletesAsRetractions=true` (false =
    * add the row, true = subtract this pre-window row).
    */
  val RetractCol = "_graft_retract"

  /** Operations that rewrite bytes but preserve logical content — a
    * change feed skips them wholesale (see [[GraftSource.cdcBatch]]).
    */
  private[streaming] val DataPreservingOps: Set[String] =
    graft.lake.GraftTable.ContentInvariantOps

  /** Manifest files in (addedBy, path) order — the stable total order
    * sub-snapshot offsets are defined over. Path cuts (unlike ranks)
    * survive removal of neighboring files by later COW rewrites.
    */
  private[streaming] def orderedFiles(
      files: Seq[graft.lake.FileEntry]): Seq[(graft.lake.FileEntry, Long)] =
    files.groupBy(_.addedBy).toSeq.sortBy(_._1).flatMap { case (a, fs) =>
      fs.sortBy(_.path).map(f => (f, a))
    }
}
