package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A93: atomic multi-table transactions (SURVEY.md §2.A93) — commit
  * appends to N graft tables so that, after recovery, either every
  * table shows its new snapshot or none does. The single-table commit
  * protocol (stage → CAS-validated pointer swing under the table's
  * commit lock) generalizes with a durable intent record:
  *
  *  1. STAGE each append as a write-audit-publish snapshot (no lock,
  *     no pointer movement — [[GraftTable.stageAppend]]);
  *  2. take every participant's commit lock in sorted-root order
  *     (total order ⇒ deadlock-free against concurrent transactions);
  *  3. CAS-validate each table (its pointer still equals the staged
  *     snapshot's parent) — a conflict here ABORTS the whole
  *     transaction before anything published: staged snapshots and
  *     their payload files are dropped ([[GraftTable.abandonStaged]]);
  *  4. write the INTENT file — one exclusive create in the
  *     coordinator's meta dir naming every (root, stagedId, parentId).
  *     This is the commit point: before it nothing is visible, after
  *     it recovery always rolls FORWARD;
  *  5. publish every table (pointer swings, still under the locks);
  *  6. delete the intent.
  *
  * Crash semantics (the documented trade, same class as Hive ACID /
  * multi-table coordinators): a coordinator that dies between 4 and 6
  * leaves a window where some tables show the new state — atomicity is
  * restored by [[recover]], which re-publishes the rest (rebasing onto
  * any commits that landed meanwhile via the append cherry-pick) and
  * is safe to run at any time, from any process, repeatedly. A crash
  * before 4 leaves only orphaned staged snapshots (ordinary WAP
  * abandons, swept by vacuum).
  *
  * Reference scope: the reference delegates single-table commits to
  * its embedded table format and has no cross-table story; this is the
  * piece a corpus+index pipeline actually needs (e.g. a dedup DELETE
  * on the corpus and the matching ANN-index fold landing as one unit).
  */
object GraftTxn {

  import com.fasterxml.jackson.databind.ObjectMapper
  import com.fasterxml.jackson.module.scala.{ClassTagExtensions, DefaultScalaModule}
  private val Mapper: ObjectMapper with ClassTagExtensions = {
    val m = new ObjectMapper() with ClassTagExtensions
    m.registerModule(DefaultScalaModule)
    m
  }

  final case class TxnPart(root: String, stagedId: Long, parentId: Long)
  private final case class TxnRecord(parts: Seq[TxnPart], tag: String = "")

  /** Stage `df` onto each table and atomically publish all of them.
    * Returns the published snapshot ids in the caller's table order.
    * Throws `ConcurrentModificationException` if any table moved
    * between staging and the locked validation — then NOTHING was
    * published and every staged snapshot was abandoned.
    */
  def commit(spark: SparkSession, parts: Seq[(GraftTable, DataFrame)]): Seq[Long] = {
    require(parts.nonEmpty, "empty transaction")
    val staged = parts.map { case (t, df) => t -> t.stageAppend(df) }
    publishStaged(spark, staged)
    staged.map(_._2)
  }

  /** Exactly-once tagged transaction — [[GraftTable.appendBatch]]'s
    * idempotence contract lifted to N tables: a replayed micro-batch
    * whose tag was already consumed is skipped WHOLESALE (false) —
    * never a partial re-append on some member. The coordinator
    * (sorted-first table) owns the tag: its ledger is checked inside
    * the locks before the intent and recorded after the publishes,
    * member snapshots carry the tag as their operation label (closing
    * the publish→record crash window the same way appendBatch does),
    * and [[recover]] re-records the tag when it completes a crashed
    * transaction. Returns true iff this call's data landed.
    */
  def commitTagged(spark: SparkSession, tag: String,
      parts: Seq[(GraftTable, DataFrame)]): Boolean = {
    require(parts.nonEmpty, "empty transaction")
    require(tag.nonEmpty, "empty tag")
    val coord = parts.map(_._1).minBy(_.root)
    if (coord.consumedTags.contains(tag)) return false // fast path, re-checked locked
    val staged = parts.map { case (t, df) => t -> t.stageAppend(df, tag) }
    publishStagedImpl(spark, staged, Some(tag))
  }

  /** Atomically publish snapshots already staged (the WAP shape: stage,
    * audit each with [[GraftTable.readAsOfId]], then land them as one
    * unit). Participants must be distinct tables.
    */
  def publishStaged(spark: SparkSession, staged: Seq[(GraftTable, Long)]): Unit = {
    publishStagedImpl(spark, staged, None); ()
  }

  private def publishStagedImpl(spark: SparkSession,
      staged: Seq[(GraftTable, Long)], tag: Option[String]): Boolean = {
    require(staged.nonEmpty, "empty transaction")
    val sorted = staged.sortBy(_._1.root)
    require(sorted.map(_._1.root).distinct.size == sorted.size,
      "a table may appear once per transaction")
    val ps = sorted.map { case (t, sid) => (t, sid, t.snapshot(sid).parentId) }
    def withLocks[T](ts: List[GraftTable])(f: => T): T = ts match {
      case Nil => f
      case h :: rest => h.withCommitLock(withLocks(rest)(f))
    }
    def abandonAll(): Unit = ps.foreach { case (t, sid, _) =>
      try t.abandonStaged(sid)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // pre-seed the coordinator's tag ledger OUTSIDE the locks: the
    // first consumedTags on a table may fold legacy snapshot tags into
    // the ledger under the commit lock, which is not reentrant
    tag.foreach(_ => ps.head._1.consumedTags)
    withLocks(ps.map(_._1).toList) {
      // tag re-check inside the locks: a concurrent same-tag replayer
      // may have won — skip wholesale, never partially re-append
      if (tag.exists(ps.head._1.consumedTags.contains)) {
        abandonAll()
        false
      } else {
        val conflicted = ps.filter { case (t, _, pid) => t.currentId != pid }
        if (conflicted.nonEmpty) {
          // abort BEFORE the intent: nothing published, stages dropped
          abandonAll()
          throw new java.util.ConcurrentModificationException(
            s"transaction aborted: ${conflicted.map(_._1.root).mkString(", ")} " +
              "moved since staging; nothing was published")
        }
        val txnName = writeIntent(ps.map(p => (p._1, p._2)), tag)
        // commit point passed — roll forward, never back
        ps.foreach { case (t, sid, pid) => t.publishGuarded(sid, pid) }
        tag.foreach(ps.head._1.recordTag) // still under the coordinator's lock
        ps.head._1.io.delete(txnName)
        true
      }
    }
  }

  /** Write only the intent record (the commit point) without
    * publishing anything — the specs use this to construct the exact
    * crash states [[recover]] must repair. The coordinator is the
    * sorted-first participant, matching [[publishStaged]].
    */
  private[graft] def writeIntent(staged: Seq[(GraftTable, Long)],
      tag: Option[String] = None): String = {
    val sorted = staged.sortBy(_._1.root)
    val name = s"txn-${java.util.UUID.randomUUID()}.json"
    sorted.head._1.io.writeNew(name, Mapper.writeValueAsBytes(TxnRecord(
      sorted.map { case (t, sid) => TxnPart(t.root, sid, t.snapshot(sid).parentId) },
      tag.getOrElse(""))))
    name
  }

  /** Roll forward transactions whose coordinator died mid-publish:
    * every intent file under `coordinatorRoot` is replayed — tables
    * already past their staged snapshot are skipped (ancestor check),
    * tables still on the staged parent publish directly, and tables
    * that took unrelated commits in the crash window get the staged
    * append REBASED onto their current state
    * ([[GraftTable.publishCherryPick]] — sound because transaction
    * members are appends). Idempotent; returns the number of
    * transactions completed.
    */
  /** Has `sid` been published on `t` — i.e. is it current or an
    * ancestor of current? Shared by [[recover]] and [[txnsView]].
    */
  private def isPublished(t: GraftTable, sid: Long): Boolean = {
    var a = t.currentId
    while (a >= 0) {
      if (a == sid) return true
      a = t.snapshotIfExists(a).map(_.parentId).getOrElse(-1L)
    }
    false
  }

  /** `$txns` metadata view: the in-flight (crashed-coordinator)
    * transactions recorded under `coordinatorRoot`'s meta dir — one
    * row per participant with its roll-forward state. Empty on a
    * healthy table; any `pending` row is an invitation to run
    * `CALL system.recover_txns(...)`. Bounded by construction: intent
    * files exist only between a commit point and its cleanup.
    */
  def txnsView(spark: SparkSession, coordinatorRoot: String): DataFrame = {
    import spark.implicits._
    val coord = new GraftTable(coordinatorRoot, spark)
    val rows = coord.io.listNames().filter(_.startsWith("txn-")).sorted.flatMap { n =>
      val rec0 = Mapper.readValue[TxnRecord](coord.io.readBytes(n))
      val rec = if (rec0.tag == null) rec0.copy(tag = "") else rec0
      rec.parts.map { p =>
        val t = new GraftTable(p.root, spark)
        (n, rec.tag, p.root, p.stagedId, p.parentId,
          if (isPublished(t, p.stagedId)) "published" else "pending")
      }
    }
    rows.toDF("txn_file", "tag", "table_root", "staged_id", "parent_id", "state")
  }

  def recover(spark: SparkSession, coordinatorRoot: String): Int = {
    val coord = new GraftTable(coordinatorRoot, spark)
    val txns = coord.io.listNames().filter(_.startsWith("txn-")).sorted
    txns.foreach { n =>
      val rec0 = Mapper.readValue[TxnRecord](coord.io.readBytes(n))
      val rec = if (rec0.tag == null) rec0.copy(tag = "") else rec0 // pre-tag intents
      rec.parts.foreach { p =>
        val t = new GraftTable(p.root, spark)
        if (!isPublished(t, p.stagedId)) { t.publishCherryPick(p.stagedId); () }
      }
      // the completed transaction's tag becomes durable on the
      // coordinator, closing the publish→record crash window
      if (rec.tag.nonEmpty) {
        val ct = new GraftTable(rec.parts.map(_.root).min, spark)
        ct.consumedTags // pre-seed the ledger OUTSIDE the lock (seeding locks; the lock is not reentrant)
        ct.withCommitLock {
          if (!ct.consumedTags.contains(rec.tag)) ct.recordTag(rec.tag)
        }
      }
      coord.io.delete(n)
    }
    txns.size
  }
}
