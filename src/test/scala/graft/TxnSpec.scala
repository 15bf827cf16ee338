package graft

import org.apache.spark.sql.functions._

import graft.lake.{GraftTable, GraftTxn}

/** A93 multi-table transactions: atomicity, conflict abort, and every
  * crash-window recovery shape (none published, some published,
  * concurrent commits in the window).
  */
class TxnSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val p = s"/root/repo/target/laketest/txn-$name"
    val f = new java.io.File(p)
    if (f.exists()) { import scala.sys.process._; Seq("rm", "-rf", p).!; () }
    p
  }

  private def o = Tables.orders(spark, sfDir)
  private def slice(lo: Long, hi: Long) =
    o.filter(col("o_orderkey") >= lo && col("o_orderkey") < hi)
      .repartition(col("o_orderstatus"))
  private def keys(t: GraftTable): Set[Long] =
    t.read().select("o_orderkey").collect().map(_.getLong(0)).toSet
  private def keysOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("o_orderkey").collect().map(_.getLong(0)).toSet

  test("commit lands on every table as one unit; conflict aborts publish NOTHING") {
    val t1 = GraftTable.create(spark, tmp("a1"), slice(0, 500), Seq("o_orderstatus"))
    val t2 = GraftTable.create(spark, tmp("a2"), slice(5000, 5500), Seq("o_orderstatus"))
    val ids = GraftTxn.commit(spark, Seq(t1 -> slice(500, 1000), t2 -> slice(5500, 6000)))
    assert(ids.size === 2)
    assert(t1.currentId === ids.head && t2.currentId === ids(1))
    assert(keys(t1) === keysOf(slice(0, 1000)))
    assert(keys(t2) === keysOf(slice(5000, 6000)))
    // conflict: t2 moves between staging and publish
    val s1 = t1.stageAppend(slice(1000, 1500))
    val s2 = t2.stageAppend(slice(6000, 6500))
    t2.append(slice(9000, 9200))
    intercept[java.util.ConcurrentModificationException] {
      GraftTxn.publishStaged(spark, Seq(t1 -> s1, t2 -> s2))
    }
    // neither table shows the aborted content; stages are gone
    assert(keys(t1) === keysOf(slice(0, 1000)))
    assert(keys(t2) === keysOf(slice(5000, 6000)) ++ keysOf(slice(9000, 9200)))
    assert(!t1.snapshotIds.contains(s1) && !t2.snapshotIds.contains(s2),
      "aborted stages must be abandoned")
  }

  test("recovery rolls FORWARD from the intent: none-published and some-published crashes") {
    val t1 = GraftTable.create(spark, tmp("r1"), slice(0, 500), Seq("o_orderstatus"))
    val t2 = GraftTable.create(spark, tmp("r2"), slice(5000, 5500), Seq("o_orderstatus"))
    val coord = Seq(t1, t2).minBy(_.root).root
    // crash AFTER the intent, before ANY publish
    val s1 = t1.stageAppend(slice(500, 1000))
    val s2 = t2.stageAppend(slice(5500, 6000))
    GraftTxn.writeIntent(Seq(t1 -> s1, t2 -> s2))
    assert(GraftTxn.recover(spark, coord) === 1)
    assert(keys(t1) === keysOf(slice(0, 1000)) && keys(t2) === keysOf(slice(5000, 6000)))
    // crash after ONE publish
    val s3 = t1.stageAppend(slice(1000, 1500))
    val s4 = t2.stageAppend(slice(6000, 6500))
    GraftTxn.writeIntent(Seq(t1 -> s3, t2 -> s4))
    t1.publish(s3) // coordinator died here
    assert(GraftTxn.recover(spark, coord) === 1)
    assert(keys(t1) === keysOf(slice(0, 1500)) && keys(t2) === keysOf(slice(5000, 6500)))
    // idempotent: nothing left to repair
    assert(GraftTxn.recover(spark, coord) === 0)
  }

  test("tagged transactions are exactly-once across replays AND across the recovery path") {
    val t1 = GraftTable.create(spark, tmp("g1"), slice(0, 500), Seq("o_orderstatus"))
    val t2 = GraftTable.create(spark, tmp("g2"), slice(5000, 5500), Seq("o_orderstatus"))
    val coord = Seq(t1, t2).minBy(_.root)
    assert(GraftTxn.commitTagged(spark, "b-1",
      Seq(t1 -> slice(500, 1000), t2 -> slice(5500, 6000))))
    // replay of a consumed tag is skipped WHOLESALE, both tables untouched
    val (c1, c2) = (t1.currentId, t2.currentId)
    assert(!GraftTxn.commitTagged(spark, "b-1",
      Seq(t1 -> slice(500, 1000), t2 -> slice(5500, 6000))))
    assert(t1.currentId === c1 && t2.currentId === c2)
    assert(keys(t1) === keysOf(slice(0, 1000)))
    // crash window: intent written with the tag, nothing published —
    // recovery completes the txn AND makes the tag durable, so a
    // subsequent replay of the same batch is still recognized
    val s1 = t1.stageAppend(slice(1000, 1500), "b-2")
    val s2 = t2.stageAppend(slice(6000, 6500), "b-2")
    GraftTxn.writeIntent(Seq(t1 -> s1, t2 -> s2), Some("b-2"))
    assert(GraftTxn.recover(spark, coord.root) === 1)
    assert(keys(t1) === keysOf(slice(0, 1500)) && keys(t2) === keysOf(slice(5000, 6500)))
    assert(!GraftTxn.commitTagged(spark, "b-2",
      Seq(t1 -> slice(1000, 1500), t2 -> slice(6000, 6500))),
      "a tag completed by RECOVERY must still be recognized on replay")
    assert(keys(t1) === keysOf(slice(0, 1500)), "recovery-completed batch re-appended")
  }

  test("recovery rebases the unpublished half onto commits that landed in the crash window") {
    val t1 = GraftTable.create(spark, tmp("c1"), slice(0, 500), Seq("o_orderstatus"))
    val t2 = GraftTable.create(spark, tmp("c2"), slice(5000, 5500), Seq("o_orderstatus"))
    val coord = Seq(t1, t2).minBy(_.root).root
    val s1 = t1.stageAppend(slice(500, 1000))
    val s2 = t2.stageAppend(slice(5500, 6000))
    GraftTxn.writeIntent(Seq(t1 -> s1, t2 -> s2))
    t1.publish(s1) // partial publish, then crash...
    t2.append(slice(9000, 9200)) // ...and an unrelated writer lands on t2
    assert(GraftTxn.recover(spark, coord) === 1)
    // the staged append was cherry-picked ON TOP of the foreign commit:
    // all three slices present, exactly once
    val k2 = t2.read().select("o_orderkey").collect().map(_.getLong(0))
    assert(k2.length === k2.distinct.length, "rebase must not duplicate rows")
    assert(k2.toSet ===
      keysOf(slice(5000, 6000)) ++ keysOf(slice(9000, 9200)))
    assert(keys(t1) === keysOf(slice(0, 1000)))
  }
}
