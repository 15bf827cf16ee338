package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.lake.GraftTable
import graft.pipeline.{AnnIndex, VectorOps}

/** C76 persisted ANN index: the build/query lifecycle contract.
  * The load-bearing assertions, in order:
  *  1. query runs launch ZERO build/encode jobs (job-group marker);
  *  2. queries are pure reads — no index-table snapshot moves;
  *  3. the answer quality matches the in-call C42 contract
  *     (dominance + completeness + recall floor vs brute force);
  *  4. append is O(delta): frozen books, untouched existing files,
  *     exactly-delta new rows, and the delta is immediately findable.
  */
class AnnIndexSpec extends SparkSpec {

  private val root = "/root/repo/target/laketest/annindex-spec"

  private def corpus = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding"))

  private def queriesDf = corpus
    .filter(col("vec_id") < VectorOps.NQueries)
    .select(col("vec_id").as("query_id"), col("embedding"))

  private def snapIds = (
    new GraftTable(s"$root/books", spark).currentId,
    new GraftTable(s"$root/codes", spark).currentId)

  test("build/query split: queries launch zero training or encode jobs and move no snapshot") {
    val buildJobs = new AtomicInteger(0)
    val queryPhaseBuildJobs = new AtomicInteger(0)
    val inQueryPhase = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val g = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (g == AnnIndex.BuildGroup) {
          buildJobs.incrementAndGet()
          if (inQueryPhase.get()) queryPhaseBuildJobs.incrementAndGet()
        }
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      AnnIndex.build(spark, corpus, root)
      Thread.sleep(500)
      assert(buildJobs.get() > 0, "build must run training/encode jobs")
      val builtSnaps = snapIds

      inQueryPhase.set(true)
      val r1 = AnnIndex.query(spark, root, corpus, queriesDf,
        VectorOps.NQueries.toLong).collect()
      val r2 = AnnIndex.query(spark, root, corpus, queriesDf,
        VectorOps.NQueries.toLong).collect()
      Thread.sleep(500)
      assert(queryPhaseBuildJobs.get() === 0,
        "query runs must launch ZERO training/encode jobs")
      assert(snapIds === builtSnaps, "queries must not commit to the index tables")
      assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq,
        "same index + same queries => identical answers")

      // quality: the C42 contract vs brute force on the same corpus
      val exact = VectorOps.annBruteforce(spark, sfDir).collect()
      val exactByQr = exact.map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) -> r.getAs[Double]("cos_sim")).toMap
      assert(r1.length === VectorOps.NQueries * VectorOps.TopK, "completeness")
      r1.foreach { r =>
        val bf = exactByQr((r.getAs[Long]("query_id"), r.getAs[Long]("rank")))
        assert(r.getAs[Double]("cos_sim") <= bf + 1e-9,
          s"dominance: approx cos must never beat exact at the same rank ($r vs $bf)")
      }
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      val recall = r1.map(key).toSet.intersect(exact.map(key).toSet).size.toDouble / exact.length
      assert(recall >= 0.5, s"persisted-index recall $recall below the C42 floor")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("append is O(delta): frozen books, existing files untouched, delta immediately findable") {
    AnnIndex.build(spark, corpus, root)
    val codesT = new GraftTable(s"$root/codes", spark)
    val booksId = new GraftTable(s"$root/books", spark).currentId
    val preFiles = codesT.current.files.map(f => f.path -> f.rows).toMap
    val preRows = codesT.current.files.map(_.rows).sum

    // delta: near-copies of two corpus vectors under fresh high ids
    // (the planted-corpus trick — last dims zeroed, cos ≈ 0.9+)
    val delta = corpus.filter(col("vec_id") < 2)
      .select((col("vec_id") + 500000000L).as("vec_id"),
        concat(slice(col("embedding"), 1, VectorOps.PlantKeepDims),
          array(Seq.fill(VectorOps.EmbDim - VectorOps.PlantKeepDims)(lit(0.0f)): _*))
          .as("embedding"))
    val nDelta = delta.count()
    AnnIndex.append(spark, delta, root)

    val t2 = new GraftTable(s"$root/codes", spark)
    assert(new GraftTable(s"$root/books", spark).currentId === booksId,
      "append must never retrain: the books table is frozen")
    assert(t2.current.operation === "append")
    val postFiles = t2.current.files.map(f => f.path -> f.rows).toMap
    preFiles.foreach { case (p, n) =>
      assert(postFiles.get(p).contains(n), s"existing index file $p must be untouched") }
    assert(postFiles.values.sum === preRows + nDelta,
      "append must add exactly the delta's rows")

    // the appended vectors are immediately findable: querying each
    // planted copy must surface its original as a high-cos neighbor
    val extended = corpus.unionByName(delta)
    val got = AnnIndex.query(spark, root, extended,
      delta.select(col("vec_id").as("query_id"), col("embedding")), nDelta)
      .collect()
    (0 until 2).foreach { i =>
      val hits = got.filter(r => r.getAs[Long]("query_id") == 500000000L + i)
        .map(r => r.getAs[Long]("neighbor_id"))
      assert(hits.contains(i.toLong),
        s"planted near-copy of vec $i must retrieve its original, got ${hits.toSeq}")
    }
  }

  test("lake-maintained index: sync encodes only the A27 snapshot delta; rewrites refuse") {
    import org.apache.spark.sql.functions.{array, concat, lit, slice}
    val corpusRoot = "/root/repo/target/laketest/annindex-corpus"
    val t = GraftTable.create(spark, corpusRoot, corpus)
    AnnIndex.buildFromTable(spark, t, root)
    val codesT = new GraftTable(s"$root/codes", spark)
    assert(codesT.properties(AnnIndex.SyncedSnapshotProp).toLong === t.currentId)
    val preFiles = codesT.current.files.map(_.path).toSet
    val preRows = codesT.current.files.map(_.rows).sum

    // no-op sync: nothing new, zero encode, watermark unchanged
    assert(AnnIndex.sync(spark, t, root) === 0L)
    assert(new GraftTable(s"$root/codes", spark).current.files.map(_.path).toSet === preFiles)

    // two appends, one sync: exactly the delta encodes
    def planted(offset: Long, take: Int) = corpus.filter(col("vec_id") < take)
      .select((col("vec_id") + offset).as("vec_id"),
        concat(slice(col("embedding"), 1, VectorOps.PlantKeepDims),
          array(Seq.fill(VectorOps.EmbDim - VectorOps.PlantKeepDims)(lit(0.0f)): _*))
          .as("embedding"))
    t.append(planted(600000000L, 2))
    t.append(planted(700000000L, 1))
    val n = AnnIndex.sync(spark, t, root)
    assert(n === 3L, s"sync must report the manifest delta, got $n")
    val t2 = new GraftTable(s"$root/codes", spark)
    assert(t2.properties(AnnIndex.SyncedSnapshotProp).toLong === t.currentId)
    preFiles.foreach(p => assert(t2.current.files.exists(_.path == p),
      s"sync must not touch existing index file $p"))
    assert(t2.current.files.map(_.rows).sum === preRows + 3L)
    // the synced rows are immediately findable through the index
    val got = AnnIndex.query(spark, root, t.read().select(col("vec_id"), col("embedding")),
      planted(600000000L, 2).select(col("vec_id").as("query_id"), col("embedding")), 2L)
      .collect()
    (0 until 2).foreach { i =>
      assert(got.filter(_.getAs[Long]("query_id") == 600000000L + i)
        .map(_.getAs[Long]("neighbor_id")).contains(i.toLong))
    }

    // a PURE delete in the window FOLDS (the dedup shape: the corpus
    // consumer deletes rows): one keyed equality delete on the codes
    // table — zero retrain, zero rewrites of existing code files, and
    // the victim never comes back as a neighbor
    val booksIdPre = new GraftTable(s"$root/books", spark).currentId
    t.delete(col("vec_id") === 600000000L)
    assert(AnnIndex.sync(spark, t, root) === 1L)
    val t3 = new GraftTable(s"$root/codes", spark)
    assert(new GraftTable(s"$root/books", spark).currentId === booksIdPre,
      "delete-fold must never retrain")
    assert(t3.properties(AnnIndex.SyncedSnapshotProp).toLong === t.currentId)
    preFiles.foreach(p => assert(t3.current.files.exists(_.path == p),
      s"delete-fold must be zero-target-I/O, rewrote $p"))
    assert(t3.current.deleteFiles.exists(_.equalityCols == Seq("n_id")),
      "the fold must land as an equality delete (O(deletes) bytes)")
    // vec 600000000 was a planted near-copy of vec 0: querying vec 0
    // must no longer surface the deleted twin
    val ghosts = AnnIndex.query(spark, root,
        t.read().select(col("vec_id"), col("embedding")),
        corpus.filter(col("vec_id") === 0L)
          .select(col("vec_id").as("query_id"), col("embedding")), 1L)
      .collect().map(_.getAs[Long]("neighbor_id"))
    assert(!ghosts.contains(600000000L),
      s"ghost neighbor survived the delete-fold: ${ghosts.toSeq}")

    // a REWRITE (same vec_id, changed vector) still refuses: the
    // frozen-codebook index cannot re-encode in place
    t.update(col("vec_id") === 700000000L, Map("embedding" ->
      concat(slice(col("embedding"), 1, VectorOps.PlantKeepDims - 2),
        array(Seq.fill(VectorOps.EmbDim - VectorOps.PlantKeepDims + 2)(lit(0.5f)): _*))))
    val ex = intercept[IllegalArgumentException] { AnnIndex.sync(spark, t, root) }
    assert(ex.getMessage.contains("rebuild"))
  }

  test("probing IS partition pruning: a single query's scan plans only its nprobe lists' files") {
    AnnIndex.build(spark, corpus, root)
    val codesT = new GraftTable(s"$root/codes", spark)
    val nFiles = codesT.current.files.size
    assert(nFiles > VectorOps.IvfProbes,
      s"precondition: more list files ($nFiles) than probes (${VectorOps.IvfProbes})")
    // one query probes IvfProbes of the nlist clusters — the codes
    // scan must plan at most that many partition files (this is the
    // A15 machinery doing ANN list selection)
    val oneQuery = corpus.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = AnnIndex.query(spark, root, corpus, oneQuery, 1L).collect()
    assert(got.length === VectorOps.TopK)
    // re-derive the probed set and check the pruned file plan directly
    val qz = AnnIndex.load(spark, root)
    val probed = {
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val centsDf = qz.cents.zipWithIndex.map { case (c, i) => (i, c) }
        .toSeq.toDF("cluster", "c_emb")
      val w = Window.partitionBy(col("query_id")).orderBy(col("c_dot").desc, col("cluster"))
      oneQuery.crossJoin(centsDf)
        .withColumn("c_dot", graft.functions.exprs.cosineSimFD(col("embedding"), col("c_emb")))
        .withColumn("prn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("prn") <= VectorOps.IvfProbes)
        .select("cluster").collect().map(_.getInt(0)).toSet
    }
    assert(probed.size === VectorOps.IvfProbes)
    val (survivors, total, _) = codesT.pruneFiles(
      col("cluster").isin(probed.toSeq.map(Int.box): _*))
    assert(total === nFiles && survivors.size <= VectorOps.IvfProbes,
      s"codes scan must prune to the probed lists: ${survivors.size}/$total")
  }

  test("driver entries: persisted results well-formed; check twin green") {
    val df = AnnIndex.annIvfPqPersisted(spark, sfDir)
    assert(df.columns.toSeq === Seq("query_id", "neighbor_id", "cos_sim", "rank"))
    assert(df.count() === VectorOps.NQueries.toLong * VectorOps.TopK)
    val chk = AnnIndex.annIvfPqPersistedCheck(spark, sfDir).collect().head
    assert(chk.getLong(0) === 0L && chk.getLong(1) === 0L,
      s"check twin must be green, got $chk")
  }

  test("index-composed hard-negative mining: invariants hold and recall >= 0.9 vs the exact miner") {
    val idx = AnnIndex.mineHardNegativesIndexed(spark, sfDir).collect()
    val exact = VectorOps.mineHardNegatives(spark, sfDir).collect()
    // every returned negative sits strictly below the near-dup ceiling
    idx.foreach(r => assert(r.getAs[Double]("cos_sim") < VectorOps.HardNegCeil,
      s"negative at/above the ceiling: $r"))
    // rank-dominance: the exact miner picks from the FULL corpus, so
    // the indexed miner's cosine can never exceed it at the same rank
    val exactByAr = exact.map(r =>
      (r.getAs[Long]("anchor_id"), r.getAs[Long]("rank")) -> r.getAs[Double]("cos_sim")).toMap
    idx.foreach { r =>
      val x = exactByAr((r.getAs[Long]("anchor_id"), r.getAs[Long]("rank")))
      assert(r.getAs[Double]("cos_sim") <= x + 1e-9,
        s"dominance: indexed cos must never beat exact at the same rank ($r vs $x)")
    }
    assert(idx.length === exact.length, "completeness: full k per anchor")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("anchor_id"), r.getAs[Long]("negative_id"))
    val recall = idx.map(key).toSet.intersect(exact.map(key).toSet)
      .size.toDouble / exact.length
    assert(recall >= 0.9, s"indexed-miner recall $recall below 0.9 vs the exact miner")
    // the check twin reports the same invariants as driver-oracled zeros
    val chk = AnnIndex.mineHardNegativesIndexedCheck(spark, sfDir).collect().head
    assert((0 to 2).forall(chk.getLong(_) == 0L), s"check twin must be green, got $chk")
  }
}
