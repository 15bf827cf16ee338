package graft.tools

import org.apache.spark.sql.SparkSession

private[graft] object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("planaudit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    def shape(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      def count(s: String) = s.r.findAllIn(p).size
      println(f"== $name%-28s exchanges=${count("Exchange")}%2d reused=${count("ReusedExchange")}%2d bhj=${count("BroadcastHashJoin")}%2d smj=${count("SortMergeJoin")}%2d cartesian=${count("CartesianProduct")}%2d bnlj=${count("BroadcastNestedLoop")}%2d")
    }
    shape("dedup_semantic_kmeans", graft.pipeline.VectorOps.semanticDedupKmeans(spark, d))
    shape("text_vocab_coverage", graft.pipeline.TextOps.vocabCoverage(spark, d))
    shape("text_boilerplate", graft.pipeline.TextOps.boilerplate(spark, d))
    shape("corpus_threshold_sweep", graft.pipeline.TextOps.thresholdSweep(spark, d))
    shape("sample_temperature", graft.pipeline.TextOps.sampleTemperature(spark, d))
    shape("sample_stratified", graft.pipeline.TextOps.sampleStratified(spark, d))
    shape("mm_video_frames", graft.pipeline.Multimodal.mmVideoFrames(spark, d))
    // the vocab must reach the corpus join as a TakeOrdered + broadcast,
    // the threshold sweep must be ONE aggregate over the scan
    println("vocab TakeOrdered: " + graft.pipeline.TextOps.vocabCoverage(spark, d)
      .queryExecution.sparkPlan.toString.contains("TakeOrderedAndProject"))
    // round-9 late additions
    shape("text_entropy", graft.pipeline.TextOps.charEntropy(spark, d))
    shape("text_ppl_buckets", graft.pipeline.TextOps.pplBuckets(spark, d))
    shape("corpus_vocab_growth", graft.pipeline.TextOps.vocabGrowth(spark, d))
    shape("dedup_containment", graft.pipeline.Dedup.containment(spark, d))
    shape("ann_sq", graft.pipeline.VectorOps.annSq(spark, d))
    shape("ann_sq bigbatch", graft.pipeline.VectorOps.annSqBatch(spark, d, 10000000L))
    shape("ann_ivfpq (residual)", graft.pipeline.VectorOps.annIvfPq(spark, d))
    shape("ann_ivfpq bigbatch", graft.pipeline.VectorOps.annIvfPqBatch(spark, d, 10000000L))
    shape("ann_pq bigbatch", graft.pipeline.VectorOps.annPqBatch(spark, d, 10000000L))
    shape("q18 (AQE)", graft.operators.CoreQueries.q18BigOrders(spark, d))
    // wave-3/4 additions
    shape("text_bm25", graft.pipeline.TextOps.bm25(spark, d))
    shape("corpus_zipf", graft.pipeline.TextOps.corpusZipf(spark, d))
    shape("dedup_span_removal", graft.pipeline.Dedup.spanRemoval(spark, d))
    shape("corpus_embedding_drift", graft.pipeline.VectorOps.embeddingDrift(spark, d))
    shape("search_hybrid_rrf", graft.pipeline.VectorOps.hybridRrf(spark, d))
    shape("text_bpe_encode", graft.pipeline.TextOps.bpeEncode(spark, d))
    // bm25's top-N must plan as TakeOrderedAndProject, never a global sort
    println("bm25 TakeOrdered: " + graft.pipeline.TextOps.bm25(spark, d)
      .queryExecution.sparkPlan.toString.contains("TakeOrderedAndProject"))
    // ppl buckets at runtime: the LM-score subtree feeds BOTH the
    // threshold aggregate and the final join — AQE must reuse the
    // exchange so the corpus is scored once, not twice
    val ppl = graft.pipeline.TextOps.pplBuckets(spark, d)
    ppl.collect()
    println("ppl buckets runtime exchange reuse: " +
      ppl.queryExecution.executedPlan.toString.contains("ReusedExchange"))
    // q18 at runtime: does AQE broadcast the tiny survivor set?
    val q18 = graft.operators.CoreQueries.q18BigOrders(spark, d)
    q18.collect()
    val after = q18.queryExecution.executedPlan.toString
    println("q18 post-AQE broadcast: " + after.contains("BroadcastHashJoin"))
    // r10 additions
    shape("sample_epochs", graft.pipeline.TextOps.sampleEpochs(spark, d))
    shape("corpus_source_overlap_sketch", graft.pipeline.Dedup.sourceOverlapSketch(spark, d))
    // the epoch planner's ONLY exchange is the |sources|-row aggregate;
    // the corpus side is scan + broadcast-join + explode
    val se = graft.pipeline.TextOps.sampleEpochs(spark, d)
    val sePlan = se.queryExecution.executedPlan.toString
    println("sample_epochs corpus shuffle-free: " +
      !sePlan.contains("SortMergeJoin") + " broadcast: " + sePlan.contains("BroadcastHashJoin"))
    // r11 additions
    shape("ann_ivfpq_persisted", graft.pipeline.AnnIndex.annIvfPqPersisted(spark, d))
    shape("text_unigram_encode", graft.pipeline.UnigramLm.unigramEncode(spark, d))
    shape("dedup_passjoin", graft.pipeline.Dedup.editDistancePairsPassJoin(spark, d))
    // dv-mode read: the delete side must be ONE broadcast bitmap join,
    // never a cartesian/nested-loop; build a small dv table inline
    locally {
      import org.apache.spark.sql.functions.col
      val root = "/root/repo/target/lakework/planaudit-dv"
      val t = graft.lake.GraftTable.create(spark, root,
        graft.Tables.orders(spark, d).repartition(col("o_orderstatus")),
        Seq("o_orderstatus"))
      t.setProperty(graft.lake.GraftTable.DeleteModeProp, "dv")
      t.delete(col("o_orderkey") % 97 === 0)
      t.delete(col("o_orderkey") % 101 === 0)
      val rd = t.read()
      shape("lake dv read", rd)
      println("dv read broadcast bitmap join: " +
        rd.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
    }
    spark.stop()
  }
}
