package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic micro-batch staging for the streaming entries (r13
  * optimization): write all n single-file batches from ONE partitioned
  * write job instead of one coalesce(1) write job per batch, then
  * rename to `batch-k.parquet` with ascending mod-times so the
  * FileStreamSource processing order is pinned exactly as before.
  */
private[graft] object StageFiles {
  def stage(s: SparkSession, df: DataFrame, key: Column, n: Int,
      stageDir: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val stageP = new Path(stageDir)
    val hfs = stageP.getFileSystem(conf)
    hfs.mkdirs(stageP)
    val tmp = s"$stageDir-tmp"
    // repartition BY the batch key so each batch lands as exactly one
    // file; partitionBy splits residual hash collisions per value
    df.withColumn("_k", key).repartition(col("_k"))
      .write.mode("overwrite").partitionBy("_k").parquet(tmp)
    val t0 = System.currentTimeMillis() - 3600 * 1000L
    (0 until n).foreach { k =>
      // partitionBy skips empty partition values, so a batch key with
      // zero rows produces no _k=<k> directory — fail with the batch
      // named instead of an opaque head-of-empty-array crash (r13
      // advice; the per-batch coalesce(1) writes this replaced staged
      // an empty file silently, which FileStreamSource would then
      // deliver as an empty batch the entries never intended)
      val parts = hfs.globStatus(new Path(s"$tmp/_k=$k/part-*.parquet"))
      require(parts != null && parts.nonEmpty,
        s"StageFiles.stage: batch key $k of $n has zero rows — every " +
          "staged micro-batch must be non-empty")
      val part = parts.head.getPath
      val dst = new Path(s"$stageDir/batch-$k.parquet")
      hfs.rename(part, dst)
      hfs.setTimes(dst, t0 + k * 1000L, -1)
      ()
    }
    hfs.delete(new Path(tmp), true)
    ()
  }
}
