package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** RDD-level persistence for a DataFrame WITH LINEAGE KEPT (r14).
  *
  * `Dataset.localCheckpoint` materializes the physical plan's
  * InternalRow RDD but TRUNCATES lineage (executor loss = job
  * failure); `Dataset.persist` goes through the SQL CacheManager,
  * whose columnar encode/decode is expensive for array-typed columns
  * and whose entries tax every later plan with cache-lookup matching.
  * This helper takes the exact middle: persist the plan's InternalRow
  * RDD (deserialized in memory, spill-to-disk, FULL lineage back to
  * the parquet scans — a lost block recomputes, guide §5) and wrap it
  * back as a DataFrame the same way localCheckpoint does
  * (LogicalRDD.fromDataset preserves output partitioning + ordering,
  * so downstream same-key joins stay exchange-free).
  *
  * Lives under org.apache.spark.sql because Dataset.ofRows and
  * LogicalRDD are private[sql] — the same internals Dataset.checkpoint
  * itself is built from (public Apache Spark source).
  */
object MatShim {
  def persistedView(df: org.apache.spark.sql.DataFrame,
      level: StorageLevel): (org.apache.spark.sql.DataFrame, () => Unit) = {
    val ds = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    // copy() before caching: operators reuse row buffers, cached rows
    // must own their bytes (the Dataset.checkpoint convention)
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.persist(level)
    val out = Dataset.ofRows(ds.sparkSession,
      LogicalRDD.fromDataset(rdd, ds, isStreaming = false))
    (out.asInstanceOf[org.apache.spark.sql.DataFrame],
      () => { rdd.unpersist(blocking = false); () })
  }
}
