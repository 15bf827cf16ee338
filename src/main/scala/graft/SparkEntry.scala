package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{CoreQueries, GateQueries, LakeQueries}
import graft.pipeline.{Dedup, Multimodal, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q5MultiJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Every entry
    * first releases the [[Mat]] intermediates the PREVIOUS entry left
    * persisted (r14): a finished entry's caches are dead weight — left
    * in place they grow the CacheManager without bound across a
    * 238-entry run, and every later query (and every streaming
    * micro-batch) pays plan-matching against them. The release runs
    * inside the entry's own invocation, so each bench iteration still
    * recomputes everything from the parquet inputs.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val raw =
      CoreQueries.queries ++ TextOps.queries ++ Dedup.queries ++
        VectorOps.queries ++ Multimodal.queries ++ LakeQueries.queries ++
        GateQueries.queries ++ graft.streaming.StreamOps.queries
    raw.map { case (name, fn) =>
      name -> ((s: SparkSession, d: String) => { Mat.beginEntry(); fn(s, d) })
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ TextOps.oracles ++ Dedup.oracles ++
      VectorOps.oracles ++ Multimodal.oracles ++ LakeQueries.oracles ++
      GateQueries.oracles ++ graft.streaming.StreamOps.oracles
}
