package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{CoreQueries, GateQueries, LakeQueries}
import graft.pipeline.{Dedup, Multimodal, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q5MultiJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ TextOps.queries ++ Dedup.queries ++
      VectorOps.queries ++ Multimodal.queries ++ LakeQueries.queries ++
      GateQueries.queries ++ graft.streaming.StreamOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ TextOps.oracles ++ Dedup.oracles ++
      VectorOps.oracles ++ Multimodal.oracles ++ LakeQueries.oracles ++
      GateQueries.oracles ++ graft.streaming.StreamOps.oracles
}
