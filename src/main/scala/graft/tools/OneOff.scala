package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway measurement harness: dump one driver query at a given SF
  * dir to parquet for out-of-band oracle comparison. Not part of the
  * library surface.
  */
object OneOff {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, out) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("graft-oneoff").getOrCreate()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(out)
    println(s"[oneoff] wrote $out")
    spark.stop()
  }
}
