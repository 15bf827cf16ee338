package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables (see
  * TESTDATA.md). All operators take an `sfDir` so the same code runs at
  * any scale factor; at cluster scale these would be table identifiers
  * in a catalog instead of paths.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS). How that loads depends on
    * the Spark build: older 4.x reads it as epoch-nanos LongType under
    * `spark.sql.legacy.parquet.nanosAsLong`; current 4.1.2 reads it
    * natively as TIMESTAMP_NTZ and ignores the legacy conf. Branch on
    * the type actually loaded instead of assuming one path — both
    * normalize to a microsecond TimestampType, the same truncation
    * DuckDB applies, so oracle comparisons line up. (Long path uses
    * integer DIV, not double division: ns epoch ~1.7e18 exceeds
    * double's 2^53 exact-integer range. NTZ path: the session TZ is
    * pinned UTC in Verify/Bench/specs, so the naive→instant cast is
    * oracle-exact.)
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.withColumn("ts", normalizeEventTs(raw.schema("ts").dataType))
  }

  /** Normalize a loaded events `ts` column to microsecond TimestampType
    * regardless of how this Spark surfaced the parquet TIMESTAMP(NANOS)
    * physical type. Shared with [[graft.streaming.StreamOps]].
    */
  def normalizeEventTs(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType         => timestamp_micros(expr("ts DIV 1000"))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case TimestampType    => col("ts")
      case other => throw new IllegalStateException(
        s"events.ts loaded as unexpected type $other — update Tables.normalizeEventTs")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
