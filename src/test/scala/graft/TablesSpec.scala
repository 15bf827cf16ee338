package graft

import org.apache.spark.sql.types._

/** Loader contract: every `Tables.names` table loads at sf0.001 with
  * nonzero rows, and the columns downstream operators depend on carry
  * the types they assume. This is the canary for environment shifts in
  * how Spark surfaces parquet physical types — e.g. the Spark 4.1.2
  * change that reads TIMESTAMP(NANOS) natively as TIMESTAMP_NTZ and
  * ignores `spark.sql.legacy.parquet.nanosAsLong`, which silently broke
  * every events consumer until the loader branched on the loaded type.
  * A failure here means "fix the loader", not 13 call sites.
  */
class TablesSpec extends SparkSpec {

  test("every table loads with nonzero rows") {
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sfDir, n)
      assert(df.limit(1).count() == 1, s"table $n is empty or unreadable")
    }
  }

  test("events.ts normalizes to microsecond TimestampType") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts loaded as ${ev.schema("ts").dataType}; " +
        "Tables.normalizeEventTs must branch on this Spark's parquet TIMESTAMP(NANOS) surface type")
    // the ts range must be sane epoch-micros (not nanos misread as micros):
    // any plausible testdata timestamp is between 2000 and 2100.
    val row = ev.selectExpr("min(ts) as lo", "max(ts) as hi").head()
    val lo = row.getAs[java.sql.Timestamp]("lo").toInstant
    val hi = row.getAs[java.sql.Timestamp]("hi").toInstant
    assert(lo.isAfter(java.time.Instant.parse("2000-01-01T00:00:00Z")) &&
      hi.isBefore(java.time.Instant.parse("2100-01-01T00:00:00Z")),
      s"events.ts range [$lo, $hi] is outside sane epoch bounds — unit mixup in normalization")
  }

  test("key columns carry the types operators assume") {
    def typeOf(t: String, c: String): DataType =
      Tables.load(spark, sfDir, t).schema(c).dataType
    // date columns arrive as parquet DATE or timestamp[us] NTZ depending
    // on the generator; both compare correctly against date literals,
    // which is all downstream queries assume.
    def dateComparable(dt: DataType): Boolean =
      dt == DateType || dt == TimestampNTZType || dt == TimestampType
    assert(typeOf("lineitem", "l_quantity").isInstanceOf[NumericType])
    assert(dateComparable(typeOf("lineitem", "l_shipdate")),
      s"l_shipdate: ${typeOf("lineitem", "l_shipdate")}")
    assert(dateComparable(typeOf("orders", "o_orderdate")),
      s"o_orderdate: ${typeOf("orders", "o_orderdate")}")
    assert(typeOf("documents", "text") == StringType)
    assert(typeOf("embeddings", "embedding") == ArrayType(FloatType, containsNull = true) ||
      typeOf("embeddings", "embedding").isInstanceOf[ArrayType])
    assert(typeOf("events", "value").isInstanceOf[NumericType])
    assert(typeOf("events", "props") == StringType)
  }
}
