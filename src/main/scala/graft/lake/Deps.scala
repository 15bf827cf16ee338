package graft.lake

import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, StringType}

import graft.functions.{exprs, Hashing}

/** Column-dependency transforms (reference: utils/Transforms.scala:30,
  * utils/ColumnDependenciesExprVisitor.scala). A transform must be
  * computable both as a Spark Column (write path — materializing the
  * derived partition column) and on the driver over plain Scala values
  * (scan path — rewriting a src-column predicate into a dest-column
  * value to prune partitions). Semantics:
  *
  *  - identity
  *  - truncate[n]:  string → first n chars; integral → floor to a
  *    multiple of n. Monotone ⇒ range predicates infer.
  *  - bucket[n]:    integral → ((v mod n)+n) mod n; string →
  *    ((polyHash mod n)+n) mod n. Equality-only inference. (Our own
  *    hash spec — the capability matches Iceberg bucketing; the hash
  *    function is graft's.)
  *  - sbucket[n]:   `pmod(murmur3(v), n)` with SPARK's hash — bit-for-
  *    bit [[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]]
  *    `partitionIdExpression` (Murmur3, seed 42). Equality-only
  *    inference, same as bucket[n]; the point of the Spark-native hash
  *    is the READ side: a table partitioned on an sbucket dest can
  *    truthfully claim a V1 `BucketSpec`, so joins/aggregations on the
  *    SOURCE column skip their shuffle entirely (storage-partitioned
  *    join) and Spark's own bucket pruning stays correct.
  *  - year/month/day/hour: timestamp → 1996 / 199604 / 19960412 /
  *    1996041215 as ints — each monotone in the timestamp ⇒ range
  *    predicates infer.
  */
object Deps {

  private val TruncRe = """truncate\[(\d+)\]""".r
  private val BucketRe = """bucket\[(\d+)\]""".r
  private val SBucketRe = """sbucket\[(\d+)\]""".r

  /** Bucket count of an `sbucket[n]` transform, if it is one. */
  def sparkBucketN(transform: String): Option[Int] = transform match {
    case SBucketRe(n) => Some(n.toInt)
    case _            => None
  }

  /** True if the transform preserves ordering of its input (range
    * predicates on src then translate to ranges on dest).
    */
  def monotone(transform: String): Boolean = transform match {
    case BucketRe(_)  => false
    case SBucketRe(_) => false
    case _            => true
  }

  /** Spark-side column for the write path.
    *
    * Date transforms are computed from epoch micros with
    * timezone-independent arithmetic (UTC calendar fields): plain
    * `year(ts)`/`month(ts)`/… render in the SESSION timezone, so in a
    * non-UTC session the materialized partition value would disagree
    * with the driver-side UTC inference in [[apply]] near day/hour
    * boundaries — and pruning would silently skip matching files.
    * `date_from_unix_date` + field extraction on DateType has no
    * timezone input at all, so write path and inference agree in any
    * session.
    */
  def column(transform: String, src: Column): Column = transform match {
    case "identity"   => src
    case TruncRe(n)   => substring(src, 1, n.toInt) // string truncate
    case BucketRe(n)  => pmod(exprs.polyHash(src.cast("string")), lit(n.toLong)).cast("int")
    case SBucketRe(n) => pmod(hash(src), lit(n.toInt))
    case "year"       => year(utcDate(src)).cast("int")
    case "month"      => (year(utcDate(src)) * 100 + month(utcDate(src))).cast("int")
    case "day"        =>
      (year(utcDate(src)) * 10000 + month(utcDate(src)) * 100 + dayofmonth(utcDate(src))).cast("int")
    case "hour"       =>
      (year(utcDate(src)) * 1000000 + month(utcDate(src)) * 10000 +
        dayofmonth(utcDate(src)) * 100 + utcHourOfDay(src)).cast("int")
    case t            => throw new IllegalArgumentException(s"unknown transform $t")
  }

  private val DayUs = 86400000000L

  /** UTC calendar date of a timestamp — `(us - pmod)/day` is an exact
    * small integer, so the double division is lossless.
    */
  private def utcDate(src: Column): Column = {
    val us = unix_micros(src.cast("timestamp"))
    date_from_unix_date(((us - pmod(us, lit(DayUs))) / lit(DayUs)).cast("int"))
  }

  private def utcHourOfDay(src: Column): Column =
    (pmod(unix_micros(src.cast("timestamp")), lit(DayUs)) / lit(3600000000L)).cast("int")

  /** Type-aware write-path column — pick the expression by the src
    * column's RESOLVED type:
    *
    *  - integral truncate needs modular arithmetic, string truncate a
    *    substring;
    *  - date transforms on a `DateType` source use its calendar fields
    *    directly (a date is a timezone-free day number — extracting
    *    year/month/day from it involves no zone at all). Routing dates
    *    through `cast("timestamp")` would interpret local midnight in
    *    the SESSION timezone, so east of UTC `date '2024-01-01'` lands
    *    in UTC day 2023-12-31 and the materialized partition value
    *    disagrees with the driver-side inference ([[applyTyped]]) —
    *    pruning would silently skip matching files. Only true
    *    timestamps go through `unix_micros`.
    */
  def columnTyped(transform: String, src: Column, dt: DataType): Column = transform match {
    case TruncRe(n) if dt != StringType =>
      (src - pmod(src, lit(n.toLong))).cast("long")
    case "year" if dt == DateType  => year(src).cast("int")
    case "month" if dt == DateType => (year(src) * 100 + month(src)).cast("int")
    case "day" if dt == DateType   =>
      (year(src) * 10000 + month(src) * 100 + dayofmonth(src)).cast("int")
    case "hour" if dt == DateType  => // a date has no time component: hour 0
      ((year(src) * 10000 + month(src) * 100 + dayofmonth(src)) * lit(100L)).cast("int")
    case _ => column(transform, src)
  }

  /** Back-compat shim for the boolean form. */
  def columnTyped(transform: String, src: Column, isString: Boolean): Column =
    columnTyped(transform, src,
      if (isString) StringType else org.apache.spark.sql.types.LongType)

  /** Type-aware driver-side evaluation — the exact dual of
    * [[columnTyped]]. Catalyst literals surface `DateType` values as
    * epoch-DAYS ints (timestamps as epoch-micros longs); interpreting
    * days as micros would map every date to 1970 and bucket-hash the
    * day number instead of the `yyyy-MM-dd` string the write path
    * hashes — both silently desynchronize pruning from the
    * materialized partition values.
    */
  def applyTyped(transform: String, v: Any, srcType: DataType): Any =
    if (sparkBucketN(transform).isDefined)
      sparkBucketOf(v, srcType, sparkBucketN(transform).get)
    else if (srcType != DateType) apply(transform, v)
    else {
      val days = v match {
        case l: Long => l
        case i: Int  => i.toLong
        case other   => throw new IllegalArgumentException(s"date transform on $other")
      }
      val t = java.time.LocalDate.ofEpochDay(days)
      transform match {
        case "identity" => v
        case "year"     => t.getYear
        case "month"    => t.getYear * 100 + t.getMonthValue
        case "day"      => t.getYear * 10000 + t.getMonthValue * 100 + t.getDayOfMonth
        case "hour"     => (t.getYear * 10000 + t.getMonthValue * 100 + t.getDayOfMonth) * 100
        case BucketRe(n) => // write path hashes the yyyy-MM-dd cast-to-string form
          (((Hashing.polyHashString(t.toString) % n.toInt) + n.toInt) % n.toInt)
        case tr => throw new IllegalArgumentException(s"transform $tr unsupported on DateType")
      }
    }

  /** Driver-side `sbucket[n]` — must agree BIT-FOR-BIT with the write
    * path's `pmod(hash(src), n)` (Catalyst Murmur3, seed 42) and with
    * `HashPartitioning.partitionIdExpression`, or pruning/bucketed
    * scans silently read the wrong files. Constraint values arrive
    * normalized (ints widened to Long, strings as String — see
    * [[Pruning]]), so the Catalyst-internal value is reconstructed
    * from the declared source type before hashing through the same
    * [[org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction]]
    * Catalyst itself evaluates.
    */
  private def sparkBucketOf(v: Any, srcType: DataType, n: Int): Int = {
    import org.apache.spark.sql.types._
    val internal: Any = (srcType, v) match {
      case (IntegerType | DateType, l: Long)                      => l.toInt
      case (IntegerType | DateType, i: Int)                       => i
      case (ShortType, l: Long)                                   => l.toShort
      case (ByteType, l: Long)                                    => l.toByte
      case (LongType | TimestampType | TimestampNTZType, l: Long) => l
      case (StringType, s: String) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(s)
      case (st, other) => throw new IllegalArgumentException(
        s"sbucket[$n] driver evaluation unsupported for source type $st " +
          s"(value class ${other.getClass.getSimpleName})")
    }
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      .hash(internal, srcType, 42L).toInt
    ((h % n) + n) % n
  }

  /** Driver-side evaluation over a plain Scala value (Long, Double,
    * String, or epoch-micros Long for timestamps). Must agree exactly
    * with [[columnTyped]].
    */
  def apply(transform: String, v: Any): Any = transform match {
    case "identity" => v
    case TruncRe(n) => v match {
      case s: String => s.take(n.toInt)
      case l: Long   => l - (((l % n.toInt) + n.toInt) % n.toInt)
      case i: Int    => (i - (((i % n.toInt) + n.toInt) % n.toInt)).toLong
      case other     => throw new IllegalArgumentException(s"truncate on $other")
    }
    case BucketRe(n) => v match {
      case s: String => (((Hashing.polyHashString(s) % n.toInt) + n.toInt) % n.toInt).toInt
      case l: Long   => (((Hashing.polyHashString(l.toString) % n.toInt) + n.toInt) % n.toInt).toInt
      case i: Int    => (((Hashing.polyHashString(i.toString) % n.toInt) + n.toInt) % n.toInt).toInt
      case other     => throw new IllegalArgumentException(s"bucket on $other")
    }
    case "year" | "month" | "day" | "hour" =>
      val micros = v match {
        case l: Long => l
        case other   => throw new IllegalArgumentException(s"date transform on $other")
      }
      val t = Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
        .atZone(ZoneOffset.UTC)
      transform match {
        case "year"  => t.getYear
        case "month" => t.getYear * 100 + t.getMonthValue
        case "day"   => t.getYear * 10000 + t.getMonthValue * 100 + t.getDayOfMonth
        case "hour"  => t.getYear * 1000000 + t.getMonthValue * 10000 + t.getDayOfMonth * 100 + t.getHour
      }
    case t => throw new IllegalArgumentException(s"unknown transform $t")
  }
}
