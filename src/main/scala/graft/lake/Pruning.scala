package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Driver-side file pruning: predicate → per-column constraints →
  * partition-value tests, column-dependency inference, and min/max
  * stats tests (reference: IceTableScanExec.scala prunes from Iceberg
  * manifests + ParquetMetrics; planning/CreateTableRules rewrites
  * predicates through columnDependencies).
  *
  * Extraction is *conservative*: any sub-expression it doesn't
  * understand contributes no constraint (file kept). Only top-level
  * conjuncts prune. Comparable domains: Long (ints + timestamp
  * micros), Double, String.
  */
object Pruning {

  /** Closed constraint for one column: optional eq-set (from =/IN) and
    * an optional interval. `impossible` ⇒ the whole scan is empty.
    */
  final case class Constraint(
      eqs: Option[Set[Any]] = None,
      lo: Option[(Any, Boolean)] = None, // (bound, inclusive)
      hi: Option[(Any, Boolean)] = None,
      nullness: Option[Boolean] = None) { // Some(true)=IS NULL, Some(false)=IS NOT NULL

    def and(o: Constraint): Constraint = {
      val mergedEqs = (eqs, o.eqs) match {
        case (Some(a), Some(b)) => Some(a.intersect(b))
        case (a, b)             => a.orElse(b)
      }
      // IS NULL ∧ IS NOT NULL: no value satisfies — encode via empty eq-set
      val conflict = (for (a <- nullness; b <- o.nullness) yield a != b).getOrElse(false)
      Constraint(
        if (conflict) Some(Set.empty[Any]) else mergedEqs,
        tighter(lo, o.lo, isLo = true),
        tighter(hi, o.hi, isLo = false),
        nullness.orElse(o.nullness))
    }

    private def nullConflict: Boolean =
      nullness.contains(true) &&
        (eqs.exists(_.nonEmpty) || lo.isDefined || hi.isDefined)

    def impossible: Boolean = {
      val eqEmpty = eqs.exists(_.isEmpty)
      val eqOut = eqs.exists(es => es.nonEmpty && !es.exists(inInterval))
      val loHi = (for { (l, li) <- lo; (h, hi2) <- hi } yield {
        val c = cmp(l, h)
        c > 0 || (c == 0 && !(li && hi2))
      }).getOrElse(false)
      eqEmpty || eqOut || loHi || nullConflict
    }

    def inInterval(v: Any): Boolean = {
      val okLo = lo.forall { case (b, inc) => val c = cmp(v, b); c > 0 || (c == 0 && inc) }
      val okHi = hi.forall { case (b, inc) => val c = cmp(v, b); c < 0 || (c == 0 && inc) }
      okLo && okHi
    }

    /** Does a value range [mn, mx] possibly satisfy this constraint?
      * `cp` lets stats-based callers compare in the ordering the range
      * was computed under (parquet string stats are UTF-8 byte order,
      * not String.compareTo's UTF-16 order).
      */
    def overlaps(mn: Any, mx: Any, cp: (Any, Any) => Int = cmp): Boolean = {
      val okEq = eqs.forall(_.exists(v => cp(v, mn) >= 0 && cp(v, mx) <= 0))
      val okLo = lo.forall { case (b, inc) => val c = cp(mx, b); c > 0 || (c == 0 && inc) }
      val okHi = hi.forall { case (b, inc) => val c = cp(mn, b); c < 0 || (c == 0 && inc) }
      okEq && okLo && okHi
    }

    /** Does a single (partition) value satisfy this constraint?
      * Three-valued-logic aware: null satisfies only a pure IS NULL
      * constraint; every comparison/IN rejects null.
      */
    def accepts(v: Any): Boolean =
      if (v == null)
        nullness.contains(true) && !eqs.exists(_.nonEmpty) && lo.isEmpty && hi.isEmpty
      else
        !nullness.contains(true) &&
          eqs.forall(_.exists(e => cmp(e, v) == 0)) && inInterval(v)
  }

  private def tighter(a: Option[(Any, Boolean)], b: Option[(Any, Boolean)], isLo: Boolean) =
    (a, b) match {
      case (Some((av, ai)), Some((bv, bi))) =>
        val c = cmp(av, bv)
        if (c == 0) Some((av, ai && bi))
        else if ((c > 0) == isLo) Some((av, ai))
        else Some((bv, bi))
      case (x, y) => x.orElse(y)
    }

  /** Total order across the three domains (mixed types never compared
    * in practice — extraction normalizes per column).
    */
  def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long)     => java.lang.Long.compare(x, y)
    case (x: Long, y: Double)   => java.lang.Double.compare(x.toDouble, y)
    case (x: Double, y: Long)   => java.lang.Double.compare(x, y.toDouble)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case _ => throw new IllegalArgumentException(s"incomparable: $a vs $b")
  }

  /** Normalize a foldable catalyst literal to Long / Double / String. */
  private def litValue(e: Expression): Option[Any] =
    if (!e.foldable) None
    else (e.eval(null), e.dataType) match {
      case (null, _)                 => None
      case (v: UTF8String, _)        => Some(v.toString)
      case (v: Long, _)              => Some(v)
      case (v: Int, _)               => Some(v.toLong)
      case (v: Short, _)             => Some(v.toLong)
      case (v: Byte, _)              => Some(v.toLong)
      case (v: Double, _)            => Some(v)
      case (v: Float, _)             => Some(v.toDouble)
      case (v: Boolean, _)           => Some(v.toString)
      case _                         => None
    }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: AttributeReference  => Some(a.name)
    case Cast(c, _, _, _)       => attrName(c) // cast(col) comparisons still constrain col conservatively? no — skip
    case _                      => None
  }

  /** Extract per-column constraints from the top-level conjuncts. */
  def extract(pred: Column): Map[String, Constraint] = extract(Shim.expression(pred))

  def extract(e: Expression): Map[String, Constraint] = e match {
    // Columns built from unresolved attrs arrive as UnresolvedFunction
    // nodes (the ColumnNode converter does not resolve operators to
    // catalyst classes) — normalize them first.
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.length == 1 && f.arguments.length == 2 =>
      val Seq(a, b) = f.arguments
      f.nameParts.head.toLowerCase match {
        case "and" => extract(And(a, b))
        case "="   => extract(EqualTo(a, b))
        case ">"   => extract(GreaterThan(a, b))
        case ">="  => extract(GreaterThanOrEqual(a, b))
        case "<"   => extract(LessThan(a, b))
        case "<="  => extract(LessThanOrEqual(a, b))
        case "in"  => extract(In(a, Seq(b)))
        case _     => Map.empty
      }
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.length == 1 && f.nameParts.head.equalsIgnoreCase("in") &&
          f.arguments.length >= 2 =>
      extract(In(f.arguments.head, f.arguments.tail))
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.length == 1 && f.arguments.length == 1 =>
      f.nameParts.head.toLowerCase match {
        case "isnull"    => extract(IsNull(f.arguments.head))
        case "isnotnull" => extract(IsNotNull(f.arguments.head))
        case _           => Map.empty
      }
    case And(l, r) =>
      val a = extract(l); val b = extract(r)
      (a.keySet ++ b.keySet).map { k =>
        k -> (a.get(k), b.get(k)) match {
          case (k2, (Some(x), Some(y))) => k2 -> x.and(y)
          case (k2, (x, y))             => k2 -> x.orElse(y).get
        }
      }.toMap
    case EqualTo(a, v) if attrIsPlain(a) && litValue(v).isDefined =>
      one(a, Constraint(eqs = Some(Set(litValue(v).get))))
    case EqualTo(v, a) if attrIsPlain(a) && litValue(v).isDefined =>
      one(a, Constraint(eqs = Some(Set(litValue(v).get))))
    case GreaterThan(a, v) if attrIsPlain(a) && litValue(v).isDefined =>
      one(a, Constraint(lo = Some((litValue(v).get, false))))
    case GreaterThan(v, a) if attrIsPlain(a) && litValue(v).isDefined =>
      one(a, Constraint(hi = Some((litValue(v).get, false))))
    case GreaterThanOrEqual(a, v) if attrIsPlain(a) && litValue(v).isDefined =>
      one(a, Constraint(lo = Some((litValue(v).get, true))))
    case GreaterThanOrEqual(v, a) if attrIsPlain(a) && litValue(v).isDefined =>
      one(a, Constraint(hi = Some((litValue(v).get, true))))
    case LessThan(a, v) if attrIsPlain(a) && litValue(v).isDefined =>
      one(a, Constraint(hi = Some((litValue(v).get, false))))
    case LessThan(v, a) if attrIsPlain(a) && litValue(v).isDefined =>
      one(a, Constraint(lo = Some((litValue(v).get, false))))
    case LessThanOrEqual(a, v) if attrIsPlain(a) && litValue(v).isDefined =>
      one(a, Constraint(hi = Some((litValue(v).get, true))))
    case LessThanOrEqual(v, a) if attrIsPlain(a) && litValue(v).isDefined =>
      one(a, Constraint(lo = Some((litValue(v).get, true))))
    case In(a, vs) if attrIsPlain(a) && vs.forall(litValue(_).isDefined) =>
      one(a, Constraint(eqs = Some(vs.flatMap(litValue).toSet)))
    case IsNull(a) if attrIsPlain(a) =>
      one(a, Constraint(nullness = Some(true)))
    case IsNotNull(a) if attrIsPlain(a) =>
      one(a, Constraint(nullness = Some(false)))
    case _ => Map.empty // ORs, UDFs, casts-on-attr, …: no pruning
  }

  def extractExact(pred: Column): Option[Map[String, Constraint]] =
    extractExact(Shim.expression(pred))

  /** Exactness-tracking extraction: Some(constraints) only when the
    * WHOLE predicate is representable as the returned per-column
    * conjunction — i.e. constraints ⟺ predicate, not merely ⟸. Needed
    * by metadata-only deletes, where an over-approximation would drop
    * rows the predicate doesn't cover. Any unrecognized node ⇒ None.
    */
  def extractExact(e: Expression): Option[Map[String, Constraint]] = e match {
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.length == 1 && f.arguments.length == 2 &&
          Set("and", "=", ">", ">=", "<", "<=", "in")(f.nameParts.head.toLowerCase) =>
      extractExact(normalizeFn(f))
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.length == 1 && f.arguments.length == 1 &&
          Set("isnull", "isnotnull")(f.nameParts.head.toLowerCase) =>
      if (f.nameParts.head.equalsIgnoreCase("isnull")) extractExact(IsNull(f.arguments.head))
      else extractExact(IsNotNull(f.arguments.head))
    case And(l, r) =>
      for (a <- extractExact(l); b <- extractExact(r)) yield mergeAnd(a, b)
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: In | _: IsNull | _: IsNotNull =>
      val m = extract(e)
      if (m.nonEmpty) Some(m) else None // recognized shape but opaque operand
    case _ => None
  }

  private def normalizeFn(
      f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction): Expression = {
    val Seq(a, b) = f.arguments
    f.nameParts.head.toLowerCase match {
      case "and" => And(a, b)
      case "="   => EqualTo(a, b)
      case ">"   => GreaterThan(a, b)
      case ">="  => GreaterThanOrEqual(a, b)
      case "<"   => LessThan(a, b)
      case "<="  => LessThanOrEqual(a, b)
      case "in"  => In(a, Seq(b))
    }
  }

  private def mergeAnd(
      a: Map[String, Constraint], b: Map[String, Constraint]): Map[String, Constraint] =
    (a.keySet ++ b.keySet).map { k =>
      (a.get(k), b.get(k)) match {
        case (Some(x), Some(y)) => k -> x.and(y)
        case (x, y)             => k -> x.orElse(y).get
      }
    }.toMap

  private def attrIsPlain(e: Expression): Boolean = e match {
    case _: UnresolvedAttribute | _: AttributeReference => true
    case _ => false
  }
  private def one(a: Expression, c: Constraint): Map[String, Constraint] =
    attrName(a).map(n => Map(n -> c)).getOrElse(Map.empty)

  /** Spark's directory name for a null partition value. */
  val HiveNullPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Parse a partition-directory string value into the comparable
    * domain of the given data type; the Hive null sentinel parses to
    * null for every type (a bare toLong would throw and brick reads).
    */
  def parsePartitionValue(raw: String, dt: DataType): Any =
    if (raw == HiveNullPartition) null
    else dt match {
      case LongType | IntegerType | ShortType | ByteType => raw.toLong
      case DoubleType | FloatType                        => raw.toDouble
      // temporal partition dirs hold the Spark-written string
      // ("2024-01-05", "2024-01-05 12:30:00") while litValue normalizes
      // DATE/TIMESTAMP literals to epoch-days/micros Longs — comparing
      // the raw string against those throws "incomparable", bricking
      // every partition-pruned scan with a temporal predicate. Parse to
      // the same Long domain (timestamps in the session timezone, the
      // convention Spark's PartitioningUtils applies).
      case DateType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .stringToDate(UTF8String.fromString(raw))
          .map(_.toLong).getOrElse(raw: Any)
      case TimestampType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .stringToTimestamp(UTF8String.fromString(raw),
            org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(
              org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
          .getOrElse(raw: Any)
      case TimestampNTZType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .stringToTimestampWithoutTimeZone(UTF8String.fromString(raw))
          .getOrElse(raw: Any)
      case _                                             => raw
    }

  /** Push constraints through column dependencies: a constraint on
    * `src` becomes a constraint on `dest` (partition column). Equality
    * sets always map; intervals map only through monotone transforms.
    * `srcTypes` disambiguates the literal encoding per source column —
    * DateType literals are epoch-days, timestamps epoch-micros
    * (see [[Deps.applyTyped]]); callers pass the snapshot schema.
    */
  def inferThroughDeps(
      cs: Map[String, Constraint], deps: Seq[DepSpec],
      srcTypes: Map[String, DataType] = Map.empty): Map[String, Constraint] = {
    val inferred = deps.flatMap { dep =>
      cs.get(dep.src).flatMap { c =>
        val st = srcTypes.getOrElse(dep.src, NullType)
        // sbucket's driver-side murmur3 needs the declared source type
        // to rebuild the Catalyst-internal value; without it, skip the
        // inference (conservative: the file is kept, never dropped)
        if (Deps.sparkBucketN(dep.transform).isDefined && st == NullType) None
        else try {
        def mapped(v: Any): Any =
          toComparable(Deps.applyTyped(dep.transform, fromComparable(v), st))
        val eqMapped = c.eqs.map(_.map(mapped))
        if (Deps.monotone(dep.transform)) {
          // monotone transforms are all null-preserving, so src
          // nullness carries to the destination column verbatim
          val lo2 = c.lo.map { case (v, _) => (mapped(v), true) }
          val hi2 = c.hi.map { case (v, _) => (mapped(v), true) }
          Some(dep.dest -> Constraint(eqMapped, lo2, hi2, c.nullness))
        } else Deps.sparkBucketN(dep.transform) match {
          case Some(n) =>
            // sbucket is NOT null-preserving: Catalyst's Murmur3Hash of
            // a null input returns the seed (42), so null sources land
            // in bucket pmod(42, n) and the dest is never null. src IS
            // NULL therefore maps to dest = 42 % n (carrying IS NULL
            // verbatim would prune the very files holding those rows);
            // src IS NOT NULL yields no dest constraint at all.
            if (c.nullness.contains(true))
              Some(dep.dest -> Constraint(eqs = Some(Set[Any]((42 % n).toLong))))
            else if (eqMapped.isDefined)
              Some(dep.dest -> Constraint(eqs = eqMapped))
            else None
          case None =>
            if (eqMapped.isDefined || c.nullness.isDefined)
              Some(dep.dest -> Constraint(eqs = eqMapped, nullness = c.nullness))
            else None
        }
        } catch {
          // a transform the driver can't evaluate for this source type
          // (e.g. sbucket on a double column of a pre-validation table)
          // must never fail the read — skip the inference instead
          // (conservative: the file is kept, never dropped)
          case _: IllegalArgumentException => None
        }
      }
    }.toMap
    // inferred constraints are additive to any direct dest constraints
    (cs.keySet ++ inferred.keySet).map { k =>
      (cs.get(k), inferred.get(k)) match {
        case (Some(a), Some(b)) => k -> a.and(b)
        case (a, b)             => k -> a.orElse(b).get
      }
    }.toMap
  }

  private def toComparable(v: Any): Any = v match {
    case i: Int    => i.toLong
    case other     => other
  }
  private def fromComparable(v: Any): Any = v

  /** Decide survival of one file given constraints, the partition
    * schema, and footer stats.
    */
  def fileSurvives(
      f: FileEntry,
      cs: Map[String, Constraint],
      partTypes: Map[String, DataType]): Boolean =
    cs.forall { case (colName, c) =>
      f.partition.get(colName) match {
        case Some(raw) =>
          // accepts() is three-valued-logic aware: the Hive null
          // sentinel parses to null and satisfies only IS NULL
          c.accepts(parsePartitionValue(raw, partTypes.getOrElse(colName, StringType)))
        case None if c.nullness.contains(true) =>
          // IS NULL: footer null counts decide — a file with zero
          // recorded nulls cannot contain a matching row
          f.stats.get(colName).forall(_.nulls > 0)
        case None =>
          f.stats.get(colName) match {
            case Some(st) if st.min != null && st.max != null &&
                statsTrustworthy(partTypes.get(colName), st.tpe) =>
              st.tpe match {
                case "long"   => c.overlaps(st.min.toLong, st.max.toLong)
                case "double" => c.overlaps(st.min.toDouble, st.max.toDouble)
                case _        => c.overlaps(st.min, st.max, utf8Cmp)
              }
            case _ => true // no stats, or incomparable domain → keep
          }
      }
    }

  /** Footer stats are tagged with the parquet *physical* type; pruning
    * with them is only sound when the column's *logical* type shares
    * the physical value domain. Decimals (unscaled int64/32), nanos
    * timestamps, binary, etc. do not — a literal `3` compared against
    * unscaled `400` (= 4.00) silently skips matching files.
    */
  private def statsTrustworthy(dt: Option[DataType], statTpe: String): Boolean =
    dt.exists {
      case LongType | IntegerType | ShortType | ByteType => statTpe == "long"
      case TimestampType | DateType                      => statTpe == "long"
      case DoubleType | FloatType                        => statTpe == "double"
      case StringType                                    => statTpe == "string"
      case _                                             => false
    }

  /** Unsigned UTF-8 byte order — parquet's BINARY stats ordering. */
  private def utf8Cmp(a: Any, b: Any): Int = {
    val x = a.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }
}
