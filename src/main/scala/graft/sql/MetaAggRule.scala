package graft.sql

import scala.annotation.tailrec

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.GraftFileIndex
import org.apache.spark.sql.types._

import graft.lake.FileEntry

/** Metadata-only aggregates over graft scans (SURVEY.md §2.A87): a
  * `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)` aggregation —
  * optionally filtered and grouped by partition columns — is answered
  * entirely from the snapshot manifest's per-file row counts and
  * parquet-footer column stats, replacing the whole subtree with a
  * [[LocalRelation]]. `SELECT count(*) FROM t WHERE pdate = …` on a
  * 100 TB table then reads ZERO data files: the plan costs O(#manifest
  * entries) on the driver, the same scale class as Iceberg/Delta's
  * aggregate pushdown (the reference plans scans from Iceberg manifests
  * — IceTableScanExec.scala:163 — but always reads the data; this
  * answers stat-expressible aggregates without the read).
  *
  * Exactness rules — the rewrite fires only when every contribution is
  * provably exact, otherwise the normal scan plan stands:
  *  - the filter (if any) references ONLY partition columns with a
  *    deterministic, subquery-free predicate: partition values are
  *    constant per file, so each file is all-match or all-drop, decided
  *    by the SAME interpreted-predicate evaluation `listFiles` uses;
  *  - `MIN`/`MAX` needs every surviving non-empty file to carry footer
  *    stats for the column whose physical value domain matches the
  *    logical type (mirrors [[graft.lake.Pruning]]'s `statsTrustworthy`:
  *    int/long/date/timestamp ↔ "long", float/double ↔ "double");
  *    string bounds are NOT answered (a writer may truncate long binary
  *    stats — bounds stay valid for pruning but not as exact answers);
  *  - `COUNT(col)` needs exact per-file null counts (footer `nulls`,
  *    recorded only with a non-null value present — all-null files bail);
  *  - on a partition column, `MIN`/`MAX`/`COUNT(col)` come from the
  *    per-file partition value itself (exact by construction);
  *  - pending merge-on-read deletes, streaming relations, distinct or
  *    filtered aggregate calls, and non-attribute projections under the
  *    aggregate all bail to the scan plan.
  *
  * Disable with `spark.graft.metaAgg.enabled=false`.
  */
case class GraftMetaAggRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val Enabled = "spark.graft.metaAgg.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (spark.conf.get(Enabled, "true") != "true") return plan
    plan.transform {
      case agg @ Aggregate(groupings, aggExprs, child, _) =>
        rewrite(agg, groupings, aggExprs, child).getOrElse(agg)
    }
  }

  // ---- plan-shape unwrap ---------------------------------------------

  /** Attribute/literal substitutions of one Project layer; anything
    * else poisons the exprId (a reference to it bails the rewrite).
    */
  private type Subst = Map[ExprId, Option[Expression]]

  @tailrec
  private def unwrap(
      p: LogicalPlan, substs: List[Subst], conds: List[(Expression, List[Subst])])
      : Option[(LogicalRelation, GraftFileIndex, List[Subst], List[(Expression, List[Subst])])] =
    p match {
      case Project(list, c) =>
        val s: Subst = list.map {
          case a @ Alias(ar: AttributeReference, _) => a.exprId -> Some(ar: Expression)
          case a @ Alias(l: Literal, _)             => a.exprId -> Some(l: Expression)
          case ar: AttributeReference               => ar.exprId -> Some(ar: Expression)
          case other                                => other.exprId -> None
        }.toMap
        unwrap(c, substs :+ s, conds)
      case Filter(cond, c) =>
        unwrap(c, substs, conds :+ (cond -> substs))
      case lr: LogicalRelation if !lr.isStreaming =>
        lr.relation match {
          case fs: HadoopFsRelation => fs.location match {
            case gfi: GraftFileIndex => Some((lr, gfi, substs, conds))
            case _ => None
          }
          case _ => None
        }
      case _ => None
    }

  /** Push `e` through the Project layers accumulated ABOVE the node it
    * was collected at, rewriting references down to relation output;
    * None if any reference resolves to a poisoned/literal-for-agg slot.
    */
  private def resolve(e: Expression, below: List[Subst]): Option[Expression] = {
    var ok = true
    val out = below.foldLeft(e) { (cur, s) =>
      if (!ok) cur
      else cur.transformUp {
        case ar: AttributeReference =>
          s.get(ar.exprId) match {
            case Some(Some(repl)) => repl
            case Some(None)       => ok = false; ar
            case None             => ar // not produced by this layer (e.g. relation attr)
          }
      }
    }
    if (ok) Some(out) else None
  }

  // ---- the rewrite ----------------------------------------------------

  private sealed trait AggSpec
  private case object CountStar extends AggSpec
  private case class CountCol(phys: String, dt: DataType, isPart: Boolean) extends AggSpec
  private case class MinMax(phys: String, dt: DataType, isPart: Boolean, isMin: Boolean) extends AggSpec
  private case class GroupRef(phys: String, dt: DataType) extends AggSpec

  private def rewrite(
      agg: Aggregate, groupings: Seq[Expression], aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    val (lr, gfi, substs, conds) = unwrap(child, Nil, Nil) match {
      case Some(x) => x
      case None    => return None
    }
    val snap = gfi.snapshot
    if (snap.deleteFiles.nonEmpty) return None
    val relAttrByExprId: Map[ExprId, AttributeReference] =
      lr.output.collect { case a: AttributeReference => a.exprId -> a }.toMap
    val partNames: Set[String] = gfi.partitionSchema.fieldNames.toSet
    // partition-value parsing must be representable for grouping output
    // — exactly the types castPartitionValue parses to their INTERNAL
    // representation (temporal types parse to days/micros, so they
    // qualify; anything castPartitionValue would UTF8String-fallback
    // must bail to the scan)
    def partCastable(dt: DataType): Boolean = dt match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType |
           FloatType | BooleanType | StringType | DateType |
           TimestampType | TimestampNTZType => true
      case _ => false
    }

    def relAttr(e: Expression): Option[AttributeReference] = e match {
      case ar: AttributeReference => relAttrByExprId.get(ar.exprId)
      case _                      => None
    }

    // -- filters: resolve to relation attrs, require partition-only ----
    val resolvedConds: Seq[Expression] = conds.map { case (cond, above) =>
      resolve(cond, above) match {
        case Some(c) => c
        case None    => return None
      }
    }
    for (c <- resolvedConds) {
      if (!c.deterministic) return None
      if (c.exists(_.isInstanceOf[PlanExpression[_]])) return None
      val refs = c.references.toSeq
      if (!refs.forall(a => relAttrByExprId.get(a.exprId).exists(r => partNames.contains(r.name))))
        return None
      if (!refs.forall(a => partCastable(a.dataType))) return None
    }

    // -- groupings: each must be a partition-column relation attr ------
    val groupCols: Seq[(ExprId, String, DataType)] = groupings.map { g =>
      resolve(g, substs).flatMap(relAttr) match {
        case Some(ar) if partNames.contains(ar.name) && partCastable(ar.dataType) =>
          (ar.exprId, ar.name, ar.dataType)
        case _ => return None
      }
    }
    val groupByExprId = groupCols.map(g => g._1 -> g).toMap

    // -- aggregate expressions -----------------------------------------
    def colSpec(e: Expression): Option[(String, DataType, Boolean)] =
      resolve(e, substs).flatMap(relAttr).map(ar =>
        (ar.name, ar.dataType, partNames.contains(ar.name)))
    val specs: Seq[AggSpec] = aggExprs.map {
      case Alias(AggregateExpression(fn, Complete, false, None, _), _) => fn match {
        // partition-column specs must ALSO pass partCastable: partVal
        // reads the value castPartitionValue parsed, and that parser
        // falls back to UTF8String for Date/Timestamp/Short/Byte — an
        // ungated MIN/MAX/COUNT on such a partition column would emit
        // UTF8String into a LocalRelation whose attribute carries the
        // temporal/narrow type (ClassCastException or garbage). Same
        // gate filters and groupings already apply.
        case Count(Seq(l: Literal)) if l.value != null => CountStar
        case Count(Seq(e)) => colSpec(e) match {
          case Some((n, dt, p)) if !p || partCastable(dt) => CountCol(n, dt, p)
          case _                                          => return None
        }
        case Min(e) => colSpec(e) match {
          case Some((n, dt, p)) if minMaxAnswerable(dt, p) && (!p || partCastable(dt)) =>
            MinMax(n, dt, p, isMin = true)
          case _ => return None
        }
        case Max(e) => colSpec(e) match {
          case Some((n, dt, p)) if minMaxAnswerable(dt, p) && (!p || partCastable(dt)) =>
            MinMax(n, dt, p, isMin = false)
          case _ => return None
        }
        case _ => return None
      }
      case ar: AttributeReference =>
        // a grouping column riding the output list
        resolve(ar, substs).flatMap(relAttr) match {
          case Some(r) if groupByExprId.contains(ar.exprId) ||
              groupCols.exists(_._2 == r.name) => GroupRef(r.name, r.dataType)
          case _ => return None
        }
      case Alias(e, _) =>
        resolve(e, substs).flatMap(relAttr) match {
          case Some(r) if groupCols.exists(_._2 == r.name) => GroupRef(r.name, r.dataType)
          case _ => return None
        }
      case _ => return None
    }

    // -- survivors: exact interpreted evaluation per file ---------------
    val partFields = gfi.partitionSchema.fields
    val exactPred = resolvedConds.reduceOption(And(_, _)).map { p =>
      Predicate.createInterpreted(p.transformUp {
        case ar: AttributeReference =>
          val i = partFields.indexWhere(_.name == ar.name)
          if (i < 0) return None
          BoundReference(i, partFields(i).dataType, nullable = true)
      })
    }
    def partRow(f: FileEntry): Option[InternalRow] = {
      val vals = partFields.toSeq.map { pf =>
        f.partition.get(pf.name) match {
          case Some(raw) => GraftFileIndex.castPartitionValue(raw, pf.dataType)
          case None      => return None // a file missing a partition value: bail, never guess
        }
      }
      Some(InternalRow.fromSeq(vals))
    }
    val withRows: Seq[(FileEntry, InternalRow)] = snap.files.map { f =>
      partRow(f) match {
        case Some(row) => (f, row)
        case None      => return None
      }
    }
    val survivors: Seq[(FileEntry, InternalRow)] =
      withRows.filter { case (_, row) => exactPred.forall(_.eval(row)) }

    // -- fold stats ------------------------------------------------------
    def partVal(row: InternalRow, name: String, dt: DataType): Any = {
      val i = partFields.indexWhere(_.name == name)
      if (row.isNullAt(i)) null else row.get(i, dt)
    }
    def fileCountCol(f: FileEntry, row: InternalRow, s: CountCol): Option[Long] =
      if (f.rows == 0L) Some(0L)
      else if (s.isPart) Some(if (partVal(row, s.phys, s.dt) == null) 0L else f.rows)
      else f.stats.get(s.phys) match {
        case Some(st) if st.nulls >= 0L && statDomainOk(s.dt, st.tpe) => Some(f.rows - st.nulls)
        case _ => None
      }
    def fileBound(f: FileEntry, row: InternalRow, s: MinMax): Option[Option[Any]] =
      if (f.rows == 0L) Some(None)
      else if (s.isPart) Some(Option(partVal(row, s.phys, s.dt)))
      else f.stats.get(s.phys) match {
        case Some(st) if st.min != null && st.max != null && statDomainOk(s.dt, st.tpe) =>
          if (st.nulls >= f.rows) Some(None) // cannot happen with hasNonNullValue, but exact either way
          else Some(Some(lift(if (s.isMin) st.min else st.max, st.tpe, s.dt)))
        case _ => None
      }

    def foldGroup(fs: Seq[(FileEntry, InternalRow)]): Option[Seq[Any]] = {
      val vals = specs.map {
        case CountStar => fs.map(_._1.rows).sum: Any
        case s: CountCol =>
          var tot = 0L
          for ((f, row) <- fs) fileCountCol(f, row, s) match {
            case Some(n) => tot += n
            case None    => return None
          }
          tot: Any
        case s: MinMax =>
          var best: Option[Any] = None
          for ((f, row) <- fs) fileBound(f, row, s) match {
            case Some(Some(v)) =>
              best = Some(best.fold(v)(b =>
                if (s.isMin == (cmp(v, b, s.dt) < 0)) v else b))
            case Some(None) => ()
            case None       => return None
          }
          best.orNull: Any
        case s: GroupRef => partVal(fs.head._2, s.phys, s.dt)
      }
      Some(vals)
    }

    val rows: Seq[Seq[Any]] =
      if (groupCols.isEmpty) Seq(foldGroup(survivors).getOrElse(return None))
      else survivors
        .groupBy { case (_, row) => groupCols.map(g => partVal(row, g._2, g._3)) }
        .toSeq.sortBy(_._1.map(v => if (v == null) "" else v.toString).mkString("\u0000"))
        .map { case (_, fs) => foldGroup(fs).getOrElse(return None) }

    val out = aggExprs.map(_.toAttribute)
    Some(LocalRelation(out, rows.map(InternalRow.fromSeq)))
  }

  /** Mirrors Pruning.statsTrustworthy: the stat's physical value domain
    * must BE the logical value domain for the answer to be exact.
    */
  private def statDomainOk(dt: DataType, statTpe: String): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => statTpe == "long"
    case TimestampType | TimestampNTZType | DateType   => statTpe == "long"
    case DoubleType | FloatType                        => statTpe == "double"
    case StringType                                    => statTpe == "string"
    case _                                             => false
  }

  /** min/max answered only where footer bounds are exact values, not
    * truncations — numeric/temporal domains; strings excluded.
    */
  private def minMaxAnswerable(dt: DataType, isPart: Boolean): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType |
         TimestampType | TimestampNTZType | DateType |
         DoubleType | FloatType => true
    case StringType             => isPart // partition values are exact; footer strings are not answered
    case _                      => false
  }

  private def lift(raw: String, statTpe: String, dt: DataType): Any = (statTpe, dt) match {
    case ("long", LongType)            => raw.toLong
    case ("long", IntegerType)         => raw.toLong.toInt
    case ("long", ShortType)           => raw.toLong.toShort
    case ("long", ByteType)            => raw.toLong.toByte
    case ("long", DateType)            => raw.toLong.toInt
    case ("long", TimestampType)       => raw.toLong
    case ("long", TimestampNTZType)    => raw.toLong
    case ("double", DoubleType)        => raw.toDouble
    case ("double", FloatType)         => raw.toDouble.toFloat
    case _ => throw new IllegalStateException(s"unreachable lift $statTpe→$dt")
  }

  private def cmp(a: Any, b: Any, dt: DataType): Int = (a, b) match {
    case (x: Long, y: Long)     => java.lang.Long.compare(x, y)
    case (x: Int, y: Int)       => java.lang.Integer.compare(x, y)
    case (x: Short, y: Short)   => java.lang.Short.compare(x, y)
    case (x: Byte, y: Byte)     => java.lang.Byte.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: Float, y: Float)   => java.lang.Float.compare(x, y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x: org.apache.spark.unsafe.types.UTF8String,
          y: org.apache.spark.unsafe.types.UTF8String) => x.compareTo(y)
    case _ => throw new IllegalStateException(s"unreachable cmp on $dt")
  }
}
