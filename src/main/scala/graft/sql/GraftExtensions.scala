package graft.sql

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.StructType

import graft.functions._
import graft.lake.GraftTable

/** SQL-surface integration (SURVEY.md §2.A19; reference:
  * planning/SparkSessionExtensions.scala injects IceParser + rules).
  *
  * Register with `.config("spark.sql.extensions",
  * "graft.sql.GraftExtensions")`, then:
  *
  *  - `GraftCatalog.register(name, tableRoot)` exposes a graft table to
  *    SQL: `SELECT * FROM name` reads the current snapshot.
  *  - `AS OF '<snapshot-id | yyyy-MM-dd HH:mm:ss | epoch-millis>'
  *    SELECT …` time-travels every graft relation in the query
  *    (reference: parsing/IceParser.scala:108-111 `asOfSelect`).
  *  - graft expression functions are callable from SQL:
  *    `graft_cosine(a, b)`, `graft_polyhash(s)`, `graft_shingles(s, 3)`,
  *    `graft_simhash(arr)`, `graft_winnow(s, k, w)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
    ext.injectOptimizerRule(session => DepPredicateRule(session))
    GraftExtensions.functions.foreach(ext.injectFunction)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_polyhash"),
      info("graft_polyhash", "portable polynomial hash of a string"),
      (es: Seq[Expression]) => PolyHash(es.head)),
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "cosine similarity of two float arrays"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "64-bit simhash of an array of token hashes"),
      (es: Seq[Expression]) => SimHash64(es.head)),
    (FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "distinct word n-gram shingles"),
      (es: Seq[Expression]) => WordShingles(es.head, intArg(es(1)))),
    (FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "hashed distinct word n-gram shingles"),
      (es: Seq[Expression]) => ShingleHashes(es.head, intArg(es(1)))),
    (FunctionIdentifier("graft_winnow"),
      info("graft_winnow", "winnowing fingerprint (k-gram, window w)"),
      (es: Seq[Expression]) => WinnowFingerprint(es.head, intArg(es(1)), intArg(es(2)))))

  private def intArg(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue
}

/** Session-wide registry: SQL relation name → graft table root. */
object GraftCatalog {
  private val tables = new ConcurrentHashMap[String, String]()
  def register(name: String, root: String): Unit = tables.put(name.toLowerCase, root)
  def unregister(name: String): Unit = tables.remove(name.toLowerCase)
  def lookup(name: String): Option[String] = Option(tables.get(name.toLowerCase))
  def registeredRoots: Seq[String] = {
    import scala.jdk.CollectionConverters._
    tables.values.asScala.toSeq
  }
}

/** Delegating parser that (1) strips a leading `AS OF '<spec>'` clause
  * and (2) substitutes registered graft relations with their
  * (time-travel) snapshot scans at parse time.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val AsOfRe =
    """(?is)\s*as\s+of\s+'([^']+)'\s+(.*)""".r

  override def parsePlan(sqlText: String): LogicalPlan = {
    val (asOf, parsed) = sqlText match {
      case AsOfRe(spec, rest) => (Some(spec.trim), delegate.parsePlan(rest))
      case _                  => (None, delegate.parsePlan(sqlText))
    }
    // DELETE / MERGE target relations are rewritten at the root, before
    // `substitute` (a bottom-up transform) would replace the target
    // UnresolvedRelation with a snapshot scan.
    parsed match {
      case d: logical.DeleteFromTable =>
        graftName(d.table) match {
          case Some(name) => GraftDeleteCommand(name, Option(d.condition).map(Shim.column))
          case None       => substitute(parsed, asOf)
        }
      case u: logical.UpdateTable if graftName(u.table).isDefined =>
        val name = graftName(u.table).get
        val sets = u.assignments.map { a =>
          val key = a.key match {
            case attr: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
              attr.nameParts.last
            case other => throw new IllegalArgumentException(
              s"graft UPDATE supports simple column assignments, got $other")
          }
          key -> Shim.column(a.value)
        }
        GraftUpdateCommand(name, sets, u.condition.map(Shim.column))
      case m: logical.MergeIntoTable if graftName(m.targetTable).isDefined =>
        val name = graftName(m.targetTable).get
        require(
          m.matchedActions.forall(_.isInstanceOf[logical.UpdateStarAction]) &&
            m.notMatchedActions.forall(_.isInstanceOf[logical.InsertStarAction]) &&
            m.notMatchedBySourceActions.isEmpty,
          "graft MERGE supports WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *")
        GraftMergeCommand(name, mergeKeys(m.mergeCondition), substitute(m.sourceTable, asOf))
      case p => substitute(p, asOf)
    }
  }

  /** Registered graft-table name behind a (possibly aliased) relation. */
  private def graftName(plan: LogicalPlan): Option[String] = plan match {
    case logical.SubqueryAlias(_, child) => graftName(child)
    case u: UnresolvedRelation if u.multipartIdentifier.length == 1 =>
      Some(u.multipartIdentifier.head.toLowerCase)
        .filter(n => GraftCatalog.lookup(n).isDefined)
    case _ => None
  }

  /** Equi-join key columns of a MERGE condition: conjuncts of
    * `target.k = source.k` (same terminal column name on both sides).
    */
  private def mergeKeys(cond: Expression): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
        a.nameParts.last.toLowerCase
      case other => throw new IllegalArgumentException(
        s"graft MERGE condition must be conjunctive equi-join on same-named columns, got $other")
    }.distinct
  }

  private def substitute(plan: LogicalPlan, asOf: Option[String]): LogicalPlan =
    plan.transformUp {
      // INSERT INTO / INSERT OVERWRITE [PARTITION (…)] on a registered
      // graft table → snapshot-creating command (reference:
      // InsertIntoIcebergTable.scala)
      case ins: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement =>
        ins.table match {
          case u: UnresolvedRelation if u.multipartIdentifier.length == 1 &&
              GraftCatalog.lookup(u.multipartIdentifier.head).isDefined =>
            val static = ins.partitionSpec.collect { case (k, Some(v)) => k -> v }
            GraftInsertCommand(
              u.multipartIdentifier.head.toLowerCase, ins.overwrite, static, ins.query)
          case _ => ins
        }
      // CREATE TABLE … OPTIONS(addTableManagement 'true',
      // columnDependencies '…') PARTITIONED BY (…) (reference:
      // planning/CreateTableRules.scala)
      case ct: org.apache.spark.sql.catalyst.plans.logical.CreateTable
          if tableOptions(ct.tableSpec).get("addtablemanagement").exists(_.equalsIgnoreCase("true")) =>
        val name = ct.name match {
          case id: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
            id.nameParts.last.toLowerCase
          case other => throw new IllegalArgumentException(s"unsupported table name $other")
        }
        val opts = tableOptions(ct.tableSpec)
        val deps = opts.get("columndependencies")
          .map(GraftTable.parseDeps).getOrElse(Seq.empty)
        val partCols = ct.partitioning.collect {
          case t if t.name == "identity" => t.references.head.fieldNames.last
        }
        val schema = StructType(ct.columns.map(c =>
          org.apache.spark.sql.types.StructField(c.name, c.dataType, nullable = true)))
        GraftCreateTableCommand(name, schema, partCols.toSeq,
          deps, tableLocation(ct.tableSpec))
      // `t$snapshots` / `t$files` metadata views (reference:
      // TableUtils.SNAPSHOTSVIEW_SUFFIX — `` select * from `t$snapshots` ``)
      case u: UnresolvedRelation if u.multipartIdentifier.length == 1 &&
          u.multipartIdentifier.head.contains("$") && {
            val base = u.multipartIdentifier.head.takeWhile(_ != '$')
            GraftCatalog.lookup(base).isDefined
          } =>
        val full = u.multipartIdentifier.head
        val base = full.takeWhile(_ != '$')
        val t = new GraftTable(GraftCatalog.lookup(base).get, session)
        full.drop(base.length) match {
          case "$snapshots" => Shim.logicalPlan(t.snapshotsView)
          case "$files"     => Shim.logicalPlan(t.filesView)
          case other => throw new IllegalArgumentException(
            s"unknown metadata view suffix '$other' on graft table '$base'")
        }
      case u: UnresolvedRelation if u.multipartIdentifier.length == 1 &&
          GraftCatalog.lookup(u.multipartIdentifier.head).isDefined =>
        val root = GraftCatalog.lookup(u.multipartIdentifier.head).get
        val t = new GraftTable(root, session)
        val df = asOf match {
          case None => t.read()
          case Some(spec) if spec.forall(_.isDigit) && spec.length < 10 =>
            t.readAsOfId(spec.toLong) // short digit strings = snapshot id
          case Some(spec) if spec.forall(_.isDigit) =>
            t.readAsOfTs(spec.toLong) // long digit strings = epoch millis
          case Some(spec) =>
            val ts = java.sql.Timestamp.valueOf(
              if (spec.contains(":")) spec else s"$spec 00:00:00")
            t.readAsOfTs(ts.getTime)
        }
        Shim.logicalPlan(df)
    }

  /** Properties + evaluated OPTIONS of a parsed table spec, lowercased. */
  private def tableOptions(
      spec: org.apache.spark.sql.catalyst.plans.logical.TableSpecBase): Map[String, String] =
    spec match {
      case u: org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec =>
        val fromOpts = u.optionExpression.options.collect {
          case (k, e) if e.foldable =>
            k.toLowerCase -> String.valueOf(e.eval(null) match {
              case s: org.apache.spark.unsafe.types.UTF8String => s.toString
              case other => other
            })
        }.toMap
        u.properties.map { case (k, v) => k.toLowerCase -> v } ++ fromOpts
      case _ => Map.empty
    }

  private def tableLocation(
      spec: org.apache.spark.sql.catalyst.plans.logical.TableSpecBase): Option[String] =
    spec match {
      case u: org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec =>
        u.location.orElse(tableOptions(spec).get("path"))
      case _ => None
    }

  override def parseExpression(s: String): Expression = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier = delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier = delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] = delegate.parseMultipartIdentifier(s)
  override def parseTableSchema(s: String): StructType = delegate.parseTableSchema(s)
  override def parseDataType(s: String): org.apache.spark.sql.types.DataType = delegate.parseDataType(s)
  override def parseQuery(s: String): LogicalPlan = parsePlan(s)
  override def parseRoutineParam(s: String): StructType = delegate.parseRoutineParam(s)
}
