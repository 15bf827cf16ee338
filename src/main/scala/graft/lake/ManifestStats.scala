package graft.lake

import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
import org.apache.spark.sql.types._

/** Catalog statistics derived from a snapshot manifest — the SAME
  * footer aggregates pruning uses, folded per column (O(metadata),
  * never a data pass):
  *
  *  - `sizeInBytes` / `rowCount`: exact, with pending MOR deletes
  *    subtracted from the logical row count.
  *  - per-column min/max/nullCount for the numeric/string domains the
  *    footer harvest records; columns any file lacks stats for are
  *    omitted (absent beats wrong for CBO).
  *  - `distinctCount`: from `stats.ndv.<col>` table properties when
  *    [[GraftTable.analyzeNdv]] has run (the ANALYZE TABLE equivalent —
  *    Iceberg likewise records NDV sketches from an explicit analyze
  *    action, not per commit); integral columns without it fall back
  *    to the value-range bound `min(rowCount, max-min+1)`, exact for
  *    dense key domains.
  *
  * Attached by the scan builder to every manifest-planned relation
  * (keyed by the relation's physical column names) and by the SQL
  * bridge to session-catalog mirrors (logical names, for DESCRIBE) —
  * so CBO join reordering and filter estimation see manifest truth on
  * every read path.
  */
object ManifestStats {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Int, Long), CatalogStatistics]()

  /** Stats for (a possibly file-subset copy of) a snapshot. Subset
    * scans share the snapshot id, so the cache key folds in the file
    * count and row total.
    */
  def forSnapshot(root: String, s: Snapshot, physicalKeys: Boolean): CatalogStatistics =
    cache.computeIfAbsent(
      (root + (if (physicalKeys) "#p" else "#l"), s.id, s.files.size, s.totalRows),
      _ => compute(s, physicalKeys))

  private def compute(s: Snapshot, physicalKeys: Boolean): CatalogStatistics = {
    val schema = DataType.fromJson(s.schemaJson).asInstanceOf[StructType]
    val rowCount = BigInt(s.totalRows)
    // empty files legitimately carry no footer stats — they must not
    // veto the column (they contribute no rows either)
    val statFiles = s.files.filter(_.rows > 0)
    val colStats: Map[String, CatalogColumnStat] =
      if (statFiles.isEmpty) Map.empty
      else schema.fields.iterator.flatMap { f =>
        val pn = GraftTable.physicalName(f)
        val key = if (physicalKeys) pn else f.name
        val sts = statFiles.map(_.stats.get(pn))
        if (sts.exists(_.isEmpty)) None
        else {
          val all = sts.flatten
          val nulls = BigInt(all.map(_.nulls).sum)
          val ndvProp = s.properties.get(s"stats.ndv.${f.name}")
            .flatMap(v => scala.util.Try(BigInt(v)).toOption)
          val width = Some(f.dataType.defaultSize.toLong)
          f.dataType match {
            case IntegerType | LongType | ShortType | ByteType
                if all.forall(_.tpe == "long") =>
              val mn = all.map(_.min.toLong).min
              val mx = all.map(_.max.toLong).max
              val span = BigInt(mx) - BigInt(mn) + 1
              val ndv = ndvProp.orElse(Some(span.min(rowCount)))
              Some(key -> CatalogColumnStat(ndv,
                Some(mn.toString), Some(mx.toString), Some(nulls), width, width))
            case DoubleType | FloatType if all.forall(_.tpe == "double") =>
              val mn = all.map(_.min.toDouble).min
              val mx = all.map(_.max.toDouble).max
              Some(key -> CatalogColumnStat(ndvProp,
                Some(mn.toString), Some(mx.toString), Some(nulls), width, width))
            case StringType if all.forall(_.tpe == "string") =>
              // string ranges are not CBO-comparable — NDV + nulls
              // still drive equality selectivity and join cardinality
              Some(key -> CatalogColumnStat(ndvProp, None, None, Some(nulls), None, None))
            case _ => None
          }
        }
      }.toMap
    CatalogStatistics(
      sizeInBytes = BigInt(s.files.map(_.bytes).sum),
      rowCount = Some(rowCount - BigInt(s.deletedRows)),
      colStats = colStats)
  }
}
