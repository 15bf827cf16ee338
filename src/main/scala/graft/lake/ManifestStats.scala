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
    (String, Long, Long), CatalogStatistics]()

  /** Streaming emits a new subset per micro-batch — an uncapped cache
    * is a slow driver leak in exactly the always-on workload. Stats
    * recompute cheaply, so a full clear at the cap beats bookkeeping.
    */
  private val CacheCap = 4096

  /** Stats for (a possibly file-subset copy of) a snapshot. Subset
    * scans share the snapshot id, so the key folds in an order-free
    * content hash of the subset's paths and sizes — file count + row
    * totals alone collide across different same-shaped subsets, which
    * would hand one partition's size/ranges to another.
    */
  def forSnapshot(root: String, s: Snapshot, physicalKeys: Boolean): CatalogStatistics = {
    val filesHash = s.files.foldLeft(17L)((a, f) =>
      a + f.path.hashCode.toLong * 1315423911L + f.bytes)
    if (cache.size > CacheCap) cache.clear()
    cache.computeIfAbsent(
      (root + (if (physicalKeys) "#p" else "#l"), s.id, filesHash),
      _ => compute(s, physicalKeys))
  }

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
    // Logical row count: subtract only the pending deletes PROVABLY
    // inside this scan — position entries whose recorded targets all
    // sit in the scanned files. Unknown-target and equality entries
    // don't subtract: an equality entry's `rows` counts SOURCE KEYS
    // (possibly ≫ matched rows), and a subset scan must not absorb the
    // whole table's delete count (a 10k-row streaming delta against a
    // 1M-row pending set would otherwise report −990k rows to CBO).
    // Overestimating survives both failure modes; negative poisons.
    val scanned = s.files.iterator.map(f =>
      f.path.substring(f.path.lastIndexOf('/') + 1)).toSet
    val applied = BigInt(s.deleteFiles.iterator.collect {
      case d if d.equalityCols.isEmpty && d.targets.nonEmpty &&
        d.targets.forall(scanned.contains) => d.rows
    }.sum)
    CatalogStatistics(
      sizeInBytes = BigInt(s.files.map(_.bytes).sum),
      rowCount = Some((rowCount - applied).max(BigInt(0))),
      colStats = colStats)
  }
}
