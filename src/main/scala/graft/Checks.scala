package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared one-pass invariant checks for entry lifecycles (r13
  * optimization round). */
object Checks {
  /** Multiset-equality witness in ONE job: ±1 row weights, groupBy the
    * full row, any nonzero weight sum is a divergence. The
    * `a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty` form this
    * replaces executes BOTH inputs twice behind two shuffles — at
    * 100 TB that is four scans of the compared relations where one of
    * each suffices. Returns 0 iff `a` and `b` are equal as multisets
    * (limit-1 short-circuit: any witness row ends the job).
    */
  def multisetDriftCount(a: DataFrame, b: DataFrame): Long = {
    // schema-width agreement up front: projecting b to a's columns
    // would let a relation with EXTRA columns pass the equality check
    // silently — the exceptAll form this replaced failed loudly on
    // such drift (r13 advice)
    require(a.columns.toSet == b.columns.toSet,
      s"multiset check on diverging schemas: ${a.columns.sorted.mkString(",")} " +
        s"vs ${b.columns.sorted.mkString(",")}")
    val cols = a.columns.toSeq.map(col)
    a.select(cols :+ lit(1L).as("_w"): _*)
      .unionAll(b.select(cols :+ lit(-1L).as("_w"): _*))
      .groupBy(cols: _*).agg(sum(col("_w")).as("_w"))
      .filter(col("_w") =!= 0L)
      .limit(1).count()
  }
}
