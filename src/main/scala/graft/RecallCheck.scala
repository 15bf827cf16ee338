package graft
// temporary measurement harness (deleted after use)
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.1"
    import graft.pipeline._
    import graft.functions.exprs
    val missed = Seq((128L,2773L),(1166L,4828L),(2147L,3401L),(2256L,4337L),(2326L,3377L),
      (2465L,4576L),(2770L,3674L),(3436L,4599L),(3911L,4415L))
    val ids = missed.flatMap(p => Seq(p._1, p._2)).toSet
    val sigs = Tables.documents(spark, d).filter(col("doc_id").isin(ids.toSeq:_*))
      .select(col("doc_id"), exprs.simHash(exprs.shingleHashes(col("text"), 3)).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    missed.foreach { case (a,b) =>
      println(s"RES pair ($a,$b) hamming=${java.lang.Long.bitCount(sigs(a) ^ sigs(b))}")
    }
    spark.stop()
  }
}
