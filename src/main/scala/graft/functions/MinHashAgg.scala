package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._

/** Dataset-level MinHash signature as a distributed aggregate: each row
  * contributes its shingle-hash set, the buffer keeps the per-
  * permutation minima, and merge is an elementwise min — fully
  * map-side-combinable, constant state (nHashes longs), one shuffle of
  * nHashes values per partition regardless of data size. Two datasets'
  * signatures estimate their shingle-set Jaccard as the fraction of
  * equal components — corpus-vs-corpus similarity at 100 TB for the
  * price of a count(*).
  */
case class MinHashAgg(
    child: Expression,
    seed: Long,
    nHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(nHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hashes = v.asInstanceOf[ArrayData]
      val n = hashes.numElements()
      var i = 0
      while (i < nHashes) {
        val c = Hashing.mix64(seed + i)
        var mn = buf(i)
        var j = 0
        while (j < n) {
          val h = Hashing.mix64(hashes.getLong(j) ^ c)
          if (h < mn) mn = h
          j += 1
        }
        buf(i) = mn
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * nHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashAgg =
    copy(child = c.head)
  override def prettyName: String = "graft_minhash_agg"
}

object MinHashAgg {
  /** Column API: aggregate an array<long> shingle-hash column into a
    * dataset signature.
    */
  def minHashAgg(c: Column, seed: Long, nHashes: Int): Column =
    Shim.column(MinHashAgg(Shim.expression(c), seed, nHashes)
      .toAggregateExpression())

  /** Jaccard estimate between two signatures = fraction of equal
    * components (Broder'97).
    */
  def estimate(a: Seq[Long], b: Seq[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
}
