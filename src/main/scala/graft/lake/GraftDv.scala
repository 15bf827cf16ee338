package graft.lake

import java.nio.{ByteBuffer, ByteOrder}

/** Deletion-vector bitmap codec — a from-scratch roaring-style format
  * (Chambi et al. 2016 re-derived; Delta DV / Iceberg v3 deletion
  * vectors store RoaringBitmap the same way): row positions within ONE
  * data file, chunked by the position's high bits into 64Ki-wide
  * containers, each container either a sorted u16 ARRAY (sparse,
  * 2 B/position) or a fixed 8 KiB BITMAP (dense) — so a bitmap's size
  * tracks min(2·cardinality, rows/8) bytes and a point lookup is one
  * directory binary-search + one container probe.
  *
  * Layout (little-endian), current "GDV2" format:
  * {{{
  *   magic  u32 = 0x47445632 ("GDV2")
  *   n      u32   container count
  *   dir    n × { key u32, type u8 (0=array,1=bitmap), card u32, off u32 }
  *   payloads in dir order: array → card×u16, bitmap → 8192 bytes
  * }}}
  * `off` is the container payload's byte offset relative to the end of
  * the directory, so a point probe is O(log n) FLAT: directory binary
  * search, read `off`, probe — no walk. The original "GDV1" layout
  * (13-byte stride minus the `off` field) carried no offsets, so every
  * probe re-summed the preceding containers' payload sizes —
  * O(#containers) PER ROW on the scan's hot path (a 10M-row file with
  * spread deletes has ~160 containers). Writers emit GDV2; readers
  * accept both magics (GDV1 vectors persist in committed tables).
  *
  * Containers are keyed by `pos >>> 16` in ascending order; positions
  * must be in [0, 2^47) (u32 key × u16 low bits). Serialization is
  * deterministic (sorted keys, canonical container choice at the 4096
  * cardinality threshold), so equal sets produce equal bytes.
  *
  * Everything here is pure byte/array work — usable verbatim as a
  * Catalyst expression kernel (codegen calls the static methods) and
  * as a [[graft.functions.DvAgg]] buffer codec.
  */
object GraftDv {

  final val Magic = 0x47445631   // legacy, read-only
  final val Magic2 = 0x47445632  // current, written
  final val ArrayMax = 4096
  final val BitmapBytes = 8192
  private final val Gdv1Stride = 9
  private final val Gdv2Stride = 13

  /** Mutable build state: container key → 1024-word bitmap. Used as
    * the aggregation buffer; containers stay bitmaps while building
    * (O(1) insert/merge) and compact to arrays at serialization.
    */
  type Builder = java.util.TreeMap[Integer, Array[Long]]

  def newBuilder(): Builder = new java.util.TreeMap[Integer, Array[Long]]()

  def add(b: Builder, pos: Long): Unit = {
    require(pos >= 0 && pos < (1L << 47), s"DV position out of range: $pos")
    val key = (pos >>> 16).toInt
    var words = b.get(key)
    if (words == null) { words = new Array[Long](1024); b.put(key, words) }
    val low = (pos & 0xffff).toInt
    words(low >>> 6) |= 1L << (low & 63)
  }

  def mergeInto(into: Builder, from: Builder): Builder = {
    val it = from.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val dst = into.get(e.getKey)
      if (dst == null) into.put(e.getKey, e.getValue)
      else {
        var i = 0
        while (i < 1024) { dst(i) |= e.getValue()(i); i += 1 }
      }
    }
    into
  }

  private def containerCard(words: Array[Long]): Int = {
    var c = 0; var i = 0
    while (i < 1024) { c += java.lang.Long.bitCount(words(i)); i += 1 }
    c
  }

  def serialize(b: Builder): Array[Byte] = {
    val entries = new java.util.ArrayList[(Int, Array[Long], Int)]()
    val it = b.entrySet().iterator()
    var payload = 0
    while (it.hasNext) {
      val e = it.next()
      val card = containerCard(e.getValue)
      if (card > 0) {
        entries.add((e.getKey, e.getValue, card))
        payload += (if (card <= ArrayMax) 2 * card else BitmapBytes)
      }
    }
    val n = entries.size()
    val bb = ByteBuffer.allocate(8 + n * Gdv2Stride + payload)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic2); bb.putInt(n)
    var i = 0
    var off = 0
    while (i < n) {
      val (key, words, card) = entries.get(i)
      bb.putInt(key); bb.put(if (card <= ArrayMax) 0.toByte else 1.toByte); bb.putInt(card)
      bb.putInt(off)
      off += (if (card <= ArrayMax) 2 * card else BitmapBytes)
      i += 1
    }
    i = 0
    while (i < n) {
      val (_, words, card) = entries.get(i)
      if (card <= ArrayMax) {
        var w = 0
        while (w < 1024) {
          var word = words(w)
          while (word != 0) {
            val bit = java.lang.Long.numberOfTrailingZeros(word)
            bb.putShort(((w << 6) | bit).toShort)
            word &= word - 1
          }
          w += 1
        }
      } else {
        var w = 0
        while (w < 1024) { bb.putLong(words(w)); w += 1 }
      }
      i += 1
    }
    bb.array()
  }

  /** GDV1 serializer, kept ONLY as a test fixture: committed tables may
    * carry GDV1 vectors, so the read path keeps decoding them and the
    * property suite round-trips BOTH magics. Writers always emit GDV2.
    */
  private[graft] def serializeLegacy(b: Builder): Array[Byte] = {
    val entries = new java.util.ArrayList[(Int, Array[Long], Int)]()
    val it = b.entrySet().iterator()
    var payload = 0
    while (it.hasNext) {
      val e = it.next()
      val card = containerCard(e.getValue)
      if (card > 0) {
        entries.add((e.getKey, e.getValue, card))
        payload += (if (card <= ArrayMax) 2 * card else BitmapBytes)
      }
    }
    val n = entries.size()
    val bb = ByteBuffer.allocate(8 + n * Gdv1Stride + payload)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic); bb.putInt(n)
    var i = 0
    while (i < n) {
      val (key, _, card) = entries.get(i)
      bb.putInt(key); bb.put(if (card <= ArrayMax) 0.toByte else 1.toByte); bb.putInt(card)
      i += 1
    }
    i = 0
    while (i < n) {
      val (_, words, card) = entries.get(i)
      if (card <= ArrayMax) {
        var w = 0
        while (w < 1024) {
          var word = words(w)
          while (word != 0) {
            val bit = java.lang.Long.numberOfTrailingZeros(word)
            bb.putShort(((w << 6) | bit).toShort)
            word &= word - 1
          }
          w += 1
        }
      } else {
        var w = 0
        while (w < 1024) { bb.putLong(words(w)); w += 1 }
      }
      i += 1
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Builder = {
    val b = newBuilder()
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt()
    require(magic == Magic || magic == Magic2, "not a GDV1/GDV2 deletion vector")
    val n = bb.getInt()
    val dir = new Array[(Int, Byte, Int)](n)
    var i = 0
    while (i < n) {
      dir(i) = (bb.getInt(), bb.get(), bb.getInt())
      if (magic == Magic2) bb.getInt() // cumulative offset: implicit in dir order here
      i += 1
    }
    i = 0
    while (i < n) {
      val (key, tpe, card) = dir(i)
      val words = new Array[Long](1024)
      if (tpe == 0) {
        var j = 0
        while (j < card) {
          val low = bb.getShort() & 0xffff
          words(low >>> 6) |= 1L << (low & 63)
          j += 1
        }
      } else {
        var w = 0
        while (w < 1024) { words(w) = bb.getLong(); w += 1 }
      }
      b.put(key, words)
      i += 1
    }
    b
  }

  def fromPositions(positions: Iterator[Long]): Array[Byte] = {
    val b = newBuilder()
    positions.foreach(add(b, _))
    serialize(b)
  }

  /** Point membership on the SERIALIZED form — the read path's per-row
    * kernel: directory binary search (the directory is fixed-width and
    * key-sorted) + one container probe; no deserialization, no
    * allocation beyond the ByteBuffer view. GDV2 reads the payload
    * offset straight from the directory entry (O(log n) flat); legacy
    * GDV1 vectors fall back to re-summing the preceding containers.
    */
  def contains(bytes: Array[Byte], pos: Long): Boolean = {
    if (pos < 0 || pos >= (1L << 47)) return false
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt(0)
    if (magic != Magic && magic != Magic2) return false
    val stride = if (magic == Magic2) Gdv2Stride else Gdv1Stride
    val n = bb.getInt(4)
    val key = (pos >>> 16).toInt
    // binary search the fixed-stride directory
    var lo = 0; var hi = n - 1; var found = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val k = bb.getInt(8 + mid * stride)
      if (k == key) { found = mid; lo = hi + 1 }
      else if (k < key) lo = mid + 1
      else hi = mid - 1
    }
    if (found < 0) return false
    var off = 8 + n * stride
    if (magic == Magic2) {
      off += bb.getInt(8 + found * Gdv2Stride + 9)
    } else {
      // GDV1: payload offset = sum of preceding containers' sizes
      var i = 0
      while (i < found) {
        val tpe = bb.get(8 + i * Gdv1Stride + 4)
        val card = bb.getInt(8 + i * Gdv1Stride + 5)
        off += (if (tpe == 0) 2 * card else BitmapBytes)
        i += 1
      }
    }
    val tpe = bb.get(8 + found * stride + 4)
    val card = bb.getInt(8 + found * stride + 5)
    val low = (pos & 0xffff).toInt
    if (tpe == 0) {
      var alo = 0; var ahi = card - 1
      while (alo <= ahi) {
        val mid = (alo + ahi) >>> 1
        val v = bb.getShort(off + 2 * mid) & 0xffff
        if (v == low) return true
        else if (v < low) alo = mid + 1
        else ahi = mid - 1
      }
      false
    } else {
      val word = bb.getLong(off + 8 * (low >>> 6))
      (word & (1L << (low & 63))) != 0
    }
  }

  def cardinality(bytes: Array[Byte]): Long = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt(0)
    require(magic == Magic || magic == Magic2, "not a GDV1/GDV2 deletion vector")
    val stride = if (magic == Magic2) Gdv2Stride else Gdv1Stride
    val n = bb.getInt(4)
    var c = 0L; var i = 0
    while (i < n) { c += bb.getInt(8 + i * stride + 5); i += 1 }
    c
  }

  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    serialize(mergeInto(deserialize(a), deserialize(b)))

  def positions(bytes: Array[Byte]): Array[Long] = {
    val b = deserialize(bytes)
    val out = new Array[Long](cardinality(bytes).toInt)
    var k = 0
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val base = e.getKey.toLong << 16
      val words = e.getValue
      var w = 0
      while (w < 1024) {
        var word = words(w)
        while (word != 0) {
          val bit = java.lang.Long.numberOfTrailingZeros(word)
          out(k) = base | (w << 6) | bit
          k += 1
          word &= word - 1
        }
        w += 1
      }
    }
    out
  }

  /** Positions present in `a` but not in `b` (b = null ⇒ all of a) —
    * the changelog's in-window deletion reconstruction.
    */
  def diffPositions(a: Array[Byte], b: Array[Byte]): Array[Long] =
    if (b == null) positions(a)
    else positions(a).filter(p => !contains(b, p))
}
