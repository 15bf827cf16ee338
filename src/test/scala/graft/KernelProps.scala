package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Hashing
import graft.lake.{ColStat, FileEntry, Pruning}

/** ScalaCheck properties for the driver-side pruning decision logic and
  * the sketch kernels — the invariants the DuckDB oracles can't see
  * (soundness of skipping, winnowing's match guarantee).
  */
object NfcProps extends Properties("NfcNormalize") {
  private val anyStr: Gen[String] = Gen.listOf(Gen.frequency(
    (6, Gen.alphaNumChar),
    (2, Gen.oneOf('é', '́', 'Å', '̊', 'e', 'A')),
    (1, Gen.oneOf('中', '\uD83D', '\uDE00')) // CJK + lone surrogates
  )).map(_.mkString)

  // the kernel must agree with the JDK normalizer verbatim (modulo the
  // isNormalized fast path), including on malformed surrogate content —
  // UTF8String round-trips lone surrogates as replacement chars, so
  // compare after the same round-trip the engine itself performs
  property("agrees with java.text.Normalizer NFC") = forAll(anyStr) { s0 =>
    val s = UTF8String.fromString(s0).toString // engine-visible content
    val got = Hashing.nfc(UTF8String.fromString(s)).toString
    got == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }

  property("idempotent and ASCII-identity") = forAll(Gen.asciiPrintableStr) { s =>
    val once = Hashing.nfc(UTF8String.fromString(s))
    (once.toString == s) && (Hashing.nfc(once).toString == once.toString)
  }
}

object PruningProps extends Properties("Pruning") {

  private val vals = Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L))

  private case class P(op: String, bound: Long)
  private val pred: Gen[List[P]] = Gen.listOfN(3,
    for {
      op <- Gen.oneOf("=", "<", "<=", ">", ">=")
      b <- Gen.chooseNum(-1000L, 1000L)
    } yield P(op, b))

  private def evalRow(v: Long, ps: List[P]): Boolean = ps.forall {
    case P("=", b)  => v == b
    case P("<", b)  => v < b
    case P("<=", b) => v <= b
    case P(">", b)  => v > b
    case P(">=", b) => v >= b
    case _          => true
  }

  private def toConstraint(ps: List[P]): Pruning.Constraint =
    ps.map {
      case P("=", b)  => Pruning.Constraint(eqs = Some(Set[Any](b)))
      case P("<", b)  => Pruning.Constraint(hi = Some((b, false)))
      case P("<=", b) => Pruning.Constraint(hi = Some((b, true)))
      case P(">", b)  => Pruning.Constraint(lo = Some((b, false)))
      case P(">=", b) => Pruning.Constraint(lo = Some((b, true)))
      case _          => Pruning.Constraint()
    }.foldLeft(Pruning.Constraint())(_.and(_))

  /** SOUNDNESS: a file whose rows contain ANY match must survive. */
  property("never prunes a file containing a matching row") =
    forAll(vals, pred) { (vs, ps) =>
      val file = FileEntry("f", Map.empty, vs.size.toLong, 0L,
        Map("c" -> ColStat("long", vs.min.toString, vs.max.toString, 0L)))
      val c = toConstraint(ps)
      val anyMatch = vs.exists(evalRow(_, ps))
      val survives = !c.impossible &&
        Pruning.fileSurvives(file, Map("c" -> c),
          Map("c" -> org.apache.spark.sql.types.LongType))
      Prop(!anyMatch || survives) :| s"dropped a file with matches: $vs $ps"
    }

  /** A contradiction must be detected whenever no value can satisfy. */
  property("impossible constraints reject every value") =
    forAll(pred) { ps =>
      val c = toConstraint(ps)
      !c.impossible || (-1000L to 1000L).forall(v => !evalRow(v, ps))
    }

  /** Partition-value pruning agrees with direct evaluation. */
  property("partition accepts() matches row evaluation") =
    forAll(Gen.chooseNum(-1000L, 1000L), pred) { (v, ps) =>
      val c = toConstraint(ps)
      c.impossible || (c.accepts(v) == evalRow(v, ps))
    }
}

object KernelProps extends Properties("Kernels") {

  private val word = Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOfN(30, word).map(_.mkString(" "))

  /** Winnowing guarantee (Schleimer'03): two strings sharing a
    * substring of length >= k + w - 1 share at least one fingerprint.
    */
  property("winnow: shared long substring => shared fingerprint") =
    forAll(text, text, text) { (a, common, b) =>
      val k = 8; val w = 4
      (common.length >= k + w - 1) ==> {
        val s1 = a + " " + common
        val s2 = common + " " + b
        val f1 = Hashing.winnow(UTF8String.fromString(s1), k, w).toLongArray().toSet
        val f2 = Hashing.winnow(UTF8String.fromString(s2), k, w).toLongArray().toSet
        Prop(f1.intersect(f2).nonEmpty) :| s"no shared fingerprint for common='$common'"
      }
    }

  private val hashSet = Gen.nonEmptyListOf(Gen.long).map(_.distinct)

  /** MinHash bands are permutation-invariant and deterministic. */
  property("minhash bands: order-invariant, deterministic") =
    forAll(hashSet) { hs =>
      val a = Hashing.minHashBandKeys(new GenericArrayData(hs.toArray), 7L, 128, 32)
      val b = Hashing.minHashBandKeys(new GenericArrayData(scala.util.Random.shuffle(hs).toArray), 7L, 128, 32)
      a.toLongArray().toSeq == b.toLongArray().toSeq
    }

  /** Identical token sets => identical simhash; hamming is symmetric. */
  property("simhash: set-identity and determinism") =
    forAll(hashSet) { hs =>
      val a = Hashing.simHash64(new GenericArrayData(hs.toArray))
      val b = Hashing.simHash64(new GenericArrayData(hs.reverse.toArray))
      a == b
    }

  /** Cosine kernel bounds and symmetry on random float vectors. */
  property("adc score equals the reference sum of table lookups") =
    forAll(Gen.listOfN(8, Gen.chooseNum(0, 15)),
           Gen.listOfN(128, Gen.chooseNum(-10.0, 10.0))) { (codes, lut) =>
      val got = Hashing.adcScore(
        new GenericArrayData(codes.toArray),
        new GenericArrayData(lut.toArray), 16)
      val want = codes.zipWithIndex.map { case (c, m) => lut(m * 16 + c) }.sum
      math.abs(got - want) < 1e-12
    }

  property("cosine in [-1,1] and symmetric") =
    forAll(Gen.listOfN(16, Gen.chooseNum(-10f, 10f)),
           Gen.listOfN(16, Gen.chooseNum(-10f, 10f))) { (x, y) =>
      val a = new GenericArrayData(x.toArray)
      val b = new GenericArrayData(y.toArray)
      val c1 = Hashing.cosineF(a, b)
      val c2 = Hashing.cosineF(b, a)
      c1 >= -1.0000001 && c1 <= 1.0000001 && math.abs(c1 - c2) < 1e-12
    }

  property("cosineFD agrees with cosineF on double-widened inputs") =
    forAll(Gen.listOfN(16, Gen.chooseNum(-10f, 10f)),
           Gen.listOfN(16, Gen.chooseNum(-10f, 10f))) { (x, y) =>
      val ff = Hashing.cosineF(
        new GenericArrayData(x.toArray), new GenericArrayData(y.toArray))
      val fd = Hashing.cosineFD(
        new GenericArrayData(x.toArray),
        new GenericArrayData(y.map(_.toDouble).toArray))
      math.abs(ff - fd) < 1e-12
    }

  property("centroidResidual pairs with nearestCentroid and reconstructs") =
    forAll(Gen.listOfN(8, Gen.chooseNum(-5f, 5f)),
           Gen.listOfN(3, Gen.listOfN(8, Gen.chooseNum(-1.0, 1.0)))) { (v, cs) =>
      val cents = cs.map(_.toArray).toArray
      val vec = new GenericArrayData(v.toArray)
      val c = Hashing.nearestCentroid(vec, cents)
      val r = Hashing.centroidResidual(vec, cents)
      // x = c + r within float rounding, dimension by dimension
      (0 until 8).forall { i =>
        math.abs(v(i) - (cents(c)(i) + r.getFloat(i))) < 1e-4
      }
    }

  private val sqVec = Gen.listOfN(8, Gen.chooseNum(-4f, 4f))

  property("sq8: encode/decode error per dim is at most half a quantization step") =
    forAll(sqVec) { v =>
      val lo = Array.fill(8)(-5.0)
      val span = Array.fill(8)(10.0)
      val codes = Hashing.sqEncode(new GenericArrayData(v.toArray),
        lo, span.map(1.0 / _))
      (0 until 8).forall { j =>
        val rec = lo(j) + (codes(j) & 0xFF).toDouble * span(j) / 255.0
        // in-range values reconstruct within half a step (span/255/2)
        math.abs(rec - v(j)) <= span(j) / 255.0 / 2 + 1e-9
      }
    }

  property("sq8: out-of-range values clamp to the range ends") =
    forAll(Gen.oneOf(-100f, 100f)) { x =>
      val lo = Array.fill(1)(-5.0); val invSpan = Array.fill(1)(0.1)
      val c = Hashing.sqEncode(new GenericArrayData(Array(x)), lo, invSpan)(0) & 0xFF
      if (x < -5f) c == 0 else c == 255
    }

  property("sq8: sqDot equals the reference sum and bounds the true dot error") =
    forAll(sqVec, sqVec) { (v, q) =>
      val lo = Array.fill(8)(-5.0)
      val span = Array.fill(8)(10.0)
      val codes = Hashing.sqEncode(new GenericArrayData(v.toArray),
        lo, span.map(1.0 / _))
      // the scan identity: dot(q, x̂) = dot(q, lo) + sqDot(codes, w)
      val w = q.toArray.zipWithIndex.map { case (x, j) => x * span(j) / 255.0 }
      val bias = q.toArray.zipWithIndex.map { case (x, j) => x * lo(j) }.sum
      val approx = bias + Hashing.sqDot(codes, new GenericArrayData(w.map(_.toDouble)))
      val exact = v.zip(q).map { case (a, b) => a.toDouble * b.toDouble }.sum
      // per-dim error ≤ half-step ⇒ |dot error| ≤ Σ|q_j|·step/2
      val bound = q.map(x => math.abs(x) * 10.0 / 255.0 / 2).sum + 1e-6
      math.abs(approx - exact) <= bound
    }

  property("sq8: sqRecNorm equals the norm of the reconstruction") =
    forAll(sqVec) { v =>
      val lo = Array.fill(8)(-5.0)
      val span = Array.fill(8)(10.0)
      val span255 = span.map(_ / 255.0)
      val codes = Hashing.sqEncode(new GenericArrayData(v.toArray),
        lo, span.map(1.0 / _))
      val rec = (0 until 8).map(j => lo(j) + (codes(j) & 0xFF).toDouble * span255(j))
      math.abs(Hashing.sqRecNorm(codes, lo, span255) -
        math.sqrt(rec.map(x => x * x).sum)) < 1e-9
    }
}

/** Iceberg single-value binary serialization (spec Appendix D) —
  * encode/decode must round-trip every stat value a graft manifest
  * can hold, at the spec's exact widths and byte order.
  */
object IcebergBoundProps extends Properties("IcebergBounds") {
  import org.apache.spark.sql.types._
  import graft.lake.IcebergAvro.{decodeBound, encodeBound}

  property("long bounds round-trip at 8 bytes LE") =
    forAll { (v: Long) =>
      val b = encodeBound(LongType, v.toString)
      b.remaining() == 8 && decodeBound(LongType, b) == v.toString
    }

  property("int bounds round-trip at 4 bytes") =
    forAll(Gen.chooseNum(Int.MinValue, Int.MaxValue)) { v =>
      val b = encodeBound(IntegerType, v.toString)
      b.remaining() == 4 && decodeBound(IntegerType, b) == v.toString
    }

  property("double bounds round-trip bit-exactly") =
    forAll(Gen.chooseNum(-1e12, 1e12)) { v =>
      decodeBound(DoubleType, encodeBound(DoubleType, v.toString)).toDouble == v.toString.toDouble
    }

  property("string bounds round-trip any unicode") =
    forAll(Gen.alphaNumStr.flatMap(s => Gen.oneOf(s, s + "é", s + "中"))) { s =>
      decodeBound(StringType, encodeBound(StringType, s)) == s
    }

  property("date bounds round-trip ISO dates at 4 bytes") =
    forAll(Gen.chooseNum(-20000, 40000)) { epochDay =>
      val iso = java.time.LocalDate.ofEpochDay(epochDay.toLong).toString
      val b = encodeBound(DateType, iso)
      b.remaining() == 4 && decodeBound(DateType, b) == iso
    }

  property("little-endian: low byte first for integral types") =
    forAll(Gen.chooseNum(0, 255)) { v =>
      encodeBound(LongType, v.toString).get(0) == v.toByte &&
        encodeBound(IntegerType, v.toString).get(0) == v.toByte
    }
}

/** Hilbert-curve encode ([[Hashing.hilbertIndex]]): exhaustive small
  * grids pin the two defining invariants — bijectivity onto
  * [0, 2^(n·bits)) and UNIT-STEP adjacency of consecutive curve
  * positions (the locality property Morton lacks at power-of-two
  * boundaries).
  */
object HilbertProps extends Properties("Hilbert") {
  import graft.functions.Hashing.hilbertIndex

  private def fullGrid(n: Int, bits: Int): Map[Long, Array[Long]] = {
    val side = 1 << bits
    def rec(d: Int, acc: List[Long]): Iterator[Array[Long]] =
      if (d == 0) Iterator(acc.toArray)
      else (0 until side).iterator.flatMap(v => rec(d - 1, v.toLong :: acc))
    rec(n, Nil).map(p => hilbertIndex(p, bits) -> p).toMap
  }

  property("bijective and unit-step adjacent on full grids (n=2..4, bits=2..4)") =
    Prop.all((for (n <- 2 to 4; bits <- 2 to 4) yield {
      val m = fullGrid(n, bits)
      val total = math.pow(1 << bits, n).toLong
      val bij = m.size.toLong == total && m.keys.forall(k => k >= 0 && k < total)
      val adj = (0L until total - 1).forall { k =>
        m(k).zip(m(k + 1)).map { case (a, b) => math.abs(a - b) }.sum == 1L
      }
      (bij && adj) :| s"n=$n bits=$bits"
    }): _*)

  property("hilbertKey clamps and scales like zorderKey (domain edges stable)") =
    forAll(Gen.chooseNum(-1000L, 1000L), Gen.chooseNum(1L, 1000L)) { (lo, span) =>
      val mins = Array(lo, lo); val maxs = Array(lo + span, lo + span)
      val below = graft.functions.Hashing.hilbertKey(Array(lo - 50, lo), mins, maxs)
      val atLo = graft.functions.Hashing.hilbertKey(Array(lo, lo), mins, maxs)
      val above = graft.functions.Hashing.hilbertKey(Array(lo + span + 50, lo + span), mins, maxs)
      val atHi = graft.functions.Hashing.hilbertKey(Array(lo + span, lo + span), mins, maxs)
      below == atLo && above == atHi
    }
}

/** The deletion-vector bitmap codec ([[graft.lake.GraftDv]]): set
  * semantics over the serialized form, both container flavors (sparse
  * ARRAY ≤ 4096, dense BITMAP), and canonical bytes.
  */
object GraftDvProps extends Properties("GraftDv") {
  import graft.lake.GraftDv

  // position sets spanning sparse AND dense containers: a dense cluster
  // inside one 64Ki chunk (forces BITMAP) plus scattered positions
  // (force ARRAY), up to the 2^47 position ceiling
  private val posSet: Gen[Set[Long]] = for {
    scatter <- Gen.listOf(Gen.chooseNum(0L, (1L << 40) - 1))
    base <- Gen.chooseNum(0L, 1L << 20)
    denseN <- Gen.chooseNum(0, 6000)
  } yield (scatter ++ (0 until denseN).map(i => base + i * 2L)).toSet

  private def ser(s: Set[Long]): Array[Byte] = GraftDv.fromPositions(s.iterator)

  property("contains == set membership (hits and misses)") = forAll(posSet) { s =>
    val bytes = ser(s)
    val probesIn = s.take(50)
    val probesOut = s.take(50).map(_ + 1).filterNot(s.contains) ++
      Seq(0L, 65535L, 65536L, (1L << 46) + 7).filterNot(s.contains)
    probesIn.forall(GraftDv.contains(bytes, _)) &&
      probesOut.forall(!GraftDv.contains(bytes, _))
  }

  property("positions round-trips and cardinality is exact") = forAll(posSet) { s =>
    val bytes = ser(s)
    GraftDv.positions(bytes).toSet == s &&
      GraftDv.cardinality(bytes) == s.size.toLong
  }

  property("union == set union; serialization is canonical") =
    forAll(posSet, posSet) { (a, b) =>
      val u = GraftDv.union(ser(a), ser(b))
      GraftDv.positions(u).toSet == (a ++ b) &&
        java.util.Arrays.equals(u, ser(a ++ b))
    }

  property("diffPositions == set difference; null prior = all") =
    forAll(posSet, posSet) { (a, b) =>
      GraftDv.diffPositions(ser(a), ser(b)).toSet == (a -- b) &&
        GraftDv.diffPositions(ser(a), null).toSet == a
    }

  property("builder merge matches union across chunk boundaries") =
    forAll(posSet, posSet) { (a, b) =>
      val ba = GraftDv.newBuilder(); a.foreach(GraftDv.add(ba, _))
      val bb = GraftDv.newBuilder(); b.foreach(GraftDv.add(bb, _))
      GraftDv.positions(GraftDv.serialize(GraftDv.mergeInto(ba, bb))).toSet == (a ++ b)
    }

  // GDV1 is the committed-table legacy format: the read path must keep
  // answering it bit-for-bit like GDV2 (contains/positions/cardinality),
  // and a deserialize→serialize round-trip must UPGRADE it to GDV2
  private def serLegacy(s: Set[Long]): Array[Byte] = {
    val b = GraftDv.newBuilder(); s.foreach(GraftDv.add(b, _))
    GraftDv.serializeLegacy(b)
  }

  property("legacy GDV1 bytes answer identically to GDV2") = forAll(posSet) { s =>
    val v1 = serLegacy(s)
    val v2 = ser(s)
    val probes = s.take(50) ++ s.take(50).map(_ + 1) ++
      Seq(0L, 65535L, 65536L, (1L << 46) + 7)
    probes.forall(p => GraftDv.contains(v1, p) == GraftDv.contains(v2, p)) &&
      GraftDv.positions(v1).toSet == s &&
      GraftDv.cardinality(v1) == s.size.toLong
  }

  property("GDV1 round-trips through the builder into canonical GDV2") =
    forAll(posSet) { s =>
      java.util.Arrays.equals(
        GraftDv.serialize(GraftDv.deserialize(serLegacy(s))), ser(s))
    }
}
