package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels invoked from generated code (the object compiles to
  * static forwarders on class `Hashing`, so codegen emits a plain
  * `graft.functions.Hashing.polyHash(...)` call and the expression stays
  * inside the WholeStageCodegen span).
  *
  * `polyHash` / `winnow` are *portable*: the exact same arithmetic is
  * expressible in ANSI-ish SQL (DuckDB `list_reduce`/`list_transform`),
  * which is what makes fingerprints oracle-checkable. Internal-only
  * hashes (minhash perms, simhash, LSH) use faster 64-bit mixing.
  */
object Hashing {

  /** Portable polynomial rolling hash over Unicode code points:
    * acc = (acc * 31 + cp) mod 1e9+7. Stays < 2^35, so the same value
    * is computable in any engine with 64-bit integer SQL arithmetic.
    */
  def polyHash(s: UTF8String): Long = polyHashString(s.toString)

  /** Unicode NFC (canonical composition) for [[graft.functions.NfcNormalize]].
    * Fast path: `isNormalized` is O(n) with no allocation and true for
    * virtually all real text (ASCII and precomposed Latin), so the
    * normalizing copy is only paid by rows that actually need it.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Plan-constant string→long probe for [[ConstLongLookup]]: the map
    * is keyed by UTF8String so the per-row probe allocates nothing.
    */
  def constLookup(m: java.util.HashMap[UTF8String, java.lang.Long],
      key: UTF8String, dflt: Long): Long = {
    val v = m.get(key)
    if (v == null) dflt else v.longValue()
  }

  /** Double twin of [[constLookup]] for [[ConstDoubleLookup]]. */
  def constLookupD(m: java.util.HashMap[UTF8String, java.lang.Double],
      key: UTF8String, dflt: Double): Double = {
    val v = m.get(key)
    if (v == null) dflt else v.doubleValue()
  }

  def polyHashString(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03):
    * hash every k-gram of characters, slide a window of w consecutive
    * k-gram hashes, keep the minimum of each window; return the sorted
    * distinct minima. Selects ~2/(w+1) of hashes yet guarantees any
    * match of length >= k + w - 1 shares a fingerprint.
    */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = polyHashString(str.substring(i, i + k)); i += 1 }
    if (m < w) {
      var mn = hs(0); i = 1
      while (i < m) { if (hs(i) < mn) mn = hs(i); i += 1 }
      return new GenericArrayData(Array(mn))
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    val last = m - w
    while (j <= last) {
      var mn = hs(j)
      var t = j + 1
      while (t < j + w) { if (hs(t) < mn) mn = hs(t); t += 1 }
      out.add(mn)
      j += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericArrayData(arr)
  }

  /** Cosine similarity of two float vectors, accumulated in double,
    * strictly left-to-right (index order) so independent engines doing
    * sequential double accumulation agree to ~1 ulp. Returns NaN-free
    * 0.0 for zero-norm inputs.
    */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** [[cosineF]] with a float left side and a DOUBLE right side — the
    * IVF probe ranking uses the trained double-precision centroids
    * directly (downcasting them to float can flip a near-tie probe
    * choice away from the list the corpus assignment put the true
    * nearest neighbor in).
    */
  def cosineFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** 64-bit SimHash (Charikar'02) over a bag of 64-bit token hashes:
    * for each bit position, vote +1/-1 by the token's bit; the sign of
    * the tally is the output bit. Near-identical token sets land within
    * a small Hamming distance.
    */
  def simHash64(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Seeded [[simHash64]]: tallies over mix64(h + seed) instead of the
    * raw element hash, giving an INDEPENDENT 64-bit signature per seed
    * — two seeds compose a 128-bit simhash (more bands ⇒ higher banded
    * recall at the same per-band selectivity).
    */
  def simHash64Seeded(hashes: ArrayData, seed: Long): Long = {
    val counts = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = mix64(hashes.getLong(i) + seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Both halves of the 128-bit simhash in ONE pass over the element
    * array (raw-hash tally + seeded tally) — equals
    * `[simHash64(hs), simHash64Seeded(hs, seed)]` exactly, at half the
    * array-iteration cost. Returns a 2-element long array.
    */
  def simHash128(hashes: ArrayData, seed: Long): ArrayData = {
    val c1 = new Array[Int](64)
    val c2 = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h1 = hashes.getLong(i)
      val h2 = mix64(h1 + seed)
      var b = 0
      while (b < 64) {
        if (((h1 >>> b) & 1L) == 1L) c1(b) += 1 else c1(b) -= 1
        if (((h2 >>> b) & 1L) == 1L) c2(b) += 1 else c2(b) -= 1
        b += 1
      }
      i += 1
    }
    var s1 = 0L; var s2 = 0L
    var b = 0
    while (b < 64) {
      if (c1(b) > 0) s1 |= (1L << b)
      if (c2(b) > 0) s2 |= (1L << b)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(s1, s2))
  }

  /** splitmix64 — statistical 64-bit mixer (public-domain algorithm,
    * Steele et al.); used to derive minhash permutations and LSH
    * hyperplanes deterministically from (seed, index).
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic standard-Gaussian from (seed, i) via Box-Muller on
    * two mix64 draws (enough quality for LSH hyperplanes).
    */
  def gaussian(seed: Long, i: Long): Double = {
    val u1 = (mix64(seed * 0x100000001b3L + 2 * i) >>> 11) * 1.1102230246251565e-16 // [0,1)
    val u2 = (mix64(seed * 0x100000001b3L + 2 * i + 1) >>> 11) * 1.1102230246251565e-16
    val r = math.sqrt(-2.0 * math.log(1.0 - u1)) // 1-u1 in (0,1] avoids log(0)
    r * math.cos(2.0 * math.Pi * u2)
  }

  private val tokenSplit = java.util.regex.Pattern.compile("[^a-z0-9]+")

  /** lower → split on non-alphanumeric runs → drop empties. Must stay
    * semantically identical to TextOps.tokens / the oracle's
    * string_split_regex spelling.
    */
  def tokenize(s: String): Array[String] =
    tokenSplit.split(s.toLowerCase(java.util.Locale.ROOT), -1).filter(_.nonEmpty)

  /** Distinct word n-gram shingles (single-space joined), insertion
    * order. One codegen'd kernel call replaces the interpreted
    * transform/element_at lambda chain, which re-evaluates the
    * tokenizer per element (higher-order functions never codegen).
    */
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(s.toString)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val last = toks.length - n
    val sb = new java.lang.StringBuilder()
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }

  /** FNV-1a 64 + splitmix finalizer over UTF-8 bytes — the internal
    * 64-bit string hash (shingle → minhash/simhash input).
    */
  def fnv64(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    mix64(h)
  }

  /** Distinct word n-gram shingles hashed to 64 bits in one kernel —
    * the zero-allocation-per-row path feeding MinHash/SimHash.
    */
  def shingleHashes(s: UTF8String, n: Int): ArrayData = shingleHashes(s, n, true)

  /** `distinct = true` yields the shingle SET (MinHash/Jaccard input);
    * `false` keeps every occurrence in order (multiset — repetition
    * statistics need the duplicates the set variant collapses).
    */
  def shingleHashes(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val toks = tokenize(s.toString)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val seen = if (distinct) new java.util.LinkedHashSet[java.lang.Long]() else null
    val all = if (distinct) null else new Array[Long](toks.length - n + 1)
    var i = 0
    val last = toks.length - n
    val sb = new java.lang.StringBuilder()
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      val h = fnv64(sb.toString)
      if (distinct) seen.add(h) else all(i) = h
      i += 1
    }
    if (!distinct) return new GenericArrayData(all)
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  /** Distinct 64-bit hashes of the CHARACTER n-grams of a string,
    * SORTED ascending — the q-gram input for edit-distance candidate
    * filtering (the character-level counterpart of [[shingleHashes]]'s
    * word shingles; sorted so [[intersectCount]] runs as a linear
    * merge). Caller lowercases/normalizes upstream; strings shorter
    * than n yield the empty set.
    */
  def charGramHashes(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    if (str.length < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    val last = str.length - n
    while (i <= last) {
      seen.add(fnv64(str.substring(i, i + n)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  /** |A ∩ B| of two SORTED long arrays in one linear merge — the
    * per-pair count-filter kernel (the builtin `array_intersect`
    * builds a hash set per call and evaluates interpreted).
    */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** MinHash-LSH band keys from a doc's set of 64-bit shingle hashes.
    * Permutation i is `min over shingles of mix64(h ^ mix64(seed+i))`
    * (a universal-enough family); the nHashes minima are folded into
    * nBands keys of r = nHashes/nBands rows each, band index mixed in
    * so identical values in different bands never collide. Runs as a
    * narrow per-row kernel: O(|shingles| * nHashes), no state.
    */
  def minHashBandKeys(hashes: ArrayData, seed: Long, nHashes: Int, nBands: Int): ArrayData = {
    val n = hashes.numElements()
    val rows = nHashes / nBands
    val sig = new Array[Long](nHashes)
    var i = 0
    while (i < nHashes) {
      val c = mix64(seed + i)
      var mn = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = mix64(hashes.getLong(j) ^ c)
        if (v < mn) mn = v
        j += 1
      }
      sig(i) = mn
      i += 1
    }
    val keys = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var acc = mix64(0xb0a4d5eedL + b)
      var r = 0
      while (r < rows) { acc = mix64(acc ^ sig(b * rows + r)); r += 1 }
      keys(b) = acc
      b += 1
    }
    new GenericArrayData(keys)
  }

  private val planeCache = new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Array[Double]]]()

  /** nBits random hyperplanes in R^dim, derived purely from the seed —
    * every executor materializes the identical planes with no broadcast.
    */
  def planes(seed: Long, nBits: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((seed, nBits, dim), { _ =>
      Array.tabulate(nBits, dim)((b, d) => gaussian(seed + b * 1315423911L, d))
    })

  /** Z-order (Morton) key: each value is scaled into 16-bit rank space
    * within its column's [min, max], then the bits of up to 4 columns
    * are interleaved. Range-partitioning + sorting on this key clusters
    * files so per-file min/max ranges stay narrow on *every* input
    * column — multi-column data skipping from one layout.
    */
  def zorderKey(vals: Array[Long], mins: Array[Long], maxs: Array[Long]): Long = {
    val n = vals.length
    var z = 0L
    var c = 0
    while (c < n) {
      val lo = mins(c); val hi = maxs(c)
      val range = hi - lo
      val scaled =
        if (range <= 0L) 0L
        else {
          val v = math.min(math.max(vals(c), lo), hi) - lo
          // (v * 65535) / range without overflow for |v| < 2^47
          if (range < (1L << 47)) v * 65535L / range
          else v / (range / 65535L + 1L)
        }
      var b = 0
      while (b < 16) {
        z |= ((scaled >>> b) & 1L) << (b * n + c)
        b += 1
      }
      c += 1
    }
    z
  }

  /** Hilbert-curve key over ≤4 integral columns, same domain scaling
    * as [[zorderKey]] (per-column manifest min/max → 16-bit grid).
    * Hilbert beats Morton on clustering locality: consecutive curve
    * positions are ALWAYS grid-adjacent (Morton's bit-interleave takes
    * long jumps at power-of-two boundaries), so range-partitioned
    * files straddle fewer distinct value ranges per column. Encode is
    * Skilling's transpose algorithm (Skilling 2004, "Programming the
    * Hilbert curve" — public-domain classic) re-derived: inverse-undo
    * + Gray-decode the axes in place, then bit-interleave the
    * transposed coordinates; the codec properties pin bijectivity and
    * the unit-step adjacency invariant on full small grids.
    */
  def hilbertKey(vals: Array[Long], mins: Array[Long], maxs: Array[Long]): Long = {
    val n = vals.length
    val x = new Array[Long](n)
    var c = 0
    while (c < n) {
      val lo = mins(c); val hi = maxs(c)
      val range = hi - lo
      x(c) =
        if (range <= 0L) 0L
        else {
          val v = math.min(math.max(vals(c), lo), hi) - lo
          if (range < (1L << 47)) v * 65535L / range
          else v / (range / 65535L + 1L)
        }
      c += 1
    }
    hilbertIndex(x, 16)
  }

  /** Hilbert index of a point already on the 2^bits grid (n = x.length
    * dims, n·bits ≤ 63). Exposed bits-parametric so the property tests
    * can exhaustively cover full grids at small orders.
    */
  def hilbertIndex(x: Array[Long], bits: Int): Long = {
    val n = x.length
    // Skilling: AxesToTranspose (in place on a copy)
    val t = java.util.Arrays.copyOf(x, n)
    var q = 1L << (bits - 1)
    while (q > 1L) {
      val p = q - 1L
      var i = 0
      while (i < n) {
        if ((t(i) & q) != 0L) t(0) ^= p
        else { val s = (t(0) ^ t(i)) & p; t(0) ^= s; t(i) ^= s }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { t(i) ^= t(i - 1); i += 1 }
    var g = 0L
    q = 1L << (bits - 1)
    while (q > 1L) { if ((t(n - 1) & q) != 0L) g ^= q - 1L; q >>= 1 }
    i = 0
    while (i < n) { t(i) ^= g; i += 1 }
    // interleave the transposed coordinates, MSB-first, dim 0 highest
    var key = 0L
    var b = bits - 1
    while (b >= 0) {
      var d = 0
      while (d < n) {
        key = (key << 1) | ((t(d) >>> b) & 1L)
        d += 1
      }
      b -= 1
    }
    key
  }

  /** Asymmetric-distance (ADC) score for a PQ-coded vector: sum over
    * subspaces m of lut[m*k + code_m], where lut holds the query's
    * per-subspace dot products with every codebook entry.
    */
  def adcScore(codes: ArrayData, lut: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var i = 0
    while (i < m) { s += lut.getDouble(i * k + codes.getInt(i)); i += 1 }
    s
  }

  /** Index of the centroid with maximal cosine to the vector (ties →
    * lowest index). Centroids are pre-normalized, so argmax dot ≡
    * argmax cosine for the ranking (vector norm is a common factor).
    */
  def nearestCentroid(vec: ArrayData, cents: Array[Array[Double]]): Int = {
    val dim = vec.numElements()
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var dot = 0.0
      var i = 0
      val n = math.min(dim, ct.length)
      while (i < n) { dot += vec.getFloat(i).toDouble * ct(i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** Raw dot product of a float vector against a double vector — the
    * un-normalized companion of [[cosineFD]]: IVFPQ's residual ADC
    * score needs dot(q, centroid) on the same scale as the ADC term,
    * which a cosine (divided by |q|) is not.
    */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    dot
  }

  /** SQ8 scalar-quantization encode: per-dim affine map to one byte,
    * code[j] = clamp(rint((x[j] − lo[j]) · invSpan[j] · 255), 0, 255).
    * 4× compression over float32 (64 B vs 256 B at dim 64); values
    * outside the trained [lo, hi] range clamp — standard FAISS
    * SQ8 behavior on out-of-sample data.
    */
  def sqEncode(vec: ArrayData, lo: Array[Double], invSpan: Array[Double]): Array[Byte] = {
    val dim = vec.numElements()
    val out = new Array[Byte](dim)
    var j = 0
    while (j < dim) {
      val q = math.rint((vec.getFloat(j).toDouble - lo(j)) * invSpan(j) * 255.0)
      out(j) = (if (q < 0.0) 0 else if (q > 255.0) 255 else q.toInt).toByte
      j += 1
    }
    out
  }

  /** Dot of an SQ8 code vector (bytes, unsigned) against a double
    * weight vector — the SQ asymmetric-distance scan kernel: with
    * w[j] = q[j]·span[j]/255 this is dot(q, x̂) − dot(q, lo).
    */
  def sqDot(codes: Array[Byte], w: ArrayData): Double = {
    val n = math.min(codes.length, w.numElements())
    var acc = 0.0
    var j = 0
    while (j < n) { acc += (codes(j) & 0xFF).toDouble * w.getDouble(j); j += 1 }
    acc
  }

  /** L2 norm of the vector an SQ8 code RECONSTRUCTS to — precomputed
    * at index-build time so the scan's cosine denominator is a stored
    * column, not per-candidate work.
    */
  def sqRecNorm(codes: Array[Byte], lo: Array[Double], span255: Array[Double]): Double = {
    var acc = 0.0
    var j = 0
    while (j < codes.length) {
      val v = lo(j) + (codes(j) & 0xFF).toDouble * span255(j)
      acc += v * v
      j += 1
    }
    math.sqrt(acc)
  }

  /** Residual of a vector against its NEAREST centroid (classic IVFPQ
    * residual encoding): r = x − c_nearest(x), emitted as floats so the
    * downstream PQ training/encoding path is unchanged. Recomputes the
    * argmax dot (16×64 flops — cheaper than carrying a second column
    * through a join); ties resolve to the lowest index exactly like
    * [[nearestCentroid]], so r always pairs with the assignment the
    * corpus index records.
    */
  def centroidResidual(vec: ArrayData, cents: Array[Array[Double]]): GenericArrayData = {
    val c = cents(nearestCentroid(vec, cents))
    val dim = vec.numElements()
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      out(i) = (vec.getFloat(i).toDouble - (if (i < c.length) c(i) else 0.0)).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sign-random-projection LSH signature: bit b = [vec . plane_b >= 0]. */
  def lshSignature(vec: ArrayData, seed: Long, nBits: Int): Long = {
    val dim = vec.numElements()
    val ps = planes(seed, nBits, dim)
    var sig = 0L
    var b = 0
    while (b < nBits) {
      val p = ps(b)
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += vec.getFloat(i).toDouble * p(i); i += 1 }
      if (dot >= 0.0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
