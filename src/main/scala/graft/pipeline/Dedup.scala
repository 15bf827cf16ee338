package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Mat, Tables}
import graft.functions.exprs

/** Deduplication operators (SURVEY.md §2.C1–C4). The family, in the
  * order a 100 TB pipeline composes them:
  *
  *  - exact: one hash-groupBy — a single shuffle on the content hash.
  *  - MinHash+LSH: candidate generation whose shuffle volume is
  *    O(docs × bands), never O(docs²); within-bucket pair expansion is
  *    capped, and candidates are then *verified* with exact Jaccard so
  *    the output is exact above the threshold (LSH only affects recall,
  *    which at 32 bands × 4 rows is ≈1 for J ≥ 0.5… see spec).
  *  - SimHash: 64-bit sketch, Hamming-band buckets — same shape, denser
  *    sketch (1 long vs 128 minima), coarser guarantee.
  *  - n-gram Jaccard: the exact verifier run over an inverted shingle
  *    index (co-occurrence join) — the ground truth the sketches
  *    approximate. At 100 TB you run this only on LSH candidates.
  */
object Dedup {

  val JaccardThreshold = 0.5
  val Seed = 0x9a27L
  /** Skew guard: a degenerate LSH bucket (e.g. a boilerplate shingle
    * set shared by thousands of docs) contributes at most cap² pairs
    * instead of stalling one reducer; real pipelines quarantine such
    * buckets for template-dedup instead.
    */
  val BucketCap = 200

  /** Posting-list skew guard for the inverted-index join (C4): a
    * shingle present in k documents emits k² candidate rows from the
    * self-join, so one boilerplate shingle shared by 10⁵ docs would
    * stall a reducer with 10¹⁰ rows. Shingles with document frequency
    * above this cap are dropped BEFORE the join — they carry almost no
    * Jaccard signal (everything matches them), exactly like minhash's
    * `BucketCap`. Recall: a true near-dup pair sharing ≥ 1 sub-cap
    * shingle still surfaces; pairs whose overlap is ONLY boilerplate
    * are template duplicates owned by exact dedup (C1) / minhash (C2).
    */
  val PostingDfCap = 1000

  /** (doc_id, shs: array<string>) — the shingle *set* per document,
    * via the codegen'd [[graft.functions.WordShingles]] kernel (the
    * equivalent transform/element_at lambda chain evaluates interpreted
    * and re-runs the tokenizer per element — 40× slower at sf0.1).
    */
  private def shinglesOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), exprs.wordShingles(col("text"), 3).as("shs"))

  /** (doc_id, hs: array<long>) — 64-bit-hashed shingle set, the sketch
    * input (no string materialization at all).
    */
  private[graft] def shingleHashesOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), exprs.shingleHashes(col("text"), 3).as("hs"))

  private def docShingleHashes(s: SparkSession, d: String): DataFrame =
    shingleHashesOf(Tables.documents(s, d))

  /** C1 `dedup_exact`: content-hash groups. One partial-agg-friendly
    * shuffle; `keeper` = min doc id is the row you'd retain.
    */
  def exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .orderBy(col("keeper"))

  val exactSql: String =
    """SELECT md5(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS keeper
      |FROM documents GROUP BY 1 ORDER BY keeper""".stripMargin

  /** C47 `dedup_normalized`: exact dedup AFTER text normalization —
    * the RefinedWeb/CCNet "fuzzy-exact" pass: collapse whitespace
    * runs to one space, lowercase, trim, then group on the md5 of
    * the normalized text. The shuffle key is the 128-bit digest,
    * never the document body — at 100 TB the exchange moves 16 B +
    * ids per row. Output is the row-level verdict (canonical =
    * lowest doc_id in the group, kept = doc_id == canonical) via a
    * map-side-combined groupBy + hash join back — C1's group shape
    * APPLIED per document, catching duplicates that differ only in
    * case/whitespace, which raw-text C1 misses by construction.
    */
  def normalized(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // explicit whitespace class, not \s: Java's \s includes VT (\x0B)
    // while RE2's (the oracle engine) does not — spell out the same six
    // characters on both sides so the group key can never diverge
    val h = md5(trim(lower(regexp_replace(col("text"), "[ \\t\\n\\x0B\\f\\r]+", " ")))
      .cast("binary"))
    val n = docs.select(col("doc_id"), h.as("h"))
    val canon = n.groupBy(col("h")).agg(min(col("doc_id")).as("canon_id"))
    n.join(canon, "h")
      .select(col("doc_id"), col("canon_id"),
        (col("doc_id") === col("canon_id")).as("kept"))
      .orderBy(col("doc_id"))
  }

  val normalizedSql: String =
    """WITH n AS (SELECT doc_id,
      |  md5(trim(lower(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')))) AS h
      |  FROM documents),
      |c AS (SELECT h, min(doc_id) AS canon_id FROM n GROUP BY h)
      |SELECT doc_id, canon_id, doc_id = canon_id AS kept
      |FROM n JOIN c USING (h) ORDER BY doc_id""".stripMargin

  /** Exact Jaccard for a pair df carrying shingle arrays shs_a/shs_b.
    * Pairs of empty shingle sets are dropped BEFORE the division: two
    * sub-shingle-length docs share no content evidence (and 0/0 is a
    * crash under ANSI mode, which every empty document would trigger).
    */
  private def verified(pairs: DataFrame): DataFrame =
    verifiedUnordered(pairs).orderBy(col("doc_a"), col("doc_b"))

  /** [[verified]] without the final global sort — for consumers that
    * aggregate, join, or materialize (localCheckpoint) the pair set:
    * a checkpoint executes the plan as written, so an inherited
    * `orderBy` there costs a full range-exchange + sort that nothing
    * downstream reads (r13 optimization; the catalyst EliminateSorts
    * rule only saves the lazy consumers, never a checkpointed one).
    */
  private def verifiedUnordered(pairs: DataFrame): DataFrame = {
    val inter = size(array_intersect(col("shs_a"), col("shs_b")))
    val union = size(col("shs_a")) + size(col("shs_b")) - inter
    pairs
      .withColumn("inter_n", inter)
      .withColumn("union_n", union)
      .filter(col("union_n") > 0)
      .withColumn("jaccard_raw", col("inter_n").cast("double") / col("union_n"))
      .filter(col("jaccard_raw") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard_raw"), 6).as("jaccard"))
  }

  private def joinShingleSets(docs: DataFrame, cand0: DataFrame): DataFrame = {
    // keys-first prune (r14, guide §3.2 shape): semi-join the shingle-
    // set table on the candidate doc ids BEFORE the doc_a/doc_b payload
    // joins, so at 100 TB the expensive string-shingle materialization
    // runs only for docs that appear in a candidate pair (the semi-join
    // pushes below the shinglesOf projection — join key doc_id exists
    // under it). cand is lazily cached: it feeds the id set and both
    // joins, and its candidate-generation subtree must execute once.
    val cand = Mat.smallLazy(cand0)
    // no distinct: a LEFT SEMI probe tolerates duplicate ids, and the
    // distinct would cost an extra exchange for nothing
    val ids = cand
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
    val sets = shinglesOf(docs).join(ids, Seq("doc_id"), "left_semi")
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shs").as("shs_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shs").as("shs_b")), "doc_b")
  }

  /** All unordered pairs (a<b) from a sorted, capped id bucket.
    * `private[pipeline]`: the image perceptual-hash dedup (C58) banding
    * reuses the identical within-bucket expansion.
    */
  private[pipeline] def bucketPairs(ids: Column): Column = {
    val capped = slice(array_sort(ids), 1, BucketCap)
    flatten(transform(capped, (a, i) =>
      transform(slice(capped, i + lit(2), lit(BucketCap)), b => struct(a.as("doc_a"), b.as("doc_b")))))
  }

  /** C2 `dedup_minhash`: shingle → 128-perm MinHash → 32 LSH band keys
    * (codegen'd [[graft.functions.MinHashBands]]) → band-bucket join →
    * capped pair expansion → exact-Jaccard verification. Shuffles:
    * one explode/groupBy on band keys + one pair join — both keyed,
    * both AQE-splittable. The oracle is the *exact* J ≥ 0.5 pair set;
    * matching it is the recall-≈-1 evidence.
    */
  def minhash(s: SparkSession, d: String): DataFrame =
    minhashOf(Tables.documents(s, d))

  def minhashOf(docs: DataFrame): DataFrame = {
    val sigs = shingleHashesOf(docs)
      .select(col("doc_id"),
        exprs.minHashBands(col("hs"), Seed, 128, 32).as("bands"))
    val cand = sigs
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "key")))
      .groupBy(col("band"), col("key"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(bucketPairs(col("ids"))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
    verified(joinShingleSets(docs, cand))
  }

  /** C3 `dedup_simhash`: 128-bit SimHash over the trigram-shingle set
    * (unigram bags are near-identical across small-vocab corpora, so
    * the sketch hashes the same discriminative feature the Jaccard ops
    * use). The signature is TWO independent 64-bit simhashes (the
    * second tallies seed-mixed element hashes), cut into 16 × 8-bit
    * Hamming bands for candidates, then — like [[minhashOf]] — EXACT
    * Jaccard verification, so precision is 1 by construction and
    * recall is the sketch's knob. The round-3 64-bit/8-band gear
    * missed nine J ≥ 0.5 pairs at sf0.1 (Hamming 9–17 spread over
    * every band); doubling the signature doubles the band count at the
    * SAME per-band selectivity, and the measured result is band-miss 0
    * at sf0.001/0.01/0.1 (max in-gate pair Hamming 24 of 128) — which
    * is why C3 carries the exact-set oracle again. The claim is
    * measured-on-corpus, not analytic; [[simhashCheck]] keeps the
    * scale-true invariants (precision ⊆ exact set, Hamming ≤
    * [[SimHammingBound]] on every candidate) oracled at every scale.
    */
  def simhash(s: SparkSession, d: String): DataFrame =
    simhashOf(Tables.documents(s, d))

  /** Second-signature seed and the candidate Hamming bound (of 128).
    * 32 = 25% disagreement: in-gate pairs measure ≤ 24, random pairs
    * concentrate at 64 ± 5.7, so the bound rejects random band
    * collisions at ~5.7σ while never clipping a true pair.
    */
  val SimSeed2 = 0x5EEDL
  val SimHammingBound = 32L

  def simhashOf(docs: DataFrame): DataFrame =
    verified(joinShingleSets(docs,
      simhashCandidates(docs).select(col("doc_a"), col("doc_b"))))

  /** C3's INVARIANT check as a driver entry (VALUES-style oracle, valid
    * at every scale): (1) precision — every verified simhash pair is in
    * the exact J ≥ 0.5 pair set; (2) the Hamming ≤ [[SimHammingBound]]
    * bound holds on every candidate the bands emit. Both are structural
    * guarantees of the implementation; they stay true on corpora where
    * the measured-recall-1 equality oracle would be too strong a claim.
    */
  def simhashCheck(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val verifiedPairs = simhashOf(docs).select(col("doc_a"), col("doc_b"))
    // ground truth must be the UNCAPPED exact pair set: simhash verifies
    // candidates against full shingle sets, so a pair whose shared
    // shingles are all boilerplate (df > PostingDfCap) is a legitimate
    // output here but absent from the capped C4 index — using the capped
    // set would raise spurious precision violations on template-heavy
    // corpora.
    val exactPairs = ngramJaccardPairsOf(docs, postingDfCap = Int.MaxValue)
      .select(col("doc_a"), col("doc_b"))
    val precisionViolations =
      verifiedPairs.join(exactPairs, Seq("doc_a", "doc_b"), "left_anti").count()
    // the Hamming bound must be verified INDEPENDENTLY of the candidate
    // pipeline's own filter (counting `hamming > bound` on a frame that
    // just filtered `hamming <= bound` is tautological): recompute each
    // candidate pair's distance from signatures produced by the
    // two-expression path — a different kernel than the fused
    // simHash128 the operator uses — and flag both bound breaches and
    // any disagreement between the kernels
    val ref = shingleHashesOf(docs).select(col("doc_id"),
      exprs.simHash(col("hs")).as("r1"),
      exprs.simHashSeeded(col("hs"), SimSeed2).as("r2"))
    val hammingViolations = simhashCandidates(docs)
      .join(ref.select(col("doc_id").as("doc_a"),
        col("r1").as("a1"), col("r2").as("a2")), "doc_a")
      .join(ref.select(col("doc_id").as("doc_b"),
        col("r1").as("b1"), col("r2").as("b2")), "doc_b")
      .withColumn("ref_hamming",
        (bit_count(col("a1").bitwiseXOR(col("b1"))) +
         bit_count(col("a2").bitwiseXOR(col("b2")))).cast("long"))
      .filter(col("ref_hamming") > SimHammingBound ||
              col("ref_hamming") =!= col("hamming"))
      .count()
    import s.implicits._
    Seq((precisionViolations, hammingViolations))
      .toDF("precision_violations", "hamming_violations")
  }

  val simhashCheckSql: String =
    "SELECT CAST(0 AS BIGINT) AS precision_violations, CAST(0 AS BIGINT) AS hamming_violations"

  /** Raw simhash candidate pairs with their Hamming distance (the
    * sketch stage alone, pre-verification — used by specs to bound the
    * sketch's behavior directly).
    */
  def simhashCandidates(docs: DataFrame): DataFrame = {
    val sigs = shingleHashesOf(docs)
      .select(col("doc_id"), exprs.simHash128(col("hs"), SimSeed2).as("sig"))
      .select(col("doc_id"),
        element_at(col("sig"), 1).as("sim1"), element_at(col("sig"), 2).as("sim2"))
    // 16 bands × 8 bits over the 128-bit signature: a true pair
    // escapes only if EVERY band holds a differing bit. Each band is
    // still 8 bits (same ~n/256 random bucket occupancy — no skew
    // change); doubling the signature buys recall purely through band
    // COUNT. The combined-Hamming filter then discards the random
    // collisions cheaply before the exact verification join.
    val bandCols =
      (0 to 7).map(b => shiftrightunsigned(col("sim1"), b * 8).bitwiseAND(lit(0xFFL))) ++
      (0 to 7).map(b => shiftrightunsigned(col("sim2"), b * 8).bitwiseAND(lit(0xFFL)))
    val banded = sigs.select(
      col("doc_id"), col("sim1"), col("sim2"),
      posexplode(array(bandCols: _*)).as(Seq("band", "key")))
    val cand = banded
      .groupBy(col("band"), col("key"))
      .agg(collect_list(struct(col("doc_id"), col("sim1"), col("sim2"))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(explode(bucketPairs(col("xs"))).as("p"))
      .select(col("p.doc_a.doc_id").as("doc_a"),
              col("p.doc_a.sim1").as("a1"), col("p.doc_a.sim2").as("a2"),
              col("p.doc_b.doc_id").as("doc_b"),
              col("p.doc_b.sim1").as("b1"), col("p.doc_b.sim2").as("b2"))
      .distinct()
    cand
      .withColumn("hamming",
        (bit_count(col("a1").bitwiseXOR(col("b1"))) +
         bit_count(col("a2").bitwiseXOR(col("b2")))).cast("long"))
      .filter(col("hamming") <= SimHammingBound)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** C4 `dedup_ngram_jaccard`: exact all-pairs Jaccard via an inverted
    * shingle index — pairs are generated only for docs sharing a
    * shingle (a keyed co-occurrence join), then aggregated to
    * intersection counts. This is the ground-truth verifier; at 100 TB
    * it runs per-LSH-candidate (C2), not globally.
    */
  def ngramJaccard(s: SparkSession, d: String): DataFrame =
    ngramJaccardOf(Tables.documents(s, d))

  def ngramJaccardOf(docs: DataFrame, postingDfCap: Int = PostingDfCap): DataFrame =
    ngramJaccardPairsOf(docs, postingDfCap).orderBy(col("doc_a"), col("doc_b"))

  /** [[ngramJaccardOf]] without the final presentation sort — the form
    * internal consumers (clustering, the threshold sweep) compose on.
    */
  private[graft] def ngramJaccardPairsOf(docs: DataFrame,
      postingDfCap: Int = PostingDfCap): DataFrame = {
    // inverted index on 64-bit shingle hashes: long join/group keys
    // shuffle ~3× less than the shingle strings; a hash collision can
    // only ADD a candidate (never lose one), and the exact string-set
    // verification filters those out.
    // the exploded posting stream materializes ONCE (fault-tolerant
    // persist, see [[graft.Mat]]): the earlier agg + join + two
    // self-join sides planned the tokenize + shingle chain three times
    // with no exchange reuse (r13 optimization). Repartitioned BY THE
    // JOIN KEY before caching — the same one exchange of the postings
    // r13's count-window paid, but with NO per-key buffering, and the
    // cached hashpartitioning(sh) serves the df groupBy, the cap
    // anti-join AND both self-join sides exchange-free.
    val sh0 = Mat.fact(shingleHashesOf(docs)
      .select(col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("sh"))
      .repartition(col("sh")))
    // [[PostingDfCap]]: drop boilerplate shingles (document frequency
    // above the cap) before the self-join — the quadratic pair blow-up
    // is bounded at cap² per shingle. df comes from a map-side-combined
    // groupBy over the cached stream and the cap lands as a LEFT ANTI
    // join against the (tiny) over-cap shingle set, which AQE
    // broadcasts — NOT as a count window, which would buffer every
    // instance of exactly the hot boilerplate shingles the cap exists
    // to kill inside one window task (r13's skew regression, r14 fix:
    // guide §2.5 — AQE skew handling applies to joins, never windows).
    val sh =
      if (postingDfCap == Int.MaxValue) sh0
      else {
        val hot = Mat.smallLazy(sh0.groupBy(col("sh"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > postingDfCap)
          .select(col("sh")))
        sh0.join(hot, Seq("sh"), "left_anti")
      }
    val a = sh.select(col("doc_id").as("doc_a"), col("n").as("n_a"), col("sh"))
    val b = sh.select(col("doc_id").as("doc_b"), col("n").as("n_b"), col("sh"))
    val cand = a.join(b, Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("i"), max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
      // J ≥ t ⟺ (1+t)·|A∩B| ≥ t·(|A|+|B|): the tightest size-aware
      // prefilter, exact even for 3-shingle docs (a constant floor
      // would silently drop short near-dups). Hash-space i/n can only
      // make it laxer (collisions merge elements), so no true pair is
      // lost; the exact string-set verification prunes false admits.
      .filter(col("i") * (1.0 + JaccardThreshold) >=
              (col("n_a") + col("n_b")) * JaccardThreshold)
      .select(col("doc_a"), col("doc_b"))
    verifiedUnordered(joinShingleSets(docs, cand))
  }

  /** Shared oracle for C2/C4: exact shingle-set Jaccard ≥ 0.5. */
  val jaccardSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, ${TextOps.tokensSql} AS t FROM documents),
       |g AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
       |    THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |    ELSE [] END) AS shs
       |  FROM w),
       |s AS (SELECT doc_id, unnest(shs) AS sh FROM g),
       |sz AS (SELECT doc_id, len(shs) AS n FROM g),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, round(i * 1.0 / (x.n + y.n - i), 6) AS jaccard
       |FROM inter JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
       |WHERE i * 1.0 / (x.n + y.n - i) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** C4's oracle — exact Jaccard ≥ 0.5 with [[PostingDfCap]] MIRRORED:
    * the operator's inverted index drops shingles with document
    * frequency > cap, so its size prefilter sees only the RARE
    * intersection; a pair whose similarity rides entirely on
    * boilerplate shingles is (by design) not emitted. The oracle
    * reproduces that: full-set Jaccard for the value, plus the same
    * rare-intersection admission test. When no shingle exceeds the cap
    * the extra conjunct is implied by J ≥ t (i(1+t) ≥ t(nₐ+n_b)), so
    * this is byte-identical to [[jaccardSql]] on cap-free corpora —
    * and stays truthful on template-heavy ones where they diverge.
    */
  val ngramJaccardCappedSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, ${TextOps.tokensSql} AS t FROM documents),
       |g AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
       |    THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |    ELSE [] END) AS shs
       |  FROM w),
       |s AS (SELECT doc_id, unnest(shs) AS sh FROM g),
       |sz AS (SELECT doc_id, len(shs) AS n FROM g),
       |f AS (SELECT sh, count(*) AS df FROM s GROUP BY sh),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i,
       |         count(*) FILTER (WHERE f.df <= $PostingDfCap) AS i_rare
       |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  JOIN f ON f.sh = a.sh
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, round(i * 1.0 / (x.n + y.n - i), 6) AS jaccard
       |FROM inter JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
       |WHERE i * 1.0 / (x.n + y.n - i) >= $JaccardThreshold
       |  AND i_rare * (1.0 + $JaccardThreshold) >= (x.n + y.n) * $JaccardThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  /** C53: containment admission threshold and the minimum shingle-set
    * size for a containment SOURCE — a 3-shingle snippet is "contained"
    * in half the web; requiring ≥5 distinct shingles keeps the signal
    * about real nested documents.
    */
  val ContainmentThreshold = 0.8
  val MinContainShingles = 5

  /** C53 `dedup_containment`: asymmetric near-duplicate detection by
    * shingle-set containment C(src→sup) = |S_src ∩ S_sup| / |S_src| —
    * the quote/page-within-crawl signal Jaccard structurally misses
    * (a 100-shingle doc fully embedded in a 1000-shingle doc has
    * J ≈ 0.1 but containment 1.0). Same scale shape as C4: inverted
    * index on 64-bit shingle hashes with the [[PostingDfCap]]
    * boilerplate cap, candidate admission `i ≥ T·min(|A|,|B|)` (the
    * tightest symmetric prefilter — if neither direction's
    * denominator can clear T on the rare intersection, no direction
    * can), then exact string-shingle-set verification; each
    * qualifying direction emits one (doc_src, doc_sup) row. Hash
    * collisions only merge elements (i up, n down), so the prefilter
    * is laxer in hash space and no true pair is lost — C4's argument
    * verbatim. At 100 TB this runs per-LSH-candidate like C2/C4, and
    * the pair blow-up stays bounded at cap² per shingle.
    */
  def containment(s: SparkSession, d: String): DataFrame =
    containmentOf(Tables.documents(s, d))

  def containmentOf(docs: DataFrame, postingDfCap: Int = PostingDfCap): DataFrame = {
    // one materialization of the posting stream + groupBy-df landed as
    // an anti-join against the tiny over-cap set — the C4 shape
    // verbatim (see ngramJaccardPairsOf: one shingle-chain pass, df
    // skew-immune via partial aggregation, hot keys never buffered in
    // a single window task, key-partitioned cache feeds every leg
    // exchange-free).
    val sh0 = Mat.fact(shingleHashesOf(docs)
      .select(col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("sh"))
      .repartition(col("sh")))
    val sh =
      if (postingDfCap == Int.MaxValue) sh0
      else {
        val hot = Mat.smallLazy(sh0.groupBy(col("sh"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > postingDfCap)
          .select(col("sh")))
        sh0.join(hot, Seq("sh"), "left_anti")
      }
    val a = sh.select(col("doc_id").as("doc_a"), col("n").as("n_a"), col("sh"))
    val b = sh.select(col("doc_id").as("doc_b"), col("n").as("n_b"), col("sh"))
    val cand = a.join(b, Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("i"), max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
      .filter(col("i") >= lit(ContainmentThreshold) * least(col("n_a"), col("n_b")) &&
              least(col("n_a"), col("n_b")) >= MinContainShingles)
      .select(col("doc_a"), col("doc_b"))
    val base = joinShingleSets(docs, cand)
      .withColumn("i", size(array_intersect(col("shs_a"), col("shs_b"))))
      .withColumn("na", size(col("shs_a")))
      .withColumn("nb", size(col("shs_b")))
    // both containment directions from ONE pass: a map-side explode to
    // (src, sup, |src|) rows — a union of two filtered selections would
    // re-plan (and re-execute) the whole candidate+verify subtree per
    // direction
    base.select(col("i"), explode(array(
        struct(col("doc_a").as("doc_src"), col("doc_b").as("doc_sup"),
          col("na").as("n")),
        struct(col("doc_b").as("doc_src"), col("doc_a").as("doc_sup"),
          col("nb").as("n")))).as("e"))
      .select(col("e.doc_src").as("doc_src"), col("e.doc_sup").as("doc_sup"),
        col("i"), col("e.n").as("n"))
      .filter(col("n") >= MinContainShingles &&
        col("i").cast("double") / col("n") >= ContainmentThreshold)
      .select(col("doc_src"), col("doc_sup"),
        round(col("i").cast("double") / col("n"), 6).as("containment"))
      .orderBy(col("doc_src"), col("doc_sup"))
  }

  /** C53's oracle — exact containment ≥ T with the capped-index
    * admission MIRRORED, same structure as [[ngramJaccardCappedSql]]:
    * the ratio is exact full-set containment; admission additionally
    * requires the RARE intersection to clear T against the smaller
    * set, exactly what the operator's inverted index can see.
    */
  val containmentSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, ${TextOps.tokensSql} AS t FROM documents),
       |g AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
       |    THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |    ELSE [] END) AS shs
       |  FROM w),
       |s AS (SELECT doc_id, unnest(shs) AS sh FROM g),
       |sz AS (SELECT doc_id, len(shs) AS n FROM g),
       |f AS (SELECT sh, count(*) AS df FROM s GROUP BY sh),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i,
       |         count(*) FILTER (WHERE f.df <= $PostingDfCap) AS i_rare
       |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  JOIN f ON f.sh = a.sh
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT doc_a, doc_b, i, x.n AS na, y.n AS nb
       |  FROM inter JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
       |  WHERE i_rare >= $ContainmentThreshold * least(x.n, y.n)
       |    AND least(x.n, y.n) >= $MinContainShingles)
       |SELECT doc_src, doc_sup, containment FROM (
       |  SELECT doc_a AS doc_src, doc_b AS doc_sup,
       |         round(i * 1.0 / na, 6) AS containment
       |  FROM j WHERE na >= $MinContainShingles AND i * 1.0 / na >= $ContainmentThreshold
       |  UNION ALL
       |  SELECT doc_b AS doc_src, doc_a AS doc_sup,
       |         round(i * 1.0 / nb, 6) AS containment
       |  FROM j WHERE nb >= $MinContainShingles AND i * 1.0 / nb >= $ContainmentThreshold)
       |ORDER BY doc_src, doc_sup""".stripMargin

  /** C57 `dedup_threshold_sweep`: dedup-threshold calibration — the
    * decision curve for the ONE dial every near-dup pass has: how many
    * pairs (and how many documents) a Jaccard cutoff t would merge,
    * for t over the actionable [0.5, 1.0] grid. Both curves come from
    * the EXISTING C4 pair set in one extra pass each (11 conditional
    * counters per aggregate, map-side combined): pairs ≥ t directly,
    * docs via each doc's strongest pair (max-jaccard per endpoint) —
    * so the sweep costs O(pairs), never re-running candidate
    * generation per threshold. This is how the 0.5 shipping threshold
    * is justified by measurement rather than folklore.
    */
  def dedupThresholdSweep(s: SparkSession, d: String): DataFrame = {
    val grid = (10 to 20).map(_ / 20.0)
    // materialize the verified pair set ONCE: the pair-count and
    // doc-count curves are two separate aggregations, and without the
    // materialization each re-executes the entire candidate-generation
    // + exact-verify subtree (measured 2× the task time of the C4 pass
    // itself at sf0.1; at 100 TB it would repeat the corpus scan).
    // Unordered form: the materialization executes the plan as
    // written, so the presentation sort would otherwise be paid here
    // for nothing. Fault-tolerant persist, not localCheckpoint (r14).
    val pairs = Mat.fact(ngramJaccardPairsOf(Tables.documents(s, d))
      .select(col("doc_a"), col("doc_b"), col("jaccard")))
    val pk = grid.zipWithIndex.map { case (t, i) =>
      sum(when(col("jaccard") >= t, 1L).otherwise(0L)).as(s"p$i") }
    val pcounts = pairs.agg(pk.head, pk.tail: _*)
    val docMax = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"), col("jaccard"))
      .groupBy(col("doc_id")).agg(max(col("jaccard")).as("mj"))
    val dk = grid.zipWithIndex.map { case (t, i) =>
      sum(when(col("mj") >= t, 1L).otherwise(0L)).as(s"d$i") }
    val dcounts = docMax.agg(dk.head, dk.tail: _*)
    pcounts.crossJoin(dcounts)
      .select(explode(array(grid.zipWithIndex.map { case (t, i) => struct(
          lit(t).as("threshold"), col(s"p$i").as("n_pairs"),
          col(s"d$i").as("n_docs_affected")) }: _*)).as("r"))
      .select(col("r.threshold"), col("r.n_pairs"), col("r.n_docs_affected"))
      .orderBy(col("threshold"))
  }

  val dedupThresholdSweepSql: String =
    s"""WITH p AS ($ngramJaccardCappedSql),
       |e AS (SELECT doc_a AS doc_id, jaccard FROM p
       |      UNION ALL SELECT doc_b, jaccard FROM p),
       |dm AS (SELECT doc_id, max(jaccard) AS mj FROM e GROUP BY doc_id),
       |g AS (SELECT unnest(range(10, 21)) AS i)
       |SELECT CAST(i AS DOUBLE) / 20 AS threshold,
       |  (SELECT count(*) FROM p WHERE jaccard >= CAST(i AS DOUBLE) / 20)::BIGINT AS n_pairs,
       |  (SELECT count(*) FROM dm WHERE mj >= CAST(i AS DOUBLE) / 20)::BIGINT AS n_docs_affected
       |FROM g ORDER BY threshold""".stripMargin

  /** Split the corpus into "already ingested" and "incoming batch" —
    * the shape every production crawl refresh has. doc_id % 3 is the
    * deterministic stand-in for that boundary.
    */
  private def ingestSplit(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(s, d)
    (docs.filter(col("doc_id") % 3 === 0), docs.filter(col("doc_id") % 3 =!= 0))
  }

  /** C30 `dedup_incremental`: EXACT incremental dedup — admit from an
    * incoming batch only content whose hash is unseen in the ingested
    * corpus, collapsing within-batch copies to their first occurrence.
    * This is the steady-state form of C1: a crawl refresh never
    * re-deduplicates the whole corpus, it anti-joins the delta against
    * the existing content-hash set. Scale shape: one hash-keyed
    * LEFT ANTI join (the seen-set side is hashes only — at 100 TB it
    * lives as a compact table AQE can broadcast per-partition, or a
    * bloom pre-filter in front of the join) + one partial-agg groupBy
    * for the within-batch collapse. Shuffles ride 128-bit hashes,
    * never text.
    */
  def incrementalExact(s: SparkSession, d: String): DataFrame = {
    val (existing, incoming) = ingestSplit(s, d)
    val seen = existing.select(md5(col("text").cast("binary")).as("content_hash")).distinct()
    incoming.withColumn("content_hash", md5(col("text").cast("binary")))
      .join(seen, Seq("content_hash"), "left_anti")
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_batch_copies"))
      .select(col("doc_id"), col("n_batch_copies"))
      .orderBy(col("doc_id"))
  }

  val incrementalExactSql: String =
    """WITH seen AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 3 = 0),
      |inc AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 3 <> 0)
      |SELECT min(doc_id) AS doc_id, count(*) AS n_batch_copies
      |FROM inc WHERE h NOT IN (SELECT h FROM seen)
      |GROUP BY h ORDER BY doc_id""".stripMargin

  /** C37 `dedup_incremental_bloom`: C30's admission gate behind a
    * BLOOM pre-filter — the constant-memory fast path every planet-
    * scale crawl refresh runs. The ingested corpus' content hashes are
    * folded into one mergeable bloom filter (built DISTRIBUTED via
    * `stat.bloomFilter`'s treeAggregate — one pass, no shuffle, no
    * collect of hashes), broadcast once, and evaluated per batch row
    * through Spark's own codegen'd [[
    * org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
    * — the exact expression Spark's runtime row-level filtering
    * injects, zero UDFs. Rows the bloom rejects are DEFINITELY new
    * (no false negatives) and admit with no join at all; only the
    * maybe-seen sliver (true dups + fpp false positives) pays the
    * exact anti-join, so the verify join's probe side shrinks from
    * |batch| to |dups| + fpp·|batch|. Output is EXACT — identical to
    * C30's plain anti-join — which is what the oracle checks.
    *
    * 100 TB sizing: 10⁹ corpus hashes at fpp 3 % ≈ 0.9 GiB of bloom —
    * broadcast once per refresh, amortized over every batch; shard the
    * key space into k blooms when a single broadcast won't fit. The
    * corpus-hash side of the residual verify join is itself a graft
    * table bucketed with `sbucket[n]` (A64) in production, so even
    * that join shuffles nothing.
    */
  def incrementalBloom(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.graft.Shim
    val (existing, incoming) = ingestSplit(s, d)
    val seen = existing.select(md5(col("text").cast("binary")).as("h")).distinct()
    // insert xxhash64(h) longs: BloomFilterMightContain tests via
    // mightContainLong, so build and probe must hash identically
    val nSeen = seen.count()
    val bf = seen.select(xxhash64(col("h")).as("hl"))
      .stat.bloomFilter("hl", math.max(1000L, nSeen), 0.03)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val mightContain = Shim.column(BloomFilterMightContain(
      Literal(bos.toByteArray),
      new XxHash64(Seq(Shim.expression(col("h"))))))
    val batch = incoming.withColumn("h", md5(col("text").cast("binary")))
    val definitelyNew = batch.filter(!mightContain)
    val suspects = batch.filter(mightContain)
    val verifiedNew = suspects.join(seen, Seq("h"), "left_anti")
    definitelyNew.unionByName(verifiedNew)
      .groupBy(col("source")).agg(count(lit(1)).as("n_admitted"))
      .orderBy(col("source"))
  }

  /** Oracle: the bloom is an accelerator, never a semantics change —
    * admitted set must equal the plain exact anti-join's.
    */
  val incrementalBloomSql: String =
    """WITH seen AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 3 = 0),
      |inc AS (SELECT source, md5(text) AS h FROM documents WHERE doc_id % 3 <> 0)
      |SELECT source, count(*) AS n_admitted
      |FROM inc WHERE h NOT IN (SELECT h FROM seen)
      |GROUP BY source ORDER BY source""".stripMargin

  /** C31 `dedup_incremental_near`: NEAR-DUP incremental dedup (fuzzy
    * decontamination of a crawl refresh): an incoming doc is rejected
    * when it is a J ≥ 0.5 near-duplicate of ANY ingested doc; admitted
    * docs roll up per source. Candidates come from minhash band
    * collisions BETWEEN the batch and the corpus index (never within
    * either side — the batch's internal dups are C30's job), then exact
    * Jaccard verification, so the output is exact while the
    * between-side join volume is O(batch × collision rate). At 100 TB
    * the corpus side is a persisted band index (doc_id, band, key) —
    * the refresh only scans the delta and probes the index.
    */
  def incrementalNear(s: SparkSession, d: String): DataFrame = {
    val (existing, incoming) = ingestSplit(s, d)
    def bandsOf(docs: DataFrame, idAs: String): DataFrame =
      shingleHashesOf(docs)
        .select(col("doc_id").as(idAs),
          exprs.minHashBands(col("hs"), Seed, 128, 32).as("bands"))
        .select(col(idAs), posexplode(col("bands")).as(Seq("band", "key")))
    val cand = bandsOf(incoming, "doc_a")
      .join(bandsOf(existing, "doc_b"), Seq("band", "key"))
      .select(col("doc_a"), col("doc_b")).distinct()
    // exact verify across the boundary (shingle sets of both sides)
    val incSets = shinglesOf(incoming).select(col("doc_id").as("doc_a"), col("shs").as("shs_a"))
    val exSets = shinglesOf(existing).select(col("doc_id").as("doc_b"), col("shs").as("shs_b"))
    val contaminated = verifiedUnordered(
        cand.join(incSets, "doc_a").join(exSets, "doc_b"))
      .select(col("doc_a").as("doc_id")).distinct()
    incoming.join(contaminated, Seq("doc_id"), "left_anti")
      .groupBy(col("source")).agg(count(lit(1)).as("n_admitted"))
      .orderBy(col("source"))
  }

  /** Oracle: exact cross-boundary Jaccard (no sketch) — green means
    * the band index missed no J ≥ 0.5 contamination.
    */
  val incrementalNearSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, source, ${TextOps.tokensSql} AS t FROM documents),
       |g AS (
       |  SELECT doc_id, source, list_distinct(CASE WHEN len(t) >= 3
       |    THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |    ELSE [] END) AS shs
       |  FROM w),
       |s AS (SELECT doc_id, unnest(shs) AS sh FROM g),
       |sz AS (SELECT doc_id, len(shs) AS n FROM g),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM s a JOIN s b ON a.sh = b.sh
       |  WHERE a.doc_id % 3 <> 0 AND b.doc_id % 3 = 0
       |  GROUP BY 1, 2),
       |bad AS (
       |  SELECT DISTINCT doc_a FROM inter
       |  JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
       |  WHERE i * 1.0 / (x.n + y.n - i) >= 0.5)
       |SELECT source, count(*) AS n_admitted
       |FROM g WHERE doc_id % 3 <> 0 AND doc_id NOT IN (SELECT doc_a FROM bad)
       |GROUP BY source ORDER BY source""".stripMargin

  /** C74 `dedup_edit_distance`: CHARACTER-level near-dup pairs at a
    * small ABSOLUTE edit distance — the typo/OCR-noise class
    * (`levenshtein ≤ [[EdMax]] = 8`) that word-shingle Jaccard
    * under-weights on short texts (one in-word typo kills every word
    * shingle crossing it). Exact distances are reported.
    *
    * The threshold is deliberately absolute, not relative: the q-gram
    * COUNT FILTER (one edit destroys at most q distinct grams, so
    * ED ≤ d forces |G_a ∩ G_b| ≥ max(|G|) − q·d) only has filtering
    * power while q·d ≪ |G| — a 15%-of-length budget makes the bound
    * vacuous and degenerates to the all-pairs join on ANY engine.
    *
    * Candidate plan — EXACT at every step, so the result provably
    * equals the uncapped oracle (no recall caveat to spec away):
    *  1. LENGTH BANDING: ED ≥ |len_a − len_b|, so qualifying pairs sit
    *     within EdMax characters of each other — a band join on
    *     `len DIV (EdMax+1)` cells (the C22/q_range_join cell trick:
    *     one side probes its 3 adjacent cells) yields only
    *     similar-length pairs. Lossless by arithmetic.
    *  2. q-gram COUNT FILTER, columnar: each pair intersects its two
    *     precomputed sorted gram-hash arrays (`array_intersect`, one
    *     narrow kernel per pair — NO inverted-index self-join, whose
    *     volume is Σ df² and detonates on low-entropy corpora where
    *     every gram is near-universal). Lossless by the q-gram lemma.
    *  3. survivors pay ONE exact codegen'd `levenshtein` each.
    * Degenerate-length caveat (documented, not hidden): if the whole
    * corpus shares one length cell, step 1 admits O(n²/cells) pairs
    * and step 2's per-pair kernel is the bound — the classic PassJoin
    * segment index is the escalation for that shape; real corpora
    * spread lengths. At 100 TB the band join shuffles each doc's gram
    * array once (≈ corpus volume, the same class as C1's body hash),
    * and Levenshtein runs only on count-filter survivors.
    */
  def editDistancePairs(s: SparkSession, d: String): DataFrame =
    editDistancePairsOf(Tables.documents(s, d))

  /** Absolute ED threshold (typo/OCR class) and the q-gram width. */
  val EdMax = 8
  val EdQ = 5
  def editDistancePairsOf(docs: DataFrame): DataFrame = {
    val g0 = docs.select(col("doc_id"), lower(col("text")).as("t"))
      .withColumn("len", length(col("t")))
      .withColumn("gs", exprs.charGramHashes(col("t"), EdQ))
      .withColumn("n", size(col("gs")))
      .withColumn("bkt", expr(s"len DIV ${EdMax + 1}"))
    val aSide = g0.select(col("doc_id").as("doc_a"), col("t").as("t_a"),
        col("len").as("len_a"), col("gs").as("gs_a"), col("n").as("n_a"),
        explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("cell"))
    val bSide = g0.select(col("doc_id").as("doc_b"), col("t").as("t_b"),
        col("len").as("len_b"), col("gs").as("gs_b"), col("n").as("n_b"),
        col("bkt").as("cell"))
    aSide.join(bSide, Seq("cell"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(abs(col("len_a") - col("len_b")) <= EdMax)
      // codegen'd linear merge over the sorted gram arrays — the
      // builtin array_intersect builds a hash set per pair, interpreted
      .withColumn("i", exprs.sortedIntersectCount(col("gs_a"), col("gs_b")))
      .filter(col("i") >= greatest(col("n_a"), col("n_b")) - lit(EdQ * EdMax))
      // banded DP: O(len·EdMax) per survivor, -1 = above threshold
      .withColumn("dist", levenshtein(col("t_a"), col("t_b"), EdMax).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= EdMax)
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Oracle: length filter + the same lossless q-gram count filter over
    * gram STRINGS + the same absolute-threshold Levenshtein verify —
    * every stage exact on both engines, so equality is unconditional.
    */
  val editDistancePairsSql: String =
    s"""WITH low AS (SELECT doc_id, lower(text) AS t FROM documents),
       |g AS (
       |  SELECT doc_id, t, length(t) AS len, list_distinct(CASE WHEN length(t) >= $EdQ
       |    THEN list_transform(range(1, length(t) - ${EdQ - 2}), i -> substring(t, i, $EdQ))
       |    ELSE [] END) AS gs
       |  FROM low),
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.t AS t_a, b.t AS t_b
       |  FROM g a JOIN g b
       |    ON a.doc_id < b.doc_id AND abs(a.len - b.len) <= $EdMax
       |   AND len(list_intersect(a.gs, b.gs)) >= greatest(len(a.gs), len(b.gs)) - ${EdQ * EdMax})
       |SELECT doc_a, doc_b, CAST(levenshtein(t_a, t_b) AS BIGINT) AS dist
       |FROM cand WHERE levenshtein(t_a, t_b) <= $EdMax
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- C74 PassJoin dial -----------------------------------------------

  /** PassJoin segment indexing (Li, Deng, Feng 2011, re-derived) — the
    * escalation for [[editDistancePairsOf]]'s documented degenerate
    * shape: a corpus concentrated in ONE length cell makes the cell
    * join admit O(n²/cells) candidate pairs, with only the per-pair
    * q-gram kernel between that volume and the DP. The segment index
    * replaces "same length cell" with a far sharper candidate
    * condition: partition every string into τ+1 segments — with ≤ τ
    * edits, pigeonhole preserves at least one segment EXACTLY, at a
    * start shift x bounded by |x| + |Δ−x| ≤ τ (prefix edits ≥ |x|,
    * suffix edits ≥ |Δ−x|, Δ = length gap). So candidates are an
    * EQUALITY join on (segment ordinal, indexed length, segment text):
    * random same-length strings almost never share an aligned segment,
    * and candidate volume tracks TRUE near-pairs instead of n².
    *
    * Cost shape: the probe side enumerates the static (i, Δ, x) triple
    * set — |triples| ≈ (τ+1)²·(τ+1) ≈ 690 substring keys per doc at
    * τ = 8 — so the index is O(n·τ²) rows regardless of the length
    * histogram. That constant factor is why this is a DIAL (the
    * [[VectorOps.embeddingPairsAtCapped]] pattern), not the default:
    * on length-spread corpora the cell join's candidates are already
    * near-linear and 690× beats it nowhere; on uniform-length corpora
    * the cell join is quadratic and this stays bounded. Both routes
    * share the exact verify (q-gram count filter + banded DP), so both
    * equal the uncapped oracle unconditionally.
    *
    * Strings shorter than τ+1 chars have empty segments (pigeonhole
    * void) and take the direct small-side path: they may pair only
    * with strings of length < 2(τ+1), so that fallback join is tiny by
    * construction and exact.
    */
  def editDistancePairsPassJoinOf(docs: DataFrame): DataFrame = {
    val g0 = edPrep(docs)
    edVerify(g0, editDistancePassJoinCandidates(g0))
  }

  def editDistancePairsPassJoin(s: SparkSession, d: String): DataFrame =
    editDistancePairsPassJoinOf(Tables.documents(s, d))

  /** (doc_id, t, len, gs, n) — the shared prep both routes verify from. */
  private[graft] def edPrep(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lower(col("text")).as("t"))
      .withColumn("len", length(col("t")))
      .withColumn("gs", exprs.charGramHashes(col("t"), EdQ))
      .withColumn("n", size(col("gs")))

  /** Candidate (doc_a < doc_b) id pairs via the length-cell join — the
    * default route's candidate stage, exposed so the degenerate-shape
    * spec can MEASURE its volume against the segment index's.
    */
  private[graft] def editDistanceCellCandidates(g0: DataFrame): DataFrame = {
    val c = g0.withColumn("bkt", expr(s"len DIV ${EdMax + 1}"))
    val aSide = c.select(col("doc_id").as("doc_a"), col("len").as("len_a"),
      explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("cell"))
    val bSide = c.select(col("doc_id").as("doc_b"), col("len").as("len_b"),
      col("bkt").as("cell"))
    aSide.join(bSide, Seq("cell"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(abs(col("len_a") - col("len_b")) <= EdMax)
      .select(col("doc_a"), col("doc_b"))
  }

  /** Candidate (doc_a < doc_b) id pairs via the PassJoin segment index. */
  private[graft] def editDistancePassJoinCandidates(g0: DataFrame): DataFrame = {
    val tau = EdMax
    val k = tau + 1
    // segment convention over a length-l string: base = l DIV k,
    // rem = l MOD k; the first k−rem segments take base chars, the
    // last rem take base+1; start(i) = i·base + max(0, i−(k−rem))
    def segLen(l: Column, i: Int): Column =
      floor(l / k).cast("int") + when(lit(i) >= lit(k) - pmod(l, lit(k)), 1).otherwise(0)
    def segStart(l: Column, i: Int): Column =
      (floor(l / k).cast("int") * i) + greatest(lit(0), lit(i) - (lit(k) - pmod(l, lit(k))))

    // index side: every string of length ≥ k contributes its k segments
    val idx = g0.filter(col("len") >= k)
      .select(col("doc_id").as("doc_s"), col("len").as("len_s"),
        explode(array((0 until k).map(i => struct(lit(i).as("i"),
          col("t").substr(segStart(col("len"), i) + 1, segLen(col("len"), i))
            .as("seg"))): _*)).as("e"))
      .select(col("doc_s"), col("len_s"), col("e.i").as("i"), col("e.seg").as("seg"))

    // probe side: the STATIC (segment i, length gap Δ, shift x) triple
    // set — x ranges over the |x| + |Δ−x| ≤ τ window, so every exact
    // segment preservation an optimal alignment allows is enumerated
    val triples: Seq[(Int, Int, Int)] = for {
      i <- 0 until k
      dl <- 0 to tau
      lo = math.ceil((dl - tau) / 2.0).toInt
      hi = dl + (tau - dl) / 2
      x <- lo to hi
    } yield (i, dl, x)
    val probe = g0.select(col("doc_id").as("doc_r"), col("t").as("t_r"),
        col("len").as("len_r"),
        explode(array(triples.map { case (i, dl, x) =>
          struct(lit(i).as("i"), (col("len") - dl).as("l"), lit(x).as("x"))
        }: _*)).as("p"))
      .select(col("doc_r"), col("t_r"), col("len_r"),
        col("p.i").as("i"), col("p.l").as("len_s"), col("p.x").as("x"))
      .withColumn("q",
        (0 until k).foldLeft(lit(-1)) { (acc, i) =>
          when(col("i") === i, segStart(col("len_s"), i) + col("x")).otherwise(acc) })
      .withColumn("slen",
        (0 until k).foldLeft(lit(-1)) { (acc, i) =>
          when(col("i") === i, segLen(col("len_s"), i)).otherwise(acc) })
      .filter(col("len_s") >= k && col("q") >= 0 &&
        col("q") + col("slen") <= col("len_r"))
      .select(col("doc_r"), col("len_r"), col("i"), col("len_s"),
        col("t_r").substr(col("q") + 1, col("slen")).as("seg"))

    val segPairs = probe.join(idx, Seq("i", "len_s", "seg"))
      .filter(col("doc_s") =!= col("doc_r"))
      // the shorter side is the indexed side; equal lengths pair once
      .filter(col("len_s") < col("len_r") ||
        (col("len_s") === col("len_r") && col("doc_s") < col("doc_r")))
      .select(least(col("doc_s"), col("doc_r")).as("doc_a"),
        greatest(col("doc_s"), col("doc_r")).as("doc_b"))

    // strings below k chars: pigeonhole void — direct pairing against
    // everything within the length window (partner length < k + τ + 1,
    // so both sides of this fallback are short-string subsets)
    val tiny = g0.filter(col("len") < k)
      .select(col("doc_id").as("doc_s"), col("len").as("len_s"))
    val near = g0.filter(col("len") < k + tau + 1)
      .select(col("doc_id").as("doc_r"), col("len").as("len_r"))
    val tinyPairs = tiny.crossJoin(near)
      .filter(col("doc_s") =!= col("doc_r"))
      .filter(abs(col("len_s") - col("len_r")) <= tau)
      .filter(col("len_s") < col("len_r") ||
        (col("len_s") === col("len_r") && col("doc_s") < col("doc_r")))
      .select(least(col("doc_s"), col("doc_r")).as("doc_a"),
        greatest(col("doc_s"), col("doc_r")).as("doc_b"))

    segPairs.unionByName(tinyPairs).distinct()
  }

  /** The shared exact verify: q-gram count filter + banded DP over the
    * candidate id pairs — identical maths to [[editDistancePairsOf]]'s
    * fused tail, so any candidate route that is a SUPERSET of the true
    * pair set yields the identical result.
    */
  private[graft] def edVerify(g0: DataFrame, pairs: DataFrame): DataFrame =
    pairs
      .join(g0.select(col("doc_id").as("doc_a"), col("t").as("t_a"),
        col("gs").as("gs_a"), col("n").as("n_a")), "doc_a")
      .join(g0.select(col("doc_id").as("doc_b"), col("t").as("t_b"),
        col("gs").as("gs_b"), col("n").as("n_b")), "doc_b")
      .withColumn("ic", exprs.sortedIntersectCount(col("gs_a"), col("gs_b")))
      .filter(col("ic") >= greatest(col("n_a"), col("n_b")) - lit(EdQ * EdMax))
      .withColumn("dist", levenshtein(col("t_a"), col("t_b"), EdMax).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= EdMax)
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** D21 `stream_neardup_gate`: continuous crawl ingestion with
    * NEAR-DUP admission — the streaming form of C31 where the index
    * GROWS as batches land: each micro-batch probes the persisted
    * band index (a graft lake table of `(doc_id, band, key)` minhash
    * postings), exact-verifies band collisions by Jaccard ≥ 0.5
    * against the persisted shingle sets, rejects contaminated docs,
    * and appends the survivors' bands/sets back — so a batch-2 doc
    * near-duplicate of a batch-1 ADMISSION is rejected even though
    * neither was in the seed corpus. Admission is defined against the
    * index state at batch start (bulk-ingest semantics; within-batch
    * dups are C30/C2's job), and batch boundaries are pinned
    * (4 staged files, mod-times ascending, maxFilesPerTrigger=1), so
    * the result replays exactly and the oracle unrolls the same four
    * probe→admit→extend stages in SQL with EXACT Jaccard (green ⇔ the
    * band index missed nothing).
    *
    * Scale shape: per batch the work is O(batch bands) probing a
    * keyed index join + O(collisions) verification — the corpus is
    * never rescanned, and the index/sets tables are the same
    * persisted artifacts C31's scaladoc prescribes for 100 TB; lake
    * appends make the gate restartable (tagged batches replay
    * idempotently).
    */
  def streamNearDupGate(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import graft.lake.GraftTable
    val docs = Tables.documents(s, d)
    val existing = docs.filter(col("doc_id") % 3 === 0)
    val incoming = docs.filter(col("doc_id") % 3 =!= 0)
    val base = s"/root/repo/target/lakework/sngate-${math.abs(d.hashCode)}"
    val conf = s.sparkContext.hadoopConfiguration
    val baseP = new org.apache.hadoop.fs.Path(base)
    val hfs = baseP.getFileSystem(conf)
    if (hfs.exists(baseP)) hfs.delete(baseP, true)
    // four deterministic single-file batches; mod-times ascending pin
    // the FileStreamSource processing order (one partitioned write job
    // for all four — r13 optimization)
    val stage = s"$base/stage"
    StageFiles.stage(s, incoming, pmod(col("doc_id"), lit(4L)), 4, stage)
    def bandsOf(df: DataFrame): DataFrame =
      shingleHashesOf(df)
        .select(col("doc_id"), posexplode(
          exprs.minHashBands(col("hs"), Seed, 128, 32)).as(Seq("band", "key")))
    GraftTable.create(s, s"$base/idx", bandsOf(existing))
    GraftTable.create(s, s"$base/sets", shinglesOf(existing))
    GraftTable.createEmpty(s, s"$base/res",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType))),
      Seq.empty, Seq.empty)
    val q = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val b = batch.localCheckpoint() // one stage read, many joins
        val idxT = new GraftTable(s"$base/idx", s)
        val setsT = new GraftTable(s"$base/sets", s)
        val cand = bandsOf(b).select(col("doc_id").as("doc_a"), col("band"), col("key"))
          .join(idxT.read().select(col("doc_id").as("doc_b"), col("band"), col("key")),
            Seq("band", "key"))
          .select(col("doc_a"), col("doc_b")).distinct()
        val pairs = cand
          .join(shinglesOf(b).select(col("doc_id").as("doc_a"), col("shs").as("shs_a")), "doc_a")
          .join(setsT.read().select(col("doc_id").as("doc_b"), col("shs").as("shs_b")), "doc_b")
        val bad = verifiedUnordered(pairs)
          .select(col("doc_a").as("doc_id")).distinct()
        val admitted = b.join(bad, Seq("doc_id"), "left_anti").localCheckpoint()
        new GraftTable(s"$base/res", s)
          .appendBatch(admitted.select(col("doc_id"), col("source")), s"sngate-$id")
        idxT.appendBatch(bandsOf(admitted), s"sngate-$id")
        setsT.appendBatch(shinglesOf(admitted), s"sngate-$id")
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    new GraftTable(s"$base/res", s).read()
      .groupBy(col("source")).agg(count(lit(1)).as("n_admitted"))
      .orderBy(col("source"))
  }

  /** Oracle: the four probe→admit→extend stages unrolled in SQL with
    * EXACT cross-boundary Jaccard per stage — no sketch anywhere.
    */
  val streamNearDupGateSql: String = {
    val stages = (0 until 4).map { k =>
      s"""b$k AS (SELECT doc_id FROM g WHERE doc_id % 3 <> 0 AND doc_id % 4 = $k),
         |rej$k AS (
         |  SELECT DISTINCT p.doc_a AS doc_id FROM (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
         |    FROM s a JOIN s b ON a.sh = b.sh
         |    JOIN b$k ba ON ba.doc_id = a.doc_id
         |    JOIN idx$k ib ON ib.doc_id = b.doc_id
         |    GROUP BY 1, 2) p
         |  JOIN sz x ON x.doc_id = p.doc_a JOIN sz y ON y.doc_id = p.doc_b
         |  WHERE p.c * 1.0 / (x.n + y.n - p.c) >= 0.5),
         |adm$k AS (SELECT doc_id FROM b$k WHERE doc_id NOT IN (SELECT doc_id FROM rej$k)),
         |idx${k + 1} AS (SELECT doc_id FROM idx$k UNION ALL SELECT doc_id FROM adm$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS (
       |  SELECT doc_id, source, ${TextOps.tokensSql} AS t FROM documents),
       |g AS (
       |  SELECT doc_id, source, list_distinct(CASE WHEN len(t) >= 3
       |    THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |    ELSE [] END) AS shs
       |  FROM w),
       |s AS (SELECT doc_id, unnest(shs) AS sh FROM g),
       |sz AS (SELECT doc_id, len(shs) AS n FROM g),
       |idx0 AS (SELECT doc_id FROM g WHERE doc_id % 3 = 0),
       |$stages,
       |adm AS (SELECT doc_id FROM adm0 UNION ALL SELECT doc_id FROM adm1
       |        UNION ALL SELECT doc_id FROM adm2 UNION ALL SELECT doc_id FROM adm3)
       |SELECT g.source, count(*) AS n_admitted
       |FROM g JOIN adm USING (doc_id)
       |GROUP BY g.source ORDER BY g.source""".stripMargin
  }

  /** C16 `dedup_clusters`: verified near-dup *pairs* → canonical
    * *clusters* — the step a curation pipeline actually needs (keep
    * one doc per component, drop the rest). Hash-min label
    * propagation: every doc starts labeled with its own id; each
    * round, a vertex takes the min label among itself and its
    * neighbors; fixpoint = connected components, with cluster_id =
    * min doc_id in the component.
    *
    * Scale: one shuffle per round (join on edge src + groupBy dst),
    * rounds = graph diameter. Near-dup components are
    * template/boilerplate clusters of tiny diameter (≤ ~3), so this
    * converges in a handful of rounds even at 100 TB; lineage is cut
    * per round with an eager checkpoint so the plan stays O(1) deep.
    * (High-diameter graphs would want large-star/small-star; dedup
    * graphs don't.) Termination test is a changed-label count folded
    * into the same round's aggregation — labels only ever decrease, so
    * zero strict decreases IS the fixpoint. (A sum-of-labels check
    * would be one job cheaper but overflows Long once Σid exceeds
    * 2⁶³ — trivially reachable with snowflake-style 64-bit ids.)
    */
  def clusters(s: SparkSession, d: String): DataFrame =
    clustersOf(Tables.documents(s, d))

  def clustersOf(docs: DataFrame): DataFrame = {
    val labels = clusterLabelsOf(docs)
    // isolated docs (no verified pair) are their own cluster and never
    // participate in propagation — attach them once at the end instead
    // of dragging the whole corpus through every round
    docs.select(col("doc_id"))
      .join(labels, col("doc_id") === col("v"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** Label-propagation fixpoint over ONLY the vertices that appear in a
    * verified near-dup pair (r13 optimization): a vertex with no edges
    * can neither change its own label nor anyone else's, so iterating
    * over the full corpus — the pre-r13 shape — paid a corpus-sized
    * join + eager checkpoint per round for rows that were constant by
    * construction. Pairs are a tiny fraction of a deduplicated corpus
    * at 100 TB; every round now costs O(|paired vertices|).
    * Returns (v, label) for paired vertices; label = component min id.
    */
  private[pipeline] def clusterLabelsOf(docs: DataFrame): DataFrame = {
    val pairs = ngramJaccardPairsOf(docs).select(col("doc_a"), col("doc_b"))
    val sym = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true) // reused every round — don't recompute the verify join
    var labels = sym.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("label"))
      .localCheckpoint(true)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      val prop = sym.join(labels, sym("src") === labels("v"))
        .groupBy(col("dst")).agg(min(col("label")).as("nbr"))
      val next = labels.join(prop, labels("v") === prop("dst"), "left")
        .select(labels("v"), col("label").as("prev"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
        .localCheckpoint(true)
      converged = next.filter(col("label") < col("prev")).limit(1).count() == 0L
      labels = next.select(col("v"), col("label"))
      rounds += 1
    }
    labels
  }

  /** Recursive-CTE oracle: reach(v, r) = "r reaches v" over the
    * symmetric verified-pair edges; cluster_id = min reacher.
    */
  val clustersSql: String =
    s"""WITH RECURSIVE w AS (
       |  SELECT doc_id, ${TextOps.tokensSql} AS t FROM documents),
       |g AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
       |    THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |    ELSE [] END) AS shs
       |  FROM w),
       |s AS (SELECT doc_id, unnest(shs) AS sh FROM g),
       |sz AS (SELECT doc_id, len(shs) AS n FROM g),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT doc_a, doc_b FROM inter
       |  JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
       |  WHERE i * 1.0 / (x.n + y.n - i) >= 0.5),
       |sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |        UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |reach(v, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.r FROM reach r JOIN sym e ON e.src = r.v)
       |SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v
       |ORDER BY doc_id""".stripMargin

  /** C29 `dedup_apply`: APPLY the near-dup clustering — the step that
    * actually shrinks the corpus: every cluster keeps its canonical
    * (min doc_id = the cluster label), non-canonical members are
    * dropped, and the survivors roll up per source. Composes C16's
    * label propagation with one narrow filter (`doc_id == cluster_id`)
    * — no extra shuffle beyond the clustering itself. The oracle
    * extends the recursive-CTE clusters oracle the same way.
    */
  def dedupApply(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // kept ⟺ doc_id == cluster_id ⟺ NOT(label < v); only paired
    // vertices can be non-canonical, so anti-join the (tiny) loser set
    // instead of inner-joining the full corpus-sized label table
    val nonCanon = clusterLabelsOf(docs).filter(col("label") < col("v"))
      .select(col("v").as("doc_id"))
    docs.join(nonCanon, Seq("doc_id"), "left_anti")
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"))
  }

  lazy val dedupApplySql: String = {
    // reuse the recursive-CTE prefix of the clusters oracle, swap its
    // final SELECT for the keep-canonical rollup
    val tail = "SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v\nORDER BY doc_id"
    require(clustersSql.endsWith(tail), "clusters oracle tail changed")
    val cte = clustersSql.dropRight(tail.length).trim // ends after reach(...)
    s"""$cte,
       |cl AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v)
       |SELECT d.source, count(*) AS n_docs
       |FROM documents d JOIN cl ON d.doc_id = cl.doc_id
       |WHERE cl.doc_id = cl.cluster_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin
  }

  /** C15 `dataset_similarity`: corpus-level near-duplication measure —
    * MinHash signatures of two document sets (here: even vs odd doc
    * ids) via the [[graft.functions.MinHashAgg]] distributed aggregate,
    * plus exact set sizes. The Jaccard estimate is probabilistic
    * (±1/√256 ≈ 0.06) → rows-only driver check; the spec bounds the
    * error against the exact shingle-set Jaccard.
    */
  def datasetSimilarity(s: SparkSession, d: String): DataFrame = {
    import graft.functions.MinHashAgg.minHashAgg
    val hs = docShingleHashes(s, d)
      .withColumn("grp", (col("doc_id") % 2 === 0).cast("string"))
    val sigs = hs.groupBy(col("grp"))
      .agg(minHashAgg(col("hs"), Seed, 256).as("sig"),
           count(lit(1)).as("n_docs"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Long](1), r.getLong(2))).toMap
    val (sigA, nA) = sigs("true"); val (sigB, nB) = sigs("false")
    val est = graft.functions.MinHashAgg.estimate(sigA, sigB)
    import s.implicits._
    Seq((nA, nB, math.round(est * 1e6) / 1e6))
      .toDF("n_even_docs", "n_odd_docs", "est_jaccard")
  }

  /** C15's INVARIANT check (VALUES-style oracle): the MinHash corpus-
    * similarity estimate must land within 5σ of the EXACT shingle-set
    * Jaccard of the two halves (256 permutations ⇒ σ = √(J(1−J)/256)
    * ≤ 1/32, so the gate is |est − exact| ≤ 0.16). Exact Jaccard is
    * one distinct + one hash-keyed agg — cheap at any scale because it
    * rides 64-bit hashes.
    */
  def datasetSimilarityCheck(s: SparkSession, d: String): DataFrame = {
    val hs = docShingleHashes(s, d)
      .withColumn("grp", col("doc_id") % 2 === 0)
      .select(col("grp"), explode(col("hs")).as("h")).distinct()
    val agg = hs.groupBy(col("h")).agg(countDistinct(col("grp")).as("ng"))
      .agg(sum(when(col("ng") === 2, 1L).otherwise(0L)).as("inter"),
           count(lit(1)).as("un")).head()
    val exact = agg.getLong(0).toDouble / agg.getLong(1)
    val est = datasetSimilarity(s, d).head().getDouble(2)
    import s.implicits._
    Seq(Tuple1(if (math.abs(est - exact) <= 0.16) 0L else 1L))
      .toDF("estimator_violations")
  }

  val datasetSimilarityCheckSql: String =
    "SELECT CAST(0 AS BIGINT) AS estimator_violations"

  /** C23 `dedup_lines`: cross-document line-level dedup — the CCNet /
    * Gopher cleanup pass that strips boilerplate (nav bars, footers,
    * license blurbs) *before* document-level dedup: any non-blank line
    * occurring in ≥ 2 distinct documents is removed from every
    * document; blank lines are document structure and always kept.
    * Shape at 100 TB: explode → one groupBy keyed on the 64-bit line
    * hash (partial-agg combinable; the line string never rides the
    * dup-detection shuffle) → hash-keyed join back (the dup table is
    * boilerplate-sized — AQE broadcasts it) → one per-doc reassembly
    * groupBy. Reassembly order is exact via posexplode + array_sort on
    * (pos, line). The oracle joins on the line string itself; results
    * agree because xxhash64 is injective on real corpora.
    */
  def dedupLinesOf(docs: DataFrame): DataFrame = {
    val lines = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\n")).as(Seq("pos", "ln")))
      .withColumn("lh", xxhash64(col("ln")))
    val dup = lines.filter(trim(col("ln")) =!= "")
      .groupBy(col("lh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("lh"), lit(true).as("is_dup"))
    lines.join(dup, Seq("lh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("is_dup").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("is_dup").isNotNull, 1L).otherwise(0L)).as("n_dropped"),
        array_join(transform(
          array_sort(collect_list(when(col("is_dup").isNull,
            struct(col("pos"), col("ln"))))),
          x => x.getField("ln")), "\n").as("clean_text"))
      .orderBy(col("doc_id"))
  }

  def dedupLines(s: SparkSession, d: String): DataFrame =
    dedupLinesOf(Tables.documents(s, d))

  val dedupLinesSql: String =
    """WITH base AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
      |l AS (SELECT doc_id, unnest(ls) AS ln,
      |             unnest(range(1, len(ls) + 1)) AS pos FROM base),
      |d AS (SELECT ln FROM l WHERE trim(ln) <> ''
      |      GROUP BY ln HAVING count(DISTINCT doc_id) >= 2)
      |SELECT l.doc_id,
      |  count(*) FILTER (WHERE d.ln IS NULL) AS n_kept,
      |  count(*) FILTER (WHERE d.ln IS NOT NULL) AS n_dropped,
      |  coalesce(string_agg(l.ln, chr(10) ORDER BY l.pos)
      |             FILTER (WHERE d.ln IS NULL), '') AS clean_text
      |FROM l LEFT JOIN d ON l.ln = d.ln
      |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin

  /** C63 `dedup_span_removal`: ExactSubstr-style repeated-span REMOVAL
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better" — their exact-substring pass, token-granular):
    * where C25 only *measures* exposure, this op rewrites the corpus.
    * Every 20-token gram occurring ≥2 times corpus-wide (self-repeats
    * included) marks its 20 positions for removal; a document's
    * cleaned text is the surviving tokens rejoined on single spaces.
    * Shape at 100 TB: explode → one partial-agg groupBy on the 64-bit
    * gram hash → hash-keyed join back (the repeated-gram table is a
    * small fraction of the stream; AQE broadcasts it) → one per-doc
    * collect of the duplicate START positions — O(dup grams per doc),
    * bounded, never the token stream — then the position-set expansion
    * and token filter run ROW-LOCALLY on the already-materialized
    * token array. Shuffle keys are 8-byte hashes, never gram strings;
    * the oracle recomputes over gram strings (injective-hash argument,
    * as C22/C25). Cleaned text is compared by md5 so the dump stays
    * narrow.
    */
  val SpanN = 20

  def spanRemoval(s: SparkSession, d: String): DataFrame =
    spanRemovalOf(Tables.documents(s, d))

  /** Production body over any (doc_id, text) frame — the randomized
    * exactness spec drives synthetic corpora through this same plan.
    */
  def spanRemovalOf(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"),
      graft.pipeline.TextOps.tokens(col("text")).as("toks"), col("text"))
    // gram stream materialized ONCE (fault-tolerant persist) so the
    // repeated-gram detection and the position collect share one gram
    // chain (r13 kept one pass with a count window; r14 replaces the
    // window with a map-side-combined groupBy + semi-join — a window
    // by gram hash buffers every instance of exactly the hot repeated
    // grams in one task, and AQE skew handling never applies to
    // windows, guide §2.5). Kept rows identical: cnt ≥ 2 ≡ the join.
    val grams = Mat.fact(base.select(col("doc_id"),
      posexplode(exprs.shingleHashesAll(col("text"), SpanN)).as(Seq("pos", "sh")))
      .repartition(col("sh")))
    val rep = grams.groupBy(col("sh")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select(col("sh"))
    val starts = grams.join(rep, Seq("sh"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("starts"))
    base.join(starts, Seq("doc_id"), "left")
      .withColumn("starts",
        coalesce(col("starts"), array().cast("array<int>")))
      .withColumn("covered",
        array_distinct(flatten(transform(col("starts"),
          st => sequence(st, st + lit(SpanN - 1))))))
      .withColumn("kept",
        filter(col("toks"), (t, i) => !array_contains(col("covered"), i)))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        size(col("kept")).cast("long").as("n_kept"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"),
        md5(array_join(col("kept"), " ").cast("binary")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  val spanRemovalSql: String = {
    val gram = (0 until SpanN).map(k => s"t[pos+$k]").mkString(" || ' ' || ")
    s"""WITH w AS (SELECT doc_id, ${graft.pipeline.TextOps.tokensSql} AS t FROM documents),
       |gi AS (
       |  SELECT doc_id, t, unnest(CASE WHEN len(t) >= $SpanN
       |    THEN range(1, len(t) - ${SpanN - 2}) ELSE [] END) AS pos
       |  FROM w),
       |g AS (SELECT doc_id, pos, $gram AS sh FROM gi),
       |rep AS (SELECT sh FROM g GROUP BY sh HAVING count(*) >= 2),
       |st AS (
       |  SELECT doc_id, list_sort(list(pos)) AS starts
       |  FROM g JOIN rep USING (sh) GROUP BY doc_id),
       |cov AS (
       |  SELECT w.doc_id, t,
       |    list_distinct(flatten(list_transform(coalesce(starts, []),
       |      s -> range(s, s + $SpanN)))) AS covered
       |  FROM w LEFT JOIN st ON w.doc_id = st.doc_id),
       |k AS (
       |  SELECT doc_id, t,
       |    list_filter(t, (x, i) -> NOT list_contains(covered, i)) AS kept
       |  FROM cov)
       |SELECT doc_id,
       |  CAST(len(t) AS BIGINT) AS n_toks,
       |  CAST(len(kept) AS BIGINT) AS n_kept,
       |  CAST(len(t) - len(kept) AS BIGINT) AS n_removed,
       |  md5(coalesce(array_to_string(kept, ' '), '')) AS clean_md5
       |FROM k ORDER BY doc_id""".stripMargin
  }

  /** C70 `corpus_source_overlap`: the source×source content-overlap
    * matrix — exact corpus-level shingle Jaccard for every pair of
    * sources (C15 compared two fixed datasets; mixture design needs
    * the full matrix: which crawls re-scrape each other, which
    * "distinct" sources are the same site relabeled). Exact, not
    * sketched: distinct (source, shingle-hash) pairs → one self-join
    * on the 8-byte hash (shuffle ∝ shared shingles; the per-source
    * distinct set is the C4 inverted-index shape) → pair intersection
    * counts; union sizes fold from per-source totals, so J needs no
    * second pass. At 100 TB with many sources swap to the implemented
    * sketch dial [[sourceOverlapSketch]] — one MinHash signature per
    * source, the shared-shingle join term gone entirely. Oracle
    * recomputes over gram strings (injective-hash argument, as
    * C4/C25).
    */
  def sourceOverlap(s: SparkSession, d: String): DataFrame =
    sourceOverlapOf(Tables.documents(s, d))

  def sourceOverlapOf(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("source"), explode(exprs.shingleHashes(col("text"), 5)).as("sh"))
      .distinct()
    val totals = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val a = sh.select(col("source").as("src_a"), col("sh"))
    val b = sh.select(col("source").as("src_b"), col("sh"))
    a.join(b, "sh").filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("n_shared"))
      .join(broadcast(totals.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(totals.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_shared"), col("n_a"), col("n_b"),
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"), 6).as("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** C70's SKETCH dial — the many-source/100 TB gear the exact matrix
    * scaladoc promises: ONE [[graft.functions.MinHashAgg]] signature
    * per source (a map-side-combinable aggregate whose shuffle is 256
    * longs per source per partition — constant in corpus size), then
    * the |sources|² pair matrix is estimated driver-side from the
    * collected signatures (|sources| is mixture-design-sized, never
    * data-sized). Where the exact entry's inverted-index self-join
    * shuffles the shared-shingle volume (grows with real cross-source
    * overlap), this path's cost is one corpus scan, full stop — the
    * trade is ±1/√256 ≈ 0.06 estimator noise, bounded at 5σ by the
    * `_check` twin and the spec. Pairs with zero shared shingles ARE
    * emitted (est ≈ 0), unlike the exact entry's inner join.
    */
  def sourceOverlapSketch(s: SparkSession, d: String): DataFrame =
    sourceOverlapSketchOf(s, Tables.documents(s, d))

  def sourceOverlapSketchOf(s: SparkSession, docs: DataFrame): DataFrame = {
    import graft.functions.MinHashAgg
    val sigs = docs
      .select(col("source"), exprs.shingleHashes(col("text"), 5).as("hs"))
      .groupBy(col("source"))
      .agg(MinHashAgg.minHashAgg(col("hs"), Seed, 256).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).sortBy(_._1)
    val pairs = for {
      i <- sigs.indices
      j <- (i + 1) until sigs.length
    } yield (sigs(i)._1, sigs(j)._1,
      math.round(MinHashAgg.estimate(sigs(i)._2, sigs(j)._2) * 1e6) / 1e6)
    import s.implicits._
    pairs.toSeq.toDF("src_a", "src_b", "est_jaccard")
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Invariant oracle for the sketch dial: every estimated pair must
    * land within 5σ of the EXACT matrix (σ = √(J(1−J)/256) ≤ 1/32 ⇒
    * gate 0.16, the C15 bound), and the sketch must emit the COMPLETE
    * matrix (all C(|sources|, 2) pairs — the exact entry's inner join
    * drops zero-overlap pairs, the sketch never does).
    */
  def sourceOverlapSketchCheck(s: SparkSession, d: String): DataFrame = {
    val exact = sourceOverlap(s, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    val est = sourceOverlapSketch(s, d).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
    val nSources = Tables.documents(s, d).select(col("source")).distinct().count()
    val viol = est.count { case (k, e) => math.abs(e - exact.getOrElse(k, 0.0)) > 0.16 }
    import s.implicits._
    Seq((viol.toLong, est.length.toLong == nSources * (nSources - 1) / 2))
      .toDF("estimator_violations", "matrix_complete")
  }

  val sourceOverlapSketchCheckSql: String =
    "SELECT CAST(0 AS BIGINT) AS estimator_violations, true AS matrix_complete"

  val sourceOverlapSql: String = {
    val gram5 = (0 until 5).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    s"""WITH w AS (SELECT source, ${graft.pipeline.TextOps.tokensSql} AS t FROM documents),
       |g AS (
       |  SELECT DISTINCT source, unnest(CASE WHEN len(t) >= 5
       |    THEN list_transform(range(1, len(t) - 3), i -> $gram5)
       |    ELSE [] END) AS sh
       |  FROM w),
       |tot AS (SELECT source, count(*) AS n FROM g GROUP BY source),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
       |  FROM g a JOIN g b ON a.sh = b.sh AND a.source < b.source
       |  GROUP BY a.source, b.source)
       |SELECT src_a, src_b, n_shared, ta.n AS n_a, tb.n AS n_b,
       |  round(CAST(n_shared AS DOUBLE) / CAST(ta.n + tb.n - n_shared AS DOUBLE), 6)
       |    AS jaccard
       |FROM pairs JOIN tot ta ON ta.source = src_a JOIN tot tb ON tb.source = src_b
       |ORDER BY src_a, src_b""".stripMargin
  }

  /** C71 `dedup_decontaminate`: contamination REMOVAL — C21 only
    * FLAGS train docs sharing a 13-gram with the benchmark slice; the
    * actual decontamination pass (the GPT-3 appendix-C recipe) rewrites
    * them, excising every train-side span that collides with a
    * benchmark 13-gram. Same machinery as C63 with the duplicate-gram
    * table swapped for the benchmark-gram table: the benchmark side is
    * tiny at any scale (eval sets are fixed-size) so its distinct
    * hash set broadcasts; train grams probe it, dup START positions
    * collect per doc (bounded by collisions), and the position-set
    * expansion + token filter run row-locally. Emits only AFFECTED
    * docs (the clean majority passes untouched and unlisted — at
    * 100 TB the output is collision-proportional).
    */
  val DecontamN = 13

  def decontaminate(s: SparkSession, d: String): DataFrame =
    decontaminateOf(Tables.documents(s, d))

  def decontaminateOf(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"),
      graft.pipeline.TextOps.tokens(col("text")).as("toks"), col("text"))
    val bench = base.filter(col("doc_id") % 10 === 0)
      .select(explode(exprs.shingleHashes(col("text"), DecontamN)).as("sh")).distinct()
    val train = base.filter(col("doc_id") % 10 =!= 0)
    val hits = train
      .select(col("doc_id"),
        posexplode(exprs.shingleHashesAll(col("text"), DecontamN)).as(Seq("pos", "sh")))
      .join(bench, "sh") // benchmark side broadcasts (AQE; eval sets are small)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("starts"))
    train.join(hits, "doc_id") // inner: only affected docs pay the rewrite
      .withColumn("covered",
        array_distinct(flatten(transform(col("starts"),
          st => sequence(st, st + lit(DecontamN - 1))))))
      .withColumn("kept",
        filter(col("toks"), (t, i) => !array_contains(col("covered"), i)))
      .select(col("doc_id"),
        size(col("starts")).cast("long").as("n_collisions"),
        size(col("toks")).cast("long").as("n_toks"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"),
        md5(array_join(col("kept"), " ").cast("binary")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  val decontaminateSql: String = {
    val gram = (0 until DecontamN).map(k => s"t[pos+$k]").mkString(" || ' ' || ")
    s"""WITH w AS (SELECT doc_id, ${graft.pipeline.TextOps.tokensSql} AS t FROM documents),
       |bench AS (
       |  SELECT DISTINCT unnest(CASE WHEN len(t) >= $DecontamN
       |    THEN list_transform(range(1, len(t) - ${DecontamN - 2}), pos -> $gram)
       |    ELSE [] END) AS sh
       |  FROM w WHERE doc_id % 10 = 0),
       |gi AS (
       |  SELECT doc_id, t, unnest(CASE WHEN len(t) >= $DecontamN
       |    THEN range(1, len(t) - ${DecontamN - 2}) ELSE [] END) AS pos
       |  FROM w WHERE doc_id % 10 <> 0),
       |g AS (SELECT doc_id, pos, $gram AS sh FROM gi),
       |st AS (
       |  SELECT doc_id, list_sort(list(pos)) AS starts
       |  FROM g JOIN bench USING (sh) GROUP BY doc_id),
       |cov AS (
       |  SELECT w.doc_id, t, starts,
       |    list_distinct(flatten(list_transform(starts,
       |      s -> range(s, s + $DecontamN)))) AS covered
       |  FROM w JOIN st ON w.doc_id = st.doc_id),
       |k AS (
       |  SELECT doc_id, starts, t,
       |    list_filter(t, (x, i) -> NOT list_contains(covered, i)) AS kept
       |  FROM cov)
       |SELECT doc_id,
       |  CAST(len(starts) AS BIGINT) AS n_collisions,
       |  CAST(len(t) AS BIGINT) AS n_toks,
       |  CAST(len(t) - len(kept) AS BIGINT) AS n_removed,
       |  md5(coalesce(array_to_string(kept, ' '), '')) AS clean_md5
       |FROM k ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_decontaminate"   -> (decontaminate _),
    "corpus_source_overlap" -> (sourceOverlap _),
    "corpus_source_overlap_sketch" -> (sourceOverlapSketch _),
    "corpus_source_overlap_sketch_check" -> (sourceOverlapSketchCheck _),
    "dedup_span_removal"  -> (spanRemoval _),
    "dataset_similarity"  -> (datasetSimilarity _),
    "dedup_lines"         -> (dedupLines _),
    "dedup_exact"         -> (exact _),
    "dedup_normalized"    -> (normalized _),
    "dedup_minhash"       -> (minhash _),
    "dedup_simhash"       -> (simhash _),
    "dedup_containment" -> (containment _),
    "dedup_threshold_sweep" -> (dedupThresholdSweep _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_clusters"      -> (clusters _),
    "dedup_apply"         -> (dedupApply _),
    "dedup_incremental"      -> (incrementalExact _),
    "dedup_incremental_near" -> (incrementalNear _),
    "dedup_edit_distance" -> (editDistancePairs _),
    "dedup_incremental_bloom" -> (incrementalBloom _),
    "dedup_simhash_check"    -> (simhashCheck _),
    "dataset_similarity_check" -> (datasetSimilarityCheck _))

  val oracles: Map[String, String] = Map(
    "dedup_decontaminate"   -> decontaminateSql,
    "corpus_source_overlap" -> sourceOverlapSql,
    "corpus_source_overlap_sketch_check" -> sourceOverlapSketchCheckSql,
    "dedup_span_removal"  -> spanRemovalSql,
    "dedup_lines"         -> dedupLinesSql,
    "dedup_exact"         -> exactSql,
    "dedup_normalized"    -> normalizedSql,
    "dedup_minhash"       -> jaccardSql,
    // the 128-bit sketch has measured recall 1 on the test corpora
    // (band-miss 0 at sf0.001/0.01/0.1), so C3 carries the exact-set
    // oracle again; the invariant twin keeps the scale-true claims
    "dedup_simhash"       -> jaccardSql,
    "dedup_simhash_check" -> simhashCheckSql,
    "dedup_containment" -> containmentSql,
    "dedup_threshold_sweep" -> dedupThresholdSweepSql,
    "dedup_ngram_jaccard" -> ngramJaccardCappedSql,
    "dedup_clusters"      -> clustersSql,
    "dedup_apply"         -> dedupApplySql,
    "dedup_incremental"      -> incrementalExactSql,
    "dedup_incremental_near" -> incrementalNearSql,
    "dedup_edit_distance" -> editDistancePairsSql,
    "dedup_incremental_bloom" -> incrementalBloomSql,
    "dataset_similarity_check" -> datasetSimilarityCheckSql)
}
