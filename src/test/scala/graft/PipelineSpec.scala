package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{exprs, Hashing}
import graft.pipeline.{Dedup, Multimodal, TextOps, VectorOps}

class PipelineSpec extends SparkSpec {

  test("polyHash matches the portable definition") {
    // ((0*31+97)*31+98)*31+99 mod 1e9+7 — same value DuckDB's
    // list_reduce oracle computes for 'abc'.
    assert(Hashing.polyHashString("abc") === 96354L)
    assert(Hashing.polyHashString("") === 0L)
  }

  test("winnow guarantees: minima of every window, sorted distinct") {
    import spark.implicits._
    val out = Seq("the quick brown fox jumps over the lazy dog")
      .toDF("text")
      .select(exprs.winnowFp(col("text"), 8, 4).as("fp"))
      .collect().head.getSeq[Long](0)
    assert(out.nonEmpty && out == out.sorted && out.distinct.size == out.size)
    // every fingerprint must be the hash of some 8-gram of the input
    val allHashes = "the quick brown fox jumps over the lazy dog"
      .sliding(8).map(Hashing.polyHashString).toSet
    assert(out.forall(allHashes.contains))
  }

  test("cosine expression: known vectors, double precision") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
                 (Array(1.0f, 1.0f), Array(1.0f, 1.0f)),
                 (Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val got = df.select(exprs.cosineSim(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(got(0)) < 1e-15)
    assert(math.abs(got(1) - 1.0) < 1e-15)
    assert(got(2) === 0.0) // zero-norm guard
  }

  test("text ops cover every document exactly once") {
    for (q <- Seq(TextOps.langId _, TextOps.quality _, TextOps.tokenCounts _)) {
      val df = q(spark, sfDir)
      assert(df.count() === 500)
      assert(df.select("doc_id").distinct().count() === 500)
    }
  }

  test("minhash+verify equals exact ngram jaccard (recall 1 at J>=0.5)") {
    val lsh = Dedup.minhash(spark, sfDir).collect().toSet
    val exact = Dedup.ngramJaccard(spark, sfDir).collect().toSet
    assert(exact.nonEmpty, "expected planted near-dup pairs in testdata")
    assert(lsh === exact)
  }

  test("ngram jaccard keeps short-document near-dups (size-aware candidate filter)") {
    import spark.implicits._
    // Docs under ~13 words have < 8 shared shingles even at J ≥ 0.5;
    // a constant intersection floor would silently drop them.
    //  - 1 vs 2: 10-word doc vs its 9-word prefix → i=7, J=7/8
    //  - 3 vs 4: identical 5-word docs → i=3, J=1
    //  - 5 shares nothing
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
      (2L, "alpha bravo charlie delta echo foxtrot golf hotel india"),
      (3L, "one two three four five"),
      (4L, "one two three four five"),
      (5L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val got = Dedup.ngramJaccardOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === Set((1L, 2L), (3L, 4L)))
    assert(math.abs(got((1L, 2L)) - 0.875) < 1e-9)
    assert(got((3L, 4L)) === 1.0)
  }

  test("repetition signals: line/para/word/ngram duplicate fractions on crafted docs") {
    import spark.implicits._
    val docs = Seq(
      // lines [x, x, x, y]: 4 total, 2 distinct → dup_line 2/4
      (1L, "x\nx\nx\ny"),
      // "spam spam spam spam": words 4→1 distinct = 3/4; bigrams 3→1 = 2/3
      (2L, "spam spam spam spam"),
      (3L, ""),          // empty: everything 0, no div-by-zero
      (4L, "one"),       // 1 word: no bigrams → 0
      (5L, "a b c d"),   // all distinct → all 0
      (6L, "p q\n\np q") // identical paragraphs → dup_para 1/2
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionOf(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getDouble(1) === 0.5, "dup_line_frac")
    assert(r(6L).getDouble(2) === 0.5, "dup_para_frac")
    assert(r(2L).getDouble(3) === 0.75, "dup_word_frac")
    assert(math.abs(r(2L).getDouble(4) - 0.666667) < 1e-9, "dup_2gram_frac")
    assert(math.abs(r(2L).getDouble(5) - 0.5) < 1e-9, "dup_3gram_frac")
    (1 to 6).foreach(i => assert(!r(i.toLong).anyNull, "no nulls, ANSI-safe"))
    assert(Seq(1, 2, 3, 4, 5, 6).forall { i =>
      val row = r(i.toLong); (1 to 5).forall(j => row.getDouble(j) >= 0.0 && row.getDouble(j) <= 1.0)
    })
    assert(r(3L).getDouble(3) === 0.0 && r(4L).getDouble(4) === 0.0 && r(5L).getDouble(5) === 0.0)
  }

  test("line dedup: cross-doc boilerplate dropped, intra-doc repeats and blanks kept, order exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "HEADER\nunique one\nFOOTER"),
      (2L, "HEADER\nunique two\nFOOTER"),
      (3L, "solo line\n\nHEADER"),       // blank line is structure, kept
      (4L, "only mine\nonly mine"),      // repeats within ONE doc only → kept
      (5L, "")                           // empty doc survives as one kept blank
    ).toDF("doc_id", "text")
    val r = Dedup.dedupLinesOf(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) === ((1L, 2L, "unique one")))
    assert(r(2L) === ((1L, 2L, "unique two")))
    assert(r(3L) === ((2L, 1L, "solo line\n")))
    assert(r(4L) === ((2L, 0L, "only mine\nonly mine")))
    assert(r(5L) === ((1L, 0L, "")))
  }

  test("dup spans: corpus-repeated 20-grams counted per doc, short docs yield zero grams") {
    import spark.implicits._
    val block = (1 to 25).map(i => s"tok$i").mkString(" ") // 25 tokens → 6 20-grams
    val docs = Seq(
      (1L, block),                     // shares all grams with doc 2
      (2L, block + " tail1 tail2"),    // 27 tokens → 8 grams, 6 shared
      (3L, (1 to 30).map(i => s"uniq$i").mkString(" ")), // 11 grams, none repeated
      (4L, "short doc under twenty tokens"),             // 0 grams
      (5L, (block + " " + block))      // 50 tokens: self-repeats count too
    ).toDF("doc_id", "text")
    val r = TextOps.dupSpansOf(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1L) === ((6L, 6L)), "all of doc 1's grams repeat in doc 2/5")
    assert(r(2L)._1 === 8L && r(2L)._2 >= 6L)
    assert(r(3L) === ((11L, 0L)))
    assert(r(4L) === ((0L, 0L)))
    assert(r(5L)._1 === 31L && r(5L)._2 >= 12L, "intra-doc repeats are duplication")
  }

  test("corpus filter: each rule fires on its crafted doc, precedence fixed, keep iff ok") {
    import spark.implicits._
    val stopy = "the cat and the dog ran to the house in the rain for fun"
    val docs = Seq(
      (1L, stopy),                               // ok
      (2L, "tiny doc"),                          // too_short (2 words)
      (3L, ("w " * 5001).trim),                  // too_long… but dup words don't trip first
      (4L, "a,b;c:d!e?f.g," * 3),                // high_punct
      (5L, "zebra quartz viper kumquat oryx"),   // low_stopword (0 En stopwords)
      (6L, Seq.fill(4)(stopy).mkString("\n")),   // repetitive_lines (dup 3/4)
      (7L, "")                                   // empty → too_short
    ).toDF("doc_id", "text")
    val r = TextOps.corpusFilterOf(docs).collect()
      .map(x => x.getLong(0) -> ((x.getBoolean(1), x.getString(2)))).toMap
    assert(r(1L) === ((true, "ok")))
    assert(r(2L) === ((false, "too_short")))
    assert(r(3L) === ((false, "too_long")))
    assert(r(4L) === ((false, "high_punct")))
    assert(r(5L) === ((false, "low_stopword")))
    assert(r(6L) === ((false, "repetitive_lines")))
    assert(r(7L) === ((false, "too_short")))
  }

  test("edge-case corpus: empty, 1-word, unicode, punct-only docs flow through every text/dedup op") {
    import spark.implicits._
    val dir = "/root/repo/target/edgedocs"
    Seq(
      (1L, ""),
      (2L, "word"),
      (3L, "héllo wörld açaí"),
      (4L, "the quick brown fox"),
      (5L, "the quick brown fox"),
      (6L, "a b"),
      (7L, "punct!!! ... ???")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val lang = TextOps.langId(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(lang(1L) === "und", "empty doc must classify as undetermined")
    assert(lang(4L) === "en")

    val q = TextOps.quality(spark, dir).collect().map(r => r.getLong(0) -> r).toMap
    assert(q.size === 7)
    assert(q(1L).getLong(1) === 0L && q(1L).getLong(2) === 0L)

    val tc = TextOps.tokenCounts(spark, dir).collect().map(r => r.getLong(0) -> r).toMap
    assert(tc(1L).getLong(1) === 0L && tc(1L).getLong(2) === 0L)
    assert(tc(2L).getLong(1) === 1L && tc(2L).getLong(2) === 1L)

    val fps = TextOps.fingerprint(spark, dir).collect()
    assert(!fps.exists(_.getLong(0) == 1L), "no 8-gram in an empty text")
    assert(fps.exists(_.getLong(0) == 3L), "unicode text still fingerprints")

    // dedup family: only the identical pair (4,5) qualifies; docs with
    // empty shingle sets (1, 2, 6, 7) must neither crash nor pair up
    val nj = Dedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(nj === Map((4L, 5L) -> 1.0))
    val mh = Dedup.minhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh === Set((4L, 5L)))
    val ex = Dedup.exact(spark, dir).collect()
    assert(ex.count(_.getLong(1) == 2L) === 1, "exactly one exact-dup group (4,5)")

    assert(TextOps.sampleSplit(spark, dir).count() === 7)
    assert(TextOps.tfidf(spark, dir).collect().forall(_.getLong(1) <= 3L))
  }

  test("containment: nested doc found both-directions-correctly, invisible to jaccard, tiny sources gated") {
    import spark.implicits._
    val dir = "/root/repo/target/containdocs"
    val core = "alpha beta gamma delta epsilon zeta eta theta"   // 6 shingles
    val filler = (1 to 40).map(i => s"filler$i word$i").mkString(" ")
    val filler2 = (1 to 40).map(i => s"pad$i item$i").mkString(" ")
    Seq(
      (1L, core),                         // 6-shingle source
      (2L, s"$core $filler"),             // superset: contains doc 1 fully
      (3L, "tiny snippet here"),          // 1 shingle — below the source gate
      (4L, s"tiny snippet here $filler2"),// superset of 3, but 3 is gated
      (5L, "unrelated text about completely different things entirely")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Dedup.containment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === Set((1L, 2L)), s"expected only 1⊂2, got ${got.keySet}")
    assert(got((1L, 2L)) === 1.0, "doc 1's shingles are all inside doc 2")
    // the asymmetric signal: Jaccard can't see this pair (J ≈ 6/46)
    val jac = Dedup.ngramJaccard(spark, dir).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "the contained pair must be invisible to J ≥ 0.5 — that's the point of C53")
  }

  test("ppl buckets: per-lang thirds on real data, threshold semantics, no corpus rank window") {
    val dir = "/root/testdata/sf0.01"
    val rows = TextOps.pplBuckets(spark, dir).collect()
    val byLang = rows.groupBy(_.getString(1))
    assert(byLang.size > 1, "need several languages for the per-lang claim")
    byLang.foreach { case (lang, rs) =>
      val n = rs.length
      val heads = rs.count(_.getString(3) == "head")
      val tails = rs.count(_.getString(3) == "tail")
      // thirds up to tie granularity: every bucket within n/3 ± ties.
      // nlp is 6-dp-quantized so exact ties are possible but rare.
      assert(heads > 0 && tails > 0, s"$lang: degenerate bucketing")
      assert(math.abs(heads - n / 3.0) <= math.max(2, n * 0.1),
        s"$lang: head=$heads of $n is not a tercile")
      // threshold semantics: equal scores never straddle a boundary
      val byScore = rs.groupBy(_.getDouble(2))
      assert(byScore.forall(_._2.map(_.getString(3)).distinct.size == 1),
        s"$lang: tied scores split across buckets — rank leakage")
      // monotonicity: every head score > every middle score > every tail
      def maxOf(b: String) = rs.filter(_.getString(3) == b).map(_.getDouble(2))
      val (h, m, t) = (maxOf("head"), maxOf("middle"), maxOf("tail"))
      if (h.nonEmpty && m.nonEmpty) assert(h.min > m.max)
      if (m.nonEmpty && t.nonEmpty) assert(m.min > t.max)
    }
    // plan shape: the only Window-free threshold path — no rank/row_number
    val plan = TextOps.pplBuckets(spark, dir).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), "bucketing must not rank the corpus")
  }

  test("image phash dedup: planted variants found exactly, hamming margins wide") {
    import spark.implicits._
    val pairs = Multimodal.mmPhashDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Tables.documents(spark, sfDir).select("doc_id").as[Long].collect()
      .filter(_ % 10 == 0).map(id => (id, Multimodal.PhashPlantOffset + id)).toSet
    assert(pairs === expected, "admitted pairs must be exactly the planted variants")
    // margins: planted pairs sit far below the gate, unrelated images far above
    val hs = Multimodal.dhashImages(spark, Multimodal.phashAssets(spark, sfDir))
      .collect().map(p => p.doc_id -> p.dhash).toMap
    val plantH = expected.toSeq.map { case (a, b) =>
      java.lang.Long.bitCount(hs(a) ^ hs(b)) }
    assert(plantH.max <= Multimodal.PhashHammingMax / 2,
      s"planted hamming up to ${plantH.max} leaves no margin")
    val others = hs.keys.filter(_ < Multimodal.PhashPlantOffset).toSeq.sorted.take(60)
    val crossH = for (a <- others; b <- others if a < b)
      yield java.lang.Long.bitCount(hs(a) ^ hs(b))
    assert(crossH.min > Multimodal.PhashHammingMax,
      s"unrelated images got as close as ${crossH.min} bits")
  }

  test("audio fingerprint dedup: planted re-encodes found exactly, contour margins wide") {
    import spark.implicits._
    val pairs = Multimodal.mmAudioDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Tables.documents(spark, sfDir).select("doc_id").as[Long].collect()
      .filter(_ % 10 == 0).map(id => (id, Multimodal.AudioPlantOffset + id)).toSet
    assert(pairs === expected, "admitted pairs must be exactly the planted re-encodes")
    val hs = Multimodal.fingerprintAudio(spark, Multimodal.afpAssets(spark, sfDir))
      .collect().map(p => p.doc_id -> p.afp).toMap
    val plantH = expected.toSeq.map { case (a, b) =>
      java.lang.Long.bitCount(hs(a) ^ hs(b)) }
    assert(plantH.max <= Multimodal.AfpHammingMax,
      s"planted contour hamming up to ${plantH.max} would lose recall")
    val others = hs.keys.filter(_ < Multimodal.AudioPlantOffset).toSeq.sorted.take(60)
    val crossH = for (a <- others; b <- others if a < b)
      yield java.lang.Long.bitCount(hs(a) ^ hs(b))
    assert(crossH.min > Multimodal.AfpHammingMax,
      s"unrelated audio got as close as ${crossH.min} bits")
  }

  test("vocab growth: monotone curve whose endpoint is the exact corpus vocab and token totals") {
    val rows = TextOps.vocabGrowth(spark, sfDir).collect()
    assert(rows.length === 10 && rows.map(_.getLong(0)).toSeq === (0L until 10L))
    val cumV = rows.map(_.getLong(2)); val cumT = rows.map(_.getLong(4))
    assert(cumV.zip(cumV.tail).forall { case (a, b) => a <= b })
    assert(cumT.zip(cumT.tail).forall { case (a, b) => a <= b })
    val toks = Tables.documents(spark, sfDir)
      .select(explode(TextOps.tokens(col("text"))).as("t"))
    assert(cumV.last === toks.select("t").distinct().count())
    assert(cumT.last === toks.count())
    // new_terms per slice must sum to the endpoint (no term counted twice)
    assert(rows.map(_.getLong(1)).sum === cumV.last)
  }

  test("char entropy: closed-form values on crafted docs, zero-shuffle plan") {
    import spark.implicits._
    val dir = "/root/repo/target/entropydocs"
    Seq(
      (1L, "aaaa"),             // one symbol -> 0
      (2L, "abab"),             // two equiprobable -> ln 2
      (3L, "abcd"),             // four equiprobable -> ln 4
      (4L, ""),                 // empty -> 0 by convention
      (5L, "aab")               // 2/3,1/3 mix
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.charEntropy(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) === ((4L, 1L, 0.0)))
    assert(got(2L) === ((4L, 2L, math.rint(math.log(2) * 1e6) / 1e6)))
    assert(got(3L) === ((4L, 4L, math.rint(math.log(4) * 1e6) / 1e6)))
    assert(got(4L) === ((0L, 0L, 0.0)))
    val h5 = 2.0 / 3 * math.log(3.0 / 2) + 1.0 / 3 * math.log(3.0)
    assert(math.abs(got(5L)._3 - h5) < 1e-6)
    // narrow map: the ONLY exchange is the output sort's range partitioning
    val plan = TextOps.charEntropy(spark, dir).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 1 && !plan.contains("HashAggregate"),
      s"char entropy must be a shuffle-free per-row map, got:\n$plan")
  }

  test("contamination flags exactly the train docs sharing a 13-gram with benchmark docs") {
    import spark.implicits._
    val dir = "/root/repo/target/contamdocs"
    val span = "one two three four five six seven eight nine ten eleven twelve thirteen"
    Seq(
      (10L, s"benchmark doc contains $span exactly"),     // benchmark (id % 10 == 0)
      (3L, s"train doc also has $span inside it"),        // contaminated
      (7L, "completely clean training document with no overlap whatsoever here at all")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.contamination(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(3L -> ((1L, 1L))), "only the shared 13-gram doc is flagged")
  }

  test("PII redaction scrubs emails and IPs with exact counts") {
    import spark.implicits._
    val dir = "/root/repo/target/redactdocs"
    Seq(
      (1L, "contact me at jane.doe+spam@example.co.uk or on 192.168.1.254 today"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io c@d.org one ip 10.0.0.1")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextOps.redact(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) === ((1L, 1L, "contact me at [EMAIL] or on [IP] today")))
    assert(r(2L) === ((0L, 0L, "no pii here at all")))
    assert(r(3L)._1 === 2L && r(3L)._2 === 1L)
    assert(!r.values.exists(v => v._3.contains("@") || v._3.matches(".*\\d+\\.\\d+\\.\\d+\\.\\d+.*")))
  }

  test("multimodal pipeline: batched resize + frame-sample over every asset") {
    val out = Multimodal.mmPipelineStub(spark, sfDir).collect()
    assert(out.length === 500)
    out.foreach { r =>
      assert(r.getLong(1) <= 2048L)            // resized length capped
      assert(r.getLong(3) >= 1L)               // at least one sampled frame
    }
  }

  test("clusters converge on huge id domains (changed-count termination)") {
    import spark.implicits._
    // ids near Long.MaxValue: Σ(label) overflows, so convergence must
    // come from the changed-label count, not a label checksum.
    val M = Long.MaxValue
    val docs = Seq(
      (M - 1, "alpha bravo charlie delta echo foxtrot golf"),
      (M - 2, "alpha bravo charlie delta echo foxtrot golf"),
      (M - 3, "uno dos tres cuatro cinco seis siete"),
      (M - 4, "uno dos tres cuatro cinco seis siete"),
      (M - 5, "nothing in common with anyone else at all")
    ).toDF("doc_id", "text")
    val labels = Dedup.clustersOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(
      (M - 1) -> (M - 2), (M - 2) -> (M - 2),
      (M - 3) -> (M - 4), (M - 4) -> (M - 4),
      (M - 5) -> (M - 5)))
  }

  test("tfidf: 3 keywords per doc, rank consistent with score, terms in doc") {
    val rows = TextOps.tfidf(spark, sfDir).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length))
      // scores non-increasing with rank
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(sorted.length <= 3)
    }
  }

  test("dedup clusters: pair endpoints co-labeled, cluster_id = min member") {
    val labels = Dedup.clusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.ngramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // connected docs share a label (transitively, via propagation)
    pairs.foreach { case (a, b) =>
      assert(labels(a) === labels(b), s"pair ($a,$b) split across clusters") }
    // every label is the min doc_id of its member set
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(cid === members.keys.min) }
    // docs in no pair are singletons labeled with themselves
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    labels.filterNot(kv => paired.contains(kv._1)).foreach { case (v, l) =>
      assert(v === l) }
  }

  test("simhash recovers the exact near-dup pair set, hamming bounded") {
    val cands = Dedup.simhashCandidates(Tables.documents(spark, sfDir)).collect()
    assert(cands.forall(_.getAs[Long]("hamming") <= Dedup.SimHammingBound))
    val candPairs = cands.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val exact = Dedup.ngramJaccardOf(Tables.documents(spark, sfDir),
        postingDfCap = Int.MaxValue).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // the 128-bit signature's measured recall on the test corpora is 1
    assert(exact.subsetOf(candPairs),
      s"128-bit bands missed true pairs: ${exact -- candPairs}")
    // the driver entry is the VERIFIED form: exact Jaccard over the
    // candidates, so output == exact set (precision 1 by construction,
    // recall 1 measured)
    val ver = Dedup.simhash(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(ver === exact)
  }

  test("simhash 128-bit: recall 1.0 vs the exact pair set at sf0.1") {
    // the r3 64-bit/8-band gear measurably missed nine J >= 0.5 pairs
    // at THIS scale — pin the fix at the scale that exposed it
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    val got = Dedup.simhashOf(docs).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardOf(docs, postingDfCap = Int.MaxValue)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 200, s"sf0.1 corpus should carry a rich pair set, got ${exact.size}")
    assert(got === exact, s"missed: ${exact -- got}; spurious: ${got -- exact}")
  }

  test("exact dedup groups cover all docs") {
    val df = Dedup.exact(spark, sfDir)
    assert(df.agg(sum("n_docs")).collect().head.getLong(0) === 500L)
  }

  test("embedding dedup: LSH-banded plan matches exact pair scan, no nested-loop join") {
    // the shipped entry: production gate over the planted corpus
    val banded = VectorOps.embeddingPairs(spark, sfDir)
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"candidate generation must be a keyed join, got:\n$plan")
    val got = banded.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = VectorOps.embeddingPairsExactOf(
        VectorOps.plantedCorpus(spark, sfDir), VectorOps.ProdCosThreshold).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "planted corpus must yield pairs above the production gate")
    assert(got === exact, s"recall must be 1 on the test corpus; missed ${exact -- got}")
    // every planted near-dup pair is found
    val plantedIds = got.collect { case (a, b, _) if b >= VectorOps.PlantIdOffset => b - VectorOps.PlantIdOffset }
    assert(plantedIds.size === VectorOps.PlantCount.toLong.min(
      Tables.embeddings(spark, sfDir).count()).toInt)
    // the weak-threshold gear still works when asked for explicitly
    val weak = VectorOps.embeddingPairsAt(spark, sfDir, VectorOps.WeakCosThreshold).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val weakExact = VectorOps.embeddingPairsExact(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(weakExact.nonEmpty)
    assert(weak === weakExact)
  }

  test("semantic dedup: within-cluster drops only, keeper is lowest qualifying id") {
    val corpus = VectorOps.plantedCorpus(spark, sfDir)
    val out = VectorOps.semanticDedup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("keeper_id"), r.getAs[Double]("cos_sim")))
    assert(out.nonEmpty, "planted corpus must yield semantic drops")
    // keeper strictly precedes the dropped vector; gate respected
    out.foreach { case (v, _, k, c) =>
      assert(k < v, s"keeper $k must have lower id than dropped $v")
      assert(c >= VectorOps.ProdCosThreshold - 1e-6, s"pair ($k,$v) below gate: $c")
    }
    // each vector dropped at most once
    assert(out.map(_._1).distinct.length === out.length)
    // the planted copies of the seed vectors land in their original's
    // cluster (cos≈0.95 to the seed itself) and are dropped against it
    // (seeds are now stride-selected — k ∝ n — so recompute the stride)
    val step = VectorOps.semanticSeedStep(corpus.count())
    val seedPlants = out.filter { case (v, _, _, _) =>
      v >= VectorOps.PlantIdOffset &&
        (v - VectorOps.PlantIdOffset) < VectorOps.PlantCount &&
        (v - VectorOps.PlantIdOffset) % step == 0 }
    assert(seedPlants.nonEmpty) // id 0 is always a seed and always planted
    seedPlants.foreach { case (v, cl, k, _) =>
      assert(cl === (v - VectorOps.PlantIdOffset))
      assert(k === (v - VectorOps.PlantIdOffset))
    }
    // drops never cross clusters: recompute each member's cluster and
    // verify keeper + dropped agree (semantics: dedup WITHIN clusters)
    val clusterOf = VectorOps.semanticAssign(corpus)
      .select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).map(_.swap).toMap
    out.foreach { case (v, cl, k, _) =>
      assert(clusterOf(v) === cl, s"dropped $v reported cluster $cl but assigned ${clusterOf(v)}")
      assert(clusterOf(k) === cl, s"keeper $k of $v lives in ${clusterOf(k)}, not $cl")
    }
  }

  test("semantic dedup with k-means seeds: invariants hold, plants dropped, check row green") {
    val out = VectorOps.semanticDedupKmeans(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("keeper_id"), r.getAs[Double]("cos_sim")))
    assert(out.nonEmpty, "planted corpus must yield semantic drops")
    out.foreach { case (v, _, k, c) =>
      assert(k < v, s"keeper $k must have lower id than dropped $v")
      assert(c >= VectorOps.ProdCosThreshold - 1e-6, s"pair ($k,$v) below gate: $c")
    }
    assert(out.map(_._1).distinct.length === out.length, "each vector dropped at most once")
    // k-means clusters are tighter than stride-seed ones: a healthy
    // majority of the 40 planted near-dups (cos ≥ 0.9 to their
    // original) must co-cluster with a qualifying keeper and drop
    val plantedDrops = out.count(_._1 >= VectorOps.PlantIdOffset)
    assert(plantedDrops >= VectorOps.PlantCount / 2,
      s"only $plantedDrops of ${VectorOps.PlantCount} plants dropped")
    // determinism: same fit, same drops
    val again = VectorOps.semanticDedupKmeans(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("keeper_id")))
    assert(again.toSeq === out.map(t => (t._1, t._3)).toSeq)
    // the driver check row is all-green
    val chk = VectorOps.semanticDedupKmeansCheck(spark, sfDir).head()
    assert((chk.getLong(0), chk.getLong(1), chk.getLong(2), chk.getLong(3))
      === ((0L, 0L, 0L, 1L)))
  }

  test("quantizer training sample is capped and deterministic") {
    import spark.implicits._
    val big = (0L until 10000L).map(i => (i, Array.fill(4)(0.1f))).toDF("vec_id", "embedding")
    val n1 = VectorOps.trainSample(big).count()
    assert(n1 <= VectorOps.QuantizerTrainCap, s"sample $n1 over cap")
    assert(n1 === VectorOps.trainSample(big).count(), "sample must be deterministic")
    // below the cap the sample IS the corpus (small-SF behavior unchanged)
    val small = (0L until 100L).map(i => (i, Array.fill(4)(0.1f))).toDF("vec_id", "embedding")
    assert(VectorOps.trainSample(small).count() === 100L)
  }

  test("semantic seed stride scales k with corpus size (k ∝ n dial)") {
    // below the knee: k stays SemK, stride = n / SemK
    assert(VectorOps.semanticSeedStep(1600L) === 100L)
    // past the knee: k = n / SemTargetCluster, expected cluster ~flat
    val n10 = 160000L
    val k10 = math.max(VectorOps.SemK.toLong, n10 / VectorOps.SemTargetCluster)
    assert(k10 === 400L, "k must scale with the corpus")
    assert(VectorOps.semanticSeedStep(n10) === n10 / k10)
  }

  test("semantic assign on a lake corpus: n from manifest stats, zero plan-time jobs") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val root = "/root/repo/target/laketest/semlake"
    val t = graft.lake.GraftTable.create(spark, root,
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")))
    val manifestN = t.current.totalRows - t.current.deletedRows
    assert(manifestN === t.read().count(), "manifest row count must be exact")
    // constructing the lake-path assignment plan must launch NO job
    // (the parquet path pays one count() job here — that is the cost
    // the manifest lookup removes at 100 TB)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val lakeAssign = VectorOps.semanticAssignLake(t)
      // listener delivery is async — give the bus a beat to drain
      Thread.sleep(500)
      assert(jobs.get() === 0, "lake path must not run a count() job at plan time")
      // same stride, same assignment as the count()-based path
      val direct = VectorOps.semanticAssign(t.read())
      assert(lakeAssign.select("vec_id", "cluster_id").collect().map(r =>
        r.getLong(0) -> r.getLong(1)).toMap ===
        direct.select("vec_id", "cluster_id").collect().map(r =>
          r.getLong(0) -> r.getLong(1)).toMap)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("ann bruteforce: k ranked neighbors per query, no self-match") {
    val df = VectorOps.annBruteforce(spark, sfDir).collect()
    val byQ = df.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size === VectorOps.NQueries)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to VectorOps.TopK))
      assert(rows.forall(_.getAs[Long]("neighbor_id") != q))
      val sims = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ann lsh: candidates subset ranked exactly; recall vs bruteforce") {
    val lsh = VectorOps.annLsh(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = VectorOps.annBruteforce(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"lsh recall $recall")
  }

  test("ann ivf: probed-list search recall vs bruteforce") {
    val ivf = VectorOps.annIvf(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = VectorOps.annBruteforce(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"ivf recall $recall")
    // per-query output is still a ranked top-k
    assert(ivf.size === VectorOps.NQueries * VectorOps.TopK)
  }

  test("ann pq: ADC top-50 + exact rerank recall vs bruteforce") {
    val pq = VectorOps.annPq(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = VectorOps.annBruteforce(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = pq.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"pq recall $recall")
    assert(pq.size === VectorOps.NQueries * VectorOps.TopK)
    // reranked neighbors carry the TRUE cosine: every returned pair's
    // cos_sim must equal the bruteforce value when the pair overlaps
    val exactSim = VectorOps.annBruteforce(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cos_sim")).toMap
    VectorOps.annPq(spark, sfDir).collect().foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      exactSim.get(k).foreach(v => assert(r.getAs[Double]("cos_sim") === v))
    }
  }

  test("ann sq: scalar-quantized scan + exact rerank recall vs bruteforce; check row green") {
    val sq = VectorOps.annSq(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = VectorOps.annBruteforce(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = sq.intersect(exact).size.toDouble / exact.size
    // per-dim 8-bit error is tiny relative to PQ's 16-code subspaces:
    // SQ should recall strictly better than the PQ floor
    assert(recall >= 0.8, s"sq recall $recall")
    assert(sq.size === VectorOps.NQueries * VectorOps.TopK)
    val chk = VectorOps.annSqCheck(spark, sfDir).collect().head
    assert(chk.getLong(0) === 0L && chk.getLong(1) === 0L,
      s"dominance/completeness check: ${chk.mkString(",")}")
  }

  test("ann ivfpq: composed coarse-probe + ADC scan recall vs bruteforce") {
    val ivfpq = VectorOps.annIvfPq(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = VectorOps.annBruteforce(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = ivfpq.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"ivfpq recall $recall")
    assert(ivfpq.size === VectorOps.NQueries * VectorOps.TopK)
    // the composition can never exceed PQ-alone candidates: every
    // returned neighbor must live in one of the query's probed lists
    // (structural containment is what IVF contributes) — verified via
    // the rank-dominance/completeness driver check too
    val sims = VectorOps.annIvfPq(spark, sfDir).collect()
      .map(_.getAs[Double]("cos_sim"))
    assert(sims.forall(s => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
  }

  test("ivfpq residual encoding: recall beats raw-vector codes on a clustered corpus") {
    // Residual encoding's claim is about CLUSTERED data: within a tight
    // inverted list the residual spread is far smaller than the vector
    // spread, so the same 4-bit codes quantize finer. (On the uniform
    // random test corpus the effect is ~nil by construction — lists are
    // not tight — so the comparison is run where the claim applies.)
    // Deterministic seeded corpus: 16 well-separated anchors, 500 unit
    // vectors at ~0.2 noise around them.
    val dim = VectorOps.EmbDim; val k = 16
    val rnd = new scala.util.Random(4242)
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val anchors = Array.fill(k)(normalize(Array.fill(dim)(rnd.nextGaussian())))
    val rows = (0 until 500).map { i =>
      val a = anchors(i % k)
      val v = normalize(a.map(_ + 0.2 * rnd.nextGaussian()))
      (i.toLong, v.map(_.toFloat))
    }
    val tmp = "/root/repo/target/laketest/ivfpq-clustered"
    import spark.implicits._
    rows.toDF("vec_id", "embedding").repartition(4)
      .write.mode("overwrite").parquet(tmp + "/embeddings.parquet")

    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      val exact = VectorOps.annBruteforce(spark, tmp).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val nq = VectorOps.NQueries.toLong
    val pl = recallOf(VectorOps.annIvfPqBatch(spark, tmp, nq,
      residual = true, perList = true))
    val res = recallOf(VectorOps.annIvfPqBatch(spark, tmp, nq,
      residual = true, perList = false))
    val raw = recallOf(VectorOps.annIvfPqBatch(spark, tmp, nq, residual = false))
    assert(res >= raw, s"residual recall $res < raw-codes recall $raw")
    assert(pl >= res, s"per-list recall $pl < shared residual recall $res")
    assert(pl >= 0.7, s"per-list residual ivfpq recall $pl on the clustered corpus")
    // and on the standard corpus the residual path still clears the
    // recall floor (no regression where the claim is neutral)
    val stdGot = VectorOps.annIvfPq(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val stdExact = VectorOps.annBruteforce(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(stdGot.intersect(stdExact).size.toDouble / stdExact.size >= 0.5)
  }

  test("ann query-side broadcast gate: large batch hint drops every broadcast, results unchanged") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    // query-proportional sides carry query_id (LUTs, probes, candidate
    // sets); constant-size sides (codebook, centroids — 128/16 rows at
    // any scale) legitimately broadcast forever
    def queryHints(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect {
        case h: ResolvedHint if h.child.output.exists(_.name == "query_id") => h
      }.size
    // the benched 10-query batch broadcasts its query-derived sides
    assert(queryHints(VectorOps.annPqBatch(spark, sfDir, 10L)) > 0)
    assert(queryHints(VectorOps.annIvfPqBatch(spark, sfDir, 10L)) > 0)
    // a forced-large batch (1e7 queries, GBs of LUTs) must not force
    // any query-proportional broadcast — those joins shuffle on their
    // keys instead and the plan survives unbounded query volume
    val bigPq = VectorOps.annPqBatch(spark, sfDir, 10_000_000L)
    val bigIvfPq = VectorOps.annIvfPqBatch(spark, sfDir, 10_000_000L)
    assert(queryHints(bigPq) === 0, "PQ large-batch plan still forces a query-side broadcast")
    assert(queryHints(bigIvfPq) === 0, "IVFPQ large-batch plan still forces a query-side broadcast")
    // same rows either way (the gate changes the JOIN STRATEGY only)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(rows(bigPq) === rows(VectorOps.annPq(spark, sfDir)))
    assert(rows(bigIvfPq) === rows(VectorOps.annIvfPq(spark, sfDir)))
  }

  test("multimodal decode stub: features derived from payload bytes") {
    val feats = Multimodal.mmDecodeStub(spark, sfDir).collect()
    assert(feats.length === 500)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    feats.take(20).foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_bytes") === text.getBytes("UTF-8").length.toLong)
      assert(r.getAs[Long]("checksum") === Hashing.polyHashString(text))
    }
  }

  test("sample mixture: per-source rates honored within hash tolerance, deterministic") {
    val rows = TextOps.sampleMixture(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySrc = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val totalPerSrc = graft.Tables.documents(spark, sfDir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totalPerSrc.foreach { case (src, n) =>
      val idx = src.stripPrefix("src").toInt
      val rate = if (idx <= 5) 1.0 else if (idx <= 10) 0.5 else 0.2
      val kept = bySrc.getOrElse(src, 0)
      if (rate == 1.0) assert(kept.toLong === n, s"$src full rate")
      else assert(math.abs(kept.toDouble / n - rate) < 0.25,
        s"$src kept $kept of $n at rate $rate")
    }
    // deterministic: re-run yields the identical row set
    val again = TextOps.sampleMixture(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === again.toSeq)
  }

  test("sample shuffle: total permutation, balanced shards, genuinely mixed order") {
    val out = TextOps.sampleShuffle(spark, sfDir).collect()
    val n = Tables.documents(spark, sfDir).count()
    // every document exactly once — it's a permutation, not a sample
    assert(out.length.toLong === n)
    assert(out.map(_.getLong(0)).distinct.length.toLong === n)
    // shards are balanced within 3x of even (hash-mod balance)
    val byShard = out.groupBy(_.getLong(2)).view.mapValues(_.length)
    assert(byShard.size === TextOps.ShuffleShards)
    assert(byShard.values.max <= 3 * (n / TextOps.ShuffleShards).toInt)
    // the order is actually shuffled: the first 20 positions are not
    // the first 20 ids (a key correlated with id would sort ~in id
    // order, which defeats the point of a training shuffle)
    val first20 = out.take(20).map(_.getLong(0)).toSet
    assert((first20 -- (0L until 20L).toSet).size >= 15,
      s"shuffle order correlates with doc_id: first20=$first20")
    // deterministic across runs
    val again = TextOps.sampleShuffle(spark, sfDir).collect().map(_.getLong(0)).toSeq
    assert(again === out.map(_.getLong(0)).toSeq)
  }

  test("sample split: deterministic, ~90/10, disjoint") {
    val df = TextOps.sampleSplit(spark, sfDir).collect()
    assert(df.length === 500)
    val trainFrac = df.count(_.getAs[String]("split") == "train").toDouble / df.length
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train fraction $trainFrac")
    // re-run must produce the identical assignment
    val again = TextOps.sampleSplit(spark, sfDir).collect()
    assert(df.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("dataset minhash aggregate: estimate close to exact jaccard") {
    val row = Dedup.datasetSimilarity(spark, sfDir).collect().head
    val est = row.getAs[Double]("est_jaccard")
    assert(row.getAs[Long]("n_even_docs") + row.getAs[Long]("n_odd_docs") === 500L)
    // exact shingle-set jaccard between the two halves
    val sets = Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.functions.exprs.wordShingles(col("text"), 3).as("shs"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getSeq[String](1).toSet))
    val even = sets.filter(_._1 % 2 == 0).flatMap(_._2).toSet
    val odd = sets.filter(_._1 % 2 == 1).flatMap(_._2).toSet
    val exact = even.intersect(odd).size.toDouble / even.union(odd).size
    assert(math.abs(est - exact) < 0.1, s"est $est vs exact $exact")
  }

  test("pipeline hot paths stay inside whole-stage codegen") {
    val df = TextOps.fingerprint(spark, sfDir)
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark WholeStageCodegen spans in the plan rendering
    assert(plan.contains("*(1)"), s"plan was:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("line dedup and dup spans plan keyed joins — no nested-loop, dup side broadcast by AQE") {
    for (df <- Seq(Dedup.dedupLines(spark, sfDir), TextOps.dupSpans(spark, sfDir))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"plan was:\n$plan")
      // the repeated-unit table is boilerplate-sized: AQE should turn the
      // join back into a broadcast (hash keys, no full-stream shuffle join)
      assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
        s"plan was:\n$plan")
    }
  }

  test("posting-list cap bounds boilerplate blow-up without losing rare-shingle pairs") {
    import spark.implicits._
    // 40 docs share a boilerplate paragraph (every boilerplate shingle
    // has df = 42 > cap = 10) but are pairwise NON-duplicates thanks to
    // unique filler; docs 100/101 are true near-dups via content the
    // cap never touches (df = 2).
    val boiler = "all rights reserved subscribe to our newsletter for updates today"
    // shared rare content is much longer than the boilerplate, so the
    // pair's Jaccard evidence survives even with every boilerplate
    // shingle dropped (the cap trades away only boilerplate-dominated
    // overlap — that is its contract)
    val shared = (0 until 60).map(j => s"shared$j").mkString(" ")
    val docs = (0 until 40).map { i =>
      val filler = (0 until 30).map(j => s"unique${i}word$j").mkString(" ")
      (i.toLong, s"$boiler $filler")
    } ++ Seq(
      (100L, s"$boiler $shared riverbank"),
      (101L, s"$boiler $shared rivershore"))
    val df = docs.toDF("doc_id", "text")
    val out = Dedup.ngramJaccardOf(df, postingDfCap = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out.contains((100L, 101L)), "rare-shingle near-dup pair must survive the cap")
    assert(out.forall { case (a, b) => a >= 100L && b >= 100L },
      s"boilerplate-only combinations must not explode into candidates: $out")
    // sanity at corpus scale: the default cap (1000) is above any df at
    // sf0.001, so capped output == the exact oracle-checked pair set
    val capped = Dedup.ngramJaccardOf(Tables.documents(spark, sfDir)).collect()
    val unCapped = Dedup.ngramJaccardOf(Tables.documents(spark, sfDir),
      postingDfCap = Int.MaxValue).collect()
    assert(capped.toSeq === unCapped.toSeq)
  }

  test("embedding dedup: radius-0 gear at production thresholds keeps exact recall") {
    // at cos >= 0.75 the adaptive probe radius drops to 0 (p_bit high
    // enough that 16 plain bands hit the recall target) — candidates
    // collapse from ~2.3 n^2 to ~0.06 n^2; output must still equal the
    // exact pair scan at that threshold
    val fast = VectorOps.embeddingPairsAt(spark, sfDir, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = VectorOps.embeddingPairsExact(spark, sfDir)
      .filter(col("cos_sim") >= 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fast === exact, s"radius-0 gear lost pairs: ${exact -- fast}")
  }

  test("embedding dedup radius cap: capped candidates are a subset, precision stays exact") {
    val t = VectorOps.WeakCosThreshold
    val full = VectorOps.embeddingPairsAt(spark, sfDir, t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = VectorOps.embeddingPairsAtCapped(spark, sfDir, t, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the cap only narrows candidate generation: every surviving pair
    // is still exact-verified (subset of the full radius-2 output, no
    // false positives), and the cap never ADDS pairs
    assert(capped.subsetOf(full),
      s"capped gear fabricated pairs: ${capped -- full}")
    // capping above the adaptive radius is a no-op
    val over = VectorOps.embeddingPairsAtCapped(spark, sfDir, t, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(over === full)
    // production gate's adaptive radius is already 0 — cap is a no-op
    val prodCap = VectorOps.embeddingPairsAtCapped(spark, sfDir, 0.8, 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val prod = VectorOps.embeddingPairsAt(spark, sfDir, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(prodCap === prod)
  }

  test("incremental dedup is strictly cross-boundary") {
    import spark.implicits._
    // near variant: contamination is batch×corpus only — two batch docs
    // that duplicate EACH OTHER (but nothing ingested) are both
    // admitted (within-batch near-dups are the full dedup chain's job,
    // not the admission gate's)
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "s1"),   // ingested (id%3==0)
      (3L, "one two three four five six seven eight nine", "s1"),    // ingested
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "s2"),   // batch: dup of ingested 0 → rejected
      (4L, "red orange yellow green blue indigo violet pink", "s2"), // batch: near-dups 7 → both admitted
      (7L, "red orange yellow green blue indigo violet mauve", "s3"),
      (5L, "totally fresh content nothing like anything else here", "s3")) // admitted
      .toDF("doc_id", "text", "source")
    docs.createOrReplaceTempView("ignore") // silence unused warnings path
    val tmpDir = "/root/repo/target/laketest/incdedup"
    val f = new java.io.File(tmpDir)
    if (f.exists()) { import scala.sys.process._; Seq("rm", "-rf", tmpDir).! }
    docs.write.parquet(s"$tmpDir/documents.parquet")
    val admitted = Dedup.incrementalNear(spark, tmpDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(admitted === Map("s2" -> 1L, "s3" -> 2L),
      s"got $admitted") // doc 1 rejected; 4,7 (mutual dups) and 5 admitted
    // exact variant: within-batch copies collapse to first occurrence
    val ex = Dedup.incrementalExact(spark, tmpDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!ex.map(_._1).contains(1L), "ingested content must be rejected")
    assert(ex.map(_._1).toSet === Set(4L, 5L, 7L))
  }

  test("C37 bloom admission is exactly the anti-join result, prefilter engaged") {
    // semantics: identical to the exact anti-join gate on real data
    val viaBloom = Dedup.incrementalBloom(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, sfDir)
    val seen = docs.filter(col("doc_id") % 3 === 0)
      .select(md5(col("text").cast("binary")).as("h")).distinct()
    val exact = docs.filter(col("doc_id") % 3 =!= 0)
      .withColumn("h", md5(col("text").cast("binary")))
      .join(seen, Seq("h"), "left_anti")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaBloom === exact)
    // the plan's gate is Spark's codegen'd bloom expression, not a UDF
    val plan = Dedup.incrementalBloom(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom prefilter missing from plan")
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }

  test("C38 chunk windows reassemble every document's token stream") {
    import graft.pipeline.TextOps
    val byDoc = TextOps.textChunk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .groupBy(_._1)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(byDoc.keySet === docs.keySet)
    byDoc.foreach { case (id, rows) =>
      val chunks = rows.sortBy(_._2).map(_._3)
      val rebuilt = chunks.dropRight(1).flatMap(
        _.split(' ').filter(_.nonEmpty).take(48)) ++
        chunks.last.split(' ').filter(_.nonEmpty)
      assert(rebuilt.toSeq == docs(id),
        s"doc $id: stride-48 windows failed to reassemble its tokens")
    }
  }

  test("multimodal decode is a REAL PNG codec round-trip") {
    import spark.implicits._
    val assets = Multimodal.imageAssets(spark, sfDir)
    // payloads are genuine PNG files (magic bytes), not repackaged text
    val sample = assets.select("doc_id", "payload")
      .as[(Long, Array[Byte])].take(5)
    val pngMagic = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    sample.foreach { case (id, bytes) =>
      assert(bytes.take(4).sameElements(pngMagic), s"doc $id payload is not PNG")
      // and the JDK codec decodes it to the synthesized dimensions
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth === 8 + (id % 9).toInt)
      assert(img.getHeight === 6 + (id % 5).toInt)
    }
    // decoded features equal the pixel arithmetic (PNG is lossless):
    // the whole encode→decode→checksum chain reproduces the formula
    val got = Multimodal.decodeImages(spark, assets)
      .filter(_.doc_id < 5).collect().sortBy(_.doc_id)
    got.foreach { f =>
      val w = 8 + (f.doc_id % 9).toInt; val h = 6 + (f.doc_id % 5).toInt
      var acc = 0L
      for (i <- 0L until (w * h).toLong)
        acc = (acc * 31 + Multimodal.pixel(f.doc_id, i)) % 1000000007L
      assert((f.width, f.height, f.px_checksum) === ((w.toLong, h.toLong, acc)),
        s"doc ${f.doc_id} decode mismatch")
    }
    // the thumbnail stage samples the decoded image, not the formula:
    // verify against independent nearest-neighbor arithmetic
    val thumbs = Multimodal.imagePipeline(spark, sfDir)
      .filter(_.doc_id < 5).collect().sortBy(_.doc_id)
    thumbs.foreach { t =>
      val w = 8 + (t.doc_id % 9).toInt; val h = 6 + (t.doc_id % 5).toInt
      var acc = 0L
      for (ty <- 0 until 3; tx <- 0 until 4) {
        val i = (ty * h / 3).toLong * w + (tx * w / 4).toLong
        acc = (acc * 31 + Multimodal.pixel(t.doc_id, i)) % 1000000007L
      }
      assert(t.thumb_checksum === acc, s"doc ${t.doc_id} thumbnail mismatch")
    }
  }

  test("C33/C45 hash-threshold prefilter: the rank window sorts survivors, not the corpus") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.FilterExec
    // the scale claim: every per-stratum rank window must sit either
    // ABOVE a hash-threshold filter (survivor branch — the sort sees
    // ~overshoot x kept rows, never the corpus) or inside the safety
    // fallback branch, which is gated by a semi-join against the
    // NOT-safe stratum set (empty on uniform hashes, so that window's
    // input is zero rows at runtime)
    def auditCorpusWindows(df: org.apache.spark.sql.DataFrame): Unit = {
      // sparkPlan, not executedPlan: AQE wraps the tree before execution
      val plan = df.queryExecution.sparkPlan
      val corpusWindows = plan.collect {
        case w: WindowExec if w.partitionSpec.nonEmpty => w
      }
      assert(corpusWindows.nonEmpty, s"no per-stratum windows found:\n$plan")
      corpusWindows.foreach { w =>
        // the optimizer either inlines h = pmod(...) into a pushed
        // filter (stratified: constant threshold) or folds h < thr
        // into the broadcast join's residual condition (temperature:
        // per-stratum threshold) — both run before the window shuffle
        val hasThreshold = w.collectFirst {
          case f: FilterExec
            if f.condition.sql.contains("pmod") && f.condition.sql.contains("<") => f
          case j: org.apache.spark.sql.execution.joins.BaseJoinExec
            if j.condition.exists(_.sql.contains("<")) => j
        }.nonEmpty
        val isFallback = w.collectFirst {
          case f: FilterExec
            if f.condition.sql.contains("NOT") && f.condition.sql.contains("safe") => f
        }.nonEmpty
        assert(hasThreshold || isFallback,
          s"corpus window neither prefiltered nor fallback-gated:\n$w")
      }
    }
    auditCorpusWindows(TextOps.sampleStratified(spark, sfDir))
    auditCorpusWindows(TextOps.sampleTemperature(spark, sfDir))
    // output identity is pinned by the DuckDB oracle (sf0.01) plus the
    // apportionment recompute test above (sf0.001)
  }

  test("C50 video frame-sampling: strided frames only, byte sums exact") {
    val out = Multimodal.mmVideoFrames(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val ids = Tables.documents(spark, sfDir).select("doc_id").collect().map(_.getLong(0))
    // exactly frames 0, 6, 12, 18 per doc — the unsampled 20 frames'
    // bytes are never surfaced
    assert(out.keys.map(_._2).toSet === Set(0L, 6L, 12L, 18L))
    assert(out.size === ids.length * 4)
    // independent recompute of one doc's sampled sums from the
    // generator arithmetic
    val id = ids.min
    for (f <- Seq(0L, 6L, 12L, 18L)) {
      val fb = 16 * 12 * 3
      val expect = (f * fb until (f + 1) * fb)
        .map(i => (id * 31L + i * 2654435761L) % 256L).sum
      assert(out((id, f)) === (fb.toLong, expect), s"frame $f")
    }
  }

  test("C51 threshold sweep: monotone keep curve, counts recomputed independently") {
    val curve = TextOps.thresholdSweep(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    assert(curve.length === TextOps.SweepSteps + 1)
    // keep counts are non-increasing in the threshold
    curve.sliding(2).foreach { case Array((t1, k1, _), (t2, k2, _)) =>
      assert(k1 >= k2, s"curve not monotone at $t1 -> $t2") }
    // t=0 keeps everything
    val scores = TextOps.quality(spark, sfDir).collect()
      .map(_.getAs[Double]("quality_score"))
    assert(curve.head._2 === scores.length)
    // a mid-grid point recomputed by hand
    val mid = curve(TextOps.SweepSteps / 2)
    assert(mid._2 === scores.count(_ >= mid._1), s"mid threshold ${mid._1}")
    assert(math.abs(mid._3 - mid._2.toDouble / scores.length) < 1e-6)
    // the sweep actually discriminates on this corpus (not all-or-nothing)
    assert(curve.map(_._2).distinct.length > 2)
  }

  test("C33 safety fallback: a pathological stratum still ranks exactly") {
    import spark.implicits._
    // plant a corpus where one stratum DEFEATS the prefilter: every
    // doc of lang "zz" has h = (id*2654435761) % 1000000007 >= thr
    // (375000003), so its survivor count is 0 < k and only the
    // NOT-safe admission path can produce the right answer. The "aa"
    // stratum stays uniform (safe path). This is the only test that
    // exercises the fallback disjunct — on uniform hashes it is empty.
    def h(id: Long) = (id * 2654435761L) % 1000000007L
    val thr = 375000003L
    val bad = Iterator.from(0).map(_.toLong).filter(id => h(id) >= thr).take(6).toSeq
    val good = Iterator.from(0).map(_.toLong)
      .filter(id => !bad.contains(id)).take(20).toSeq
    val rows = bad.map(id => (id, s"doc $id", "zz", "s0", 6L)) ++
      good.map(id => (id, s"doc $id", "aa", "s0", 6L))
    val tmp = "/root/repo/target/laketest/sample-fallback"
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4).write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val got = TextOps.sampleStratified(spark, tmp).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    // naive reference: full per-stratum rank by (h, id), keep ceil(n/4)
    def expect(ids: Seq[Long], lang: String) = {
      val k = (ids.length + 3) / 4
      ids.sortBy(id => (h(id), id)).take(k).zipWithIndex
        .map { case (id, i) => (lang, id, (i + 1).toLong) }
    }
    val want = (expect(bad, "zz") ++ expect(good, "aa")).toSet
    assert(got.toSet === want, s"got ${got.toSeq.sorted}")
    // and the planted stratum really did defeat the threshold
    assert(bad.forall(id => h(id) >= thr))
  }

  test("C33 prefilter exactness holds across randomized corpus shapes") {
    import spark.implicits._
    // four seeded corpora with very different stratum skews (incl. a
    // 1-doc stratum and a dominant one) — each must equal the naive
    // full-rank reference exactly
    def h(id: Long) = (id * 2654435761L) % 1000000007L
    val rnd = new scala.util.Random(77)
    for (case_ <- 0 until 4) {
      val langs = case_ match {
        case 0 => Seq.fill(120)("xx") ++ Seq("yy") // dominant + singleton
        case 1 => (0 until 90).map(i => s"l${i % 9}") // even 9-way
        case 2 => (0 until 60).map(_ => if (rnd.nextInt(10) == 0) "rare" else "big")
        case _ => (0 until 40).map(i => s"l${rnd.nextInt(3)}")
      }
      val ids = rnd.shuffle((0 until 5000).map(_.toLong).toList).take(langs.size)
      val rows = ids.zip(langs).map { case (id, l) => (id, s"d$id", l, "s", 2L) }
      val tmp = s"/root/repo/target/laketest/sample-prop-$case_"
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(3).write.mode("overwrite").parquet(tmp + "/documents.parquet")
      val got = TextOps.sampleStratified(spark, tmp).collect()
        .map(r => (r.getString(1), r.getLong(0), r.getLong(2))).toSet
      val want = rows.groupBy(_._3).flatMap { case (l, rs) =>
        val k = (rs.length + 3) / 4
        rs.map(_._1).sortBy(id => (h(id), id)).take(k).zipWithIndex
          .map { case (id, i) => (l, id, (i + 1).toLong) }
      }.toSet
      assert(got === want, s"case $case_ mismatch")
    }
  }

  test("C48 vocab coverage: OOV fraction recomputed from an independent count") {
    val out = TextOps.vocabCoverage(spark, sfDir).collect()
    assert(out.nonEmpty)
    // independent recomputation: token counts collected and ranked here
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val vocab = toks.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(TextOps.VocabV).map(_._1).toSet
    val byDoc = toks.groupBy(_._1)
    out.foreach { r =>
      val docToks = byDoc(r.getLong(0)).map(_._2)
      val oov = docToks.count(t => !vocab.contains(t))
      assert(r.getAs[Long]("n_toks") === docToks.length)
      assert(r.getAs[Long]("n_oov") === oov, s"doc ${r.getLong(0)}")
    }
    // with a 16-term vocab over the 31-term corpus, OOV genuinely fires
    assert(out.exists(_.getAs[Long]("n_oov") > 0))
    assert(out.exists(r => r.getAs[Long]("n_oov") < r.getAs[Long]("n_toks")))
  }

  test("C49 boilerplate: per-source templates stripped, cross-source text kept") {
    import spark.implicits._
    // planted corpus: siteA (12 docs) shares a header+footer template;
    // siteB (12 docs) shares a different footer; siteC is too small
    // (3 docs) to vote a template even though its docs are identical
    val rows =
      (0 until 12).map(i => (i.toLong, s"HEADER NAV\nbody text $i\nCopyright A", "en", "siteA")) ++
      (12 until 24).map(i => (i.toLong, s"article $i\nAll rights B", "en", "siteB")) ++
      (24 until 27).map(i => (i.toLong, "tiny\nsame", "en", "siteC"))
    val docs = rows.toDF("doc_id", "text", "lang", "source")
    val out = TextOps.boilerplateOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // siteA: header and footer stripped, body kept
    assert(out(0L).getAs[String]("clean_text") === "body text 0")
    assert(out(0L).getAs[Long]("n_removed") === 2)
    // siteB: only its own footer stripped — siteA's template does not
    // leak across sources
    assert(out(13L).getAs[String]("clean_text") === "article 13")
    assert(out(13L).getAs[Long]("n_removed") === 1)
    // siteC: below the min-docs gate, nothing stripped
    assert(out(24L).getAs[Long]("n_removed") === 0)
    assert(out(24L).getAs[String]("clean_text") === "tiny\nsame")
  }

  test("C39 NB quality: llr decomposes into learned per-term weights + prior") {
    val out = TextOps.nbQuality(spark, sfDir).collect()
    assert(out.forall(r => r.getAs[Boolean]("keep") === (r.getAs[Double]("llr") > 0.0)))
    // recompute one doc's score from independently derived counts
    val docs = Tables.documents(spark, sfDir)
      .withColumn("pos", col("source").isin("src0", "src1", "src2", "src3"))
    val toks = docs.select(col("doc_id"), col("pos"),
      explode(TextOps.tokens(col("text"))).as("term"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2)))
    val byTerm = toks.groupBy(_._3)
    val totP = toks.count(_._2).toDouble
    val totN = toks.count(!_._2).toDouble
    val v = byTerm.size.toDouble
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w = byTerm.map { case (t, rs) =>
      t -> (q6(math.log((rs.count(_._2) + 1.0) / (totP + v))) -
            q6(math.log((rs.count(!_._2) + 1.0) / (totN + v))))
    }
    val nd = docs.select("doc_id", "pos").collect().map(r => r.getBoolean(1))
    // add-1 smoothed, matching the production prior (guards the
    // all-positive / all-negative corpus)
    val prior = q6(math.log((nd.count(identity) + 1.0) / (nd.count(!_) + 1.0)))
    val someDoc = out.head.getLong(0)
    val expected = q6(toks.filter(_._1 == someDoc).map(t => w(t._3)).sum + prior)
    val got = out.find(_.getLong(0) == someDoc).get.getAs[Double]("llr")
    assert(math.abs(got - expected) < 2e-6, s"llr $got vs recomputed $expected")
    // the classifier must separate the classes it trained on: curated
    // docs score higher on average than crawl docs
    val posIds = docs.filter(col("pos")).select("doc_id").collect().map(_.getLong(0)).toSet
    val (posS, negS) = out.partition(r => posIds.contains(r.getLong(0)))
    val meanPos = posS.map(_.getAs[Double]("llr")).sum / posS.length
    val meanNeg = negS.map(_.getAs[Double]("llr")).sum / negS.length
    assert(meanPos > meanNeg, s"no separation: pos mean $meanPos vs neg $meanNeg")
  }

  test("C79 LR quality: GD training separates the planted labels and is run-stable") {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("pos", col("source").isin("src0", "src1", "src2", "src3"))
    val posIds = docs.filter(col("pos")).select("doc_id").collect().map(_.getLong(0)).toSet
    val out = TextOps.lrQuality(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Boolean]("keep") === (r.getAs[Long]("score_m") > 0L)))
    // the trained model must actually discriminate: train-set accuracy
    // well above the majority-class baseline
    val correct = out.count(r => posIds.contains(r.getLong(0)) == r.getAs[Boolean]("keep"))
    val acc = correct.toDouble / out.length
    val majority = math.max(posIds.size, out.length - posIds.size).toDouble / out.length
    assert(acc >= math.max(0.8, majority),
      s"train accuracy $acc below max(0.8, majority $majority)")
    // deterministic: the integer-grid arithmetic must reproduce scores
    // exactly across runs (this is what lets the GD loop oracle in SQL)
    val again = TextOps.lrQuality(spark, sfDir).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq,
      "training must be bit-stable across runs")
  }

  test("C43 importance resampling: selection is exactly Gumbel-top-k without replacement") {
    val k = TextOps.ImportanceK
    val sel = TextOps.sampleImportance(spark, sfDir).collect()
    assert(sel.length == math.min(k, Tables.documents(spark, sfDir).count()).toInt)
    assert(sel.map(_.getLong(0)).distinct.length === sel.length, "sampled WITH replacement")
    // the chosen set must be the global top-k of the full keyed population
    val full = TextOps.sampleImportance(spark, sfDir) // same plan, before limit:
    val allKeys = {
      // recompute the full population by removing the limit: score+key for every doc
      val docs = Tables.documents(spark, sfDir)
      val toks = docs.select(col("doc_id"), col("lang"),
        explode(TextOps.tokens(col("text"))).as("term"))
      val tc = toks.groupBy(col("term")).agg(
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
      val tot = tc.agg(sum(col("ct")).cast("double").as("tott"),
        sum(col("cr")).cast("double").as("totr"),
        count(lit(1)).cast("double").as("v"))
      val w = tc.crossJoin(broadcast(tot)).select(col("term"),
        (round(log((col("ct").cast("double") + lit(1.0)) / (col("tott") + col("v"))), 6) -
         round(log((col("cr").cast("double") + lit(1.0)) / (col("totr") + col("v"))), 6)).as("w"))
      val u = (pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L) + lit(12345L),
        lit(1000000007L)).cast("double") + lit(1.0)) / lit(1000000008.0)
      toks.join(w, "term").groupBy(col("doc_id"))
        .agg(round(sum(col("w")), 6).as("weight"))
        .withColumn("gkey", round(col("weight") - log(-log(u)), 6))
        .collect().map(r => (r.getAs[Double]("gkey"), r.getLong(0)))
    }
    val expTop = allKeys.sortBy { case (g, id) => (-g, id) }.take(sel.length)
      .map(_._2).toSet
    assert(sel.map(_.getLong(0)).toSet === expTop)
    // plan shape: limit must be TakeOrderedAndProject, not a global sort
    val plan = full.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k should avoid a full sort:\n$plan")
  }

  test("C45 temperature sampling: largest-remainder quotas, lowest-hash picks, upsampled tail") {
    val sel = TextOps.sampleTemperature(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byLang = Tables.documents(spark, sfDir).select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).groupBy(_._2)
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // recompute the apportionment
    val n = byLang.view.mapValues(_.length.toLong).toMap
    val nn = n.values.sum.toDouble
    val w = n.view.mapValues(c => q6(math.pow(c / nn, 0.3))).toMap
    // 6-dp re-quantized like production: sum order must not matter
    val sw = q6(w.values.sum)
    val k0 = n.keys.map(l => l -> math.floor(TextOps.TempK * w(l) / sw).toLong).toMap
    val rem = n.keys.map(l => l -> (TextOps.TempK * w(l) / sw - k0(l))).toMap
    val leftover = TextOps.TempK - k0.values.sum
    val extras = n.keys.toSeq.sortBy(l => (-rem(l), l)).take(leftover.toInt).toSet
    val quota = n.keys.map(l =>
      l -> math.min(n(l), k0(l) + (if (extras(l)) 1L else 0L))).toMap
    val gotPerLang = sel.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(gotPerLang === quota.filter(_._2 > 0))
    // per lang the selected ids must be exactly the quota lowest-hash docs
    def h(id: Long) = ((id % 1000000007L) * 2654435761L + 12345L) % 1000000007L
    for ((l, docs) <- byLang) {
      val expIds = docs.map(_._1).sortBy(id => (h(id), id)).take(quota(l).toInt).toSet
      assert(sel.filter(_._2 == l).map(_._1).toSet === expIds, s"lang $l picks")
    }
    // the temperature property: the smallest language is upsampled
    // relative to proportional allocation, the largest downsampled
    val smallest = n.minBy(_._2)._1
    val largest = n.maxBy(_._2)._1
    assert(quota(smallest).toDouble / TextOps.TempK >= n(smallest) / nn,
      "low-resource language must be upsampled")
    assert(quota(largest).toDouble / TextOps.TempK <= n(largest) / nn + 1e-9,
      "high-resource language must not be upsampled")
  }

  test("C46 bigram LM: score decomposes into the interpolated per-bigram weights") {
    val out = TextOps.bigramLp(spark, sfDir).collect()
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docToks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // docs with <2 tokens have no bigram and must be absent
    val expDocs = docToks.filter(_._2.length >= 2).keySet
    assert(out.map(_.getLong(0)).toSet === expDocs)
    // recompute one doc's score from independently derived counts
    val uni = docToks.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nn = uni.values.sum.toDouble
    val v = uni.size.toDouble
    val allBigrams = docToks.values.toSeq.flatMap(ts => ts.zip(ts.tail))
    val big = allBigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val someDoc = expDocs.max
    val ts = docToks(someDoc)
    val lps = ts.zip(ts.tail).map { case (w1, w2) =>
      q6(math.log(0.7 * (big((w1, w2)) + 1.0) / (uni(w1) + v) +
                  0.3 * (uni(w2) + 1.0) / (nn + v)))
    }
    val row = out.find(_.getLong(0) == someDoc).get
    assert(row.getAs[Long]("n_bigrams") === ts.length - 1L)
    val expected = q6(lps.sum)
    assert(math.abs(row.getAs[Double]("bigram_lp") - expected) < 2e-6,
      s"bigram_lp ${row.getAs[Double]("bigram_lp")} vs recomputed $expected")
  }

  test("C44 corpus profile: the ALL rollup row is the exact column-wise total") {
    val rows = TextOps.corpusProfile(spark, sfDir).collect()
    val all = rows.find(_.getString(0) == "ALL").get
    val per = rows.filter(_.getString(0) != "ALL")
    assert(per.nonEmpty)
    assert(all.getAs[Long]("n_docs") === per.map(_.getAs[Long]("n_docs")).sum)
    assert(all.getAs[Long]("total_tokens") === per.map(_.getAs[Long]("total_tokens")).sum)
    assert(all.getAs[Long]("total_chars") === per.map(_.getAs[Long]("total_chars")).sum)
    assert(all.getAs[Long]("n_langs") >= per.map(_.getAs[Long]("n_langs")).max)
    val expAvg = all.getAs[Long]("total_chars").toDouble / all.getAs[Long]("n_docs")
    assert(all.getAs[Double]("avg_chars") === expAvg)
  }
  test("C47 normalized dedup: canonical is the group min over normalized text") {
    val out = Dedup.normalized(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def norm(t: String) =
      t.replaceAll("\\s+", " ").toLowerCase(java.util.Locale.ROOT).trim
    val canon = docs.groupBy(d => norm(d._2)).view.mapValues(_.map(_._1).min).toMap
    val expect = docs.map { case (id, t) =>
      (id, canon(norm(t)), id == canon(norm(t))) }.sortBy(_._1)
    assert(out.toSeq === expect.toSeq)
    // normalization can only coarsen the raw-exact grouping
    assert(canon.size <= docs.map(_._2).distinct.length)
  }

  /** From-scratch reference BPE trainer (naive full recount every
    * iteration, Map[Seq[String]] vocab — no shared code or data
    * structures with [[TextOps.bpeMergeLoop]]'s incremental
    * posting-index design). Stops at pair-pool exhaustion like the op.
    */
  private def refBpeTrain(wf: Map[String, Long], kMax: Int): Seq[(Long, String, String, Long)] = {
    var vocab: Map[Seq[String], Long] = wf.map { case (w, c) => (w.map(_.toString): Seq[String]) -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var k = 1
    var done = false
    while (k <= kMax && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.minBy { case ((a, b), c) => (-c, s"$a $b") }
        out += ((k.toLong, l, r, n))
        vocab = vocab.toSeq.map { case (syms, c) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              merged += (l + r); i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.toSeq: Seq[String]) -> c
        }.groupBy(_._1).map { case (s2, m) => s2 -> m.map(_._2).sum } // merged spellings can collide
        k += 1
      }
    }
    out.toSeq
  }

  test("C68 BPE training: merge table equals an independent pure-Scala trainer, " +
    "runs to pair-pool exhaustion under the k=256 budget") {
    def toks(t: String) =
      t.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val wf = Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(r => toks(r.getString(0)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = refBpeTrain(wf, TextOps.BpeMerges)
    val got = TextOps.bpeTrain(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === expect)
    // the tiny test vocabulary exhausts well under the 256 budget — the
    // entry exercises early-stop, and every emitted merge is real
    assert(expect.size > 32 && expect.size < TextOps.BpeMerges)
    // merges strictly grow the learned vocabulary
    assert(expect.map(m => m._2 + m._3).distinct.size === expect.size)
    // after exhaustion every vocab word is a single symbol: re-running
    // with a larger budget changes nothing
    assert(refBpeTrain(wf, TextOps.BpeMerges * 2) === expect)
  }

  test("C77 unigram-LM tokenizer: EM monotone, Viterbi optimal vs brute force, " +
    "invariants hold, fertility comparable to BPE") {
    import graft.pipeline.UnigramLm
    val docs = Tables.documents(spark, sfDir)
    val (vocab, llTrace) = UnigramLm.trainOf(spark, docs)
    // EM contract: corpus log-likelihood never decreases WITHIN a
    // round (pruning between rounds may drop it — that is the trade
    // pruning makes; each post-prune EM run must still be monotone)
    val perRound = llTrace.grouped(UnigramLm.EmItersPerRound).toSeq
    perRound.foreach { r =>
      r.sliding(2).foreach { case Seq(a, b) =>
        assert(b >= a - 1e-9, s"EM decreased the likelihood: $a -> $b (trace $llTrace)")
      case _ => () }
    }
    // hard invariants (the check twin's contract, re-asserted here)
    val chk = UnigramLm.unigramCheck(spark, sfDir).collect().head
    (0 until 4).foreach(i => assert(chk.getLong(i) === 0L, s"violation col $i: $chk"))
    // Viterbi optimality: brute-force enumerate ALL segmentations of
    // sample words (independent recursion, no shared code) and assert
    // the kernel's piece count achieves the max probability
    val v = new UnigramLm.Vocab(vocab.map(_._1), vocab.map(_._2))
    val lpMap = vocab.toMap
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(UnigramLm.MaxPieceLen, w.length)).flatMap { k =>
        val h = w.substring(0, k)
        if (!lpMap.contains(h)) Seq.empty
        else allSegs(w.substring(k)).map(h +: _)
      }
    val words = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .distinct().limit(60).collect().map(_.getString(0))
    words.foreach { w =>
      val segs = allSegs(w)
      assert(segs.nonEmpty, s"no segmentation for corpus word $w")
      val bestLp = segs.map(_.map(lpMap).sum).max
      val got = UnigramLm.viterbi(w, v)
      assert(got.mkString("") === w)
      assert(math.abs(got.map(lpMap).sum - bestLp) < 1e-9,
        s"viterbi suboptimal on $w: ${got.toSeq} vs best $bestLp")
    }
    // determinism: training twice gives byte-equal vocabularies
    val (vocab2, _) = UnigramLm.trainOf(spark, docs)
    assert(vocab2.toSeq === vocab.toSeq)
    // fertility vs C68 BPE on the same corpus (the C75 comparison):
    // both tokenizers over the same words — unigram's ML segmentation
    // should never be drastically WORSE than BPE's greedy merges
    val ug = UnigramLm.unigramEncode(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("fertility")).toMap
    val bpe = TextOps.bpeEncode(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("fertility")).toMap
    assert(ug.keySet === bpe.keySet)
    val ugMean = ug.values.sum / ug.size
    val bpeMean = bpe.values.sum / bpe.size
    info(f"fertility: unigram=$ugMean%.4f bpe=$bpeMean%.4f")
    assert(ugMean <= bpeMean * 1.25 + 1e-9,
      s"unigram fertility $ugMean should be comparable to BPE's $bpeMean")
  }

  test("C63/C68 randomized corpora: span removal and BPE match pure-Scala references exactly") {
    import spark.implicits._
    def toks(t: String) =
      t.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val rnd = new scala.util.Random(0xC63C68)
    for (trial <- 1 to 5) {
      // random corpus over a tiny alphabet (forces shared grams) with
      // explicit copy-paste: some docs embed a shared chunk verbatim
      // words long enough that 8 BPE merges never exhaust the pair pool
      val vocabSize = 6 + rnd.nextInt(5)
      val words = (0 until vocabSize).map { _ =>
        (0 until 4 + rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.distinct
      def randDoc(n: Int) = (0 until n).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
      val chunk = randDoc(25)
      val docs = (0L until 30L).map { id =>
        val body = randDoc(5 + rnd.nextInt(60))
        val text = if (id % 4 == 0) s"$body $chunk" else body
        (id, text)
      }
      val df = docs.toDF("doc_id", "text")

      // ---- span removal vs reference ----
      val gotSpan = Dedup.spanRemovalOf(df).collect()
        .map(r => r.getLong(0) -> (r.getAs[Long]("n_removed"), r.getAs[String]("clean_md5"))).toMap
      val allGrams = scala.collection.mutable.Map.empty[Seq[String], Int]
      for ((_, t) <- docs; g <- toks(t).sliding(Dedup.SpanN) if g.length == Dedup.SpanN)
        allGrams(g.toSeq) = allGrams.getOrElse(g.toSeq, 0) + 1
      for ((id, t) <- docs) {
        val ws = toks(t)
        val starts = (0 to ws.length - Dedup.SpanN)
          .filter(i => allGrams(ws.slice(i, i + Dedup.SpanN).toSeq) >= 2)
        val covered = starts.flatMap(s => s until s + Dedup.SpanN).toSet
        val kept = ws.zipWithIndex.collect { case (w, i) if !covered.contains(i) => w }
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(kept.mkString(" ").getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(gotSpan(id) === ((ws.length - kept.length).toLong, md),
          s"trial $trial doc $id span-removal diverged")
      }

      // ---- BPE training vs reference (driver-local loop, to
      // exhaustion — random tiny-alphabet corpora exhaust under 256,
      // so early-stop parity is exercised every trial) ----
      val gotBpe = TextOps.bpeTrainOf(spark, df).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val wfRef = docs.flatMap(d => toks(d._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expBpe = refBpeTrain(wfRef, TextOps.BpeMerges)
      assert(gotBpe === expBpe, s"trial $trial BPE merge table diverged")
      // the distributed k-jobs fallback is merge-for-merge identical
      // (budget cut low to keep the trial cheap — prefix equality)
      if (trial == 1) {
        val distributed = TextOps.bpeTrainDistributed(spark, df, 6).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
        assert(distributed === expBpe.take(6), "distributed path diverged from driver-local")
      }

      // ---- decontamination vs reference (bench = doc_id % 10 == 0) ----
      val benchGrams = docs.collect { case (id, t) if id % 10 == 0 => t }
        .flatMap(t => toks(t).sliding(Dedup.DecontamN).filter(_.length == Dedup.DecontamN))
        .map(_.toSeq).toSet
      val gotDecon = Dedup.decontaminateOf(df).collect()
        .map(r => r.getLong(0) -> (r.getAs[Long]("n_removed"), r.getAs[String]("clean_md5"))).toMap
      val expDecon = docs.flatMap { case (id, t) =>
        if (id % 10 == 0) None
        else {
          val ws = toks(t)
          val starts = (0 to ws.length - Dedup.DecontamN)
            .filter(i => benchGrams.contains(ws.slice(i, i + Dedup.DecontamN).toSeq))
          if (starts.isEmpty) None
          else {
            val covered = starts.flatMap(s => s until s + Dedup.DecontamN).toSet
            val kept = ws.zipWithIndex.collect { case (w, i) if !covered.contains(i) => w }
            val md = java.security.MessageDigest.getInstance("MD5")
              .digest(kept.mkString(" ").getBytes("UTF-8")).map("%02x".format(_)).mkString
            Some(id -> ((ws.length - kept.length).toLong, md))
          }
        }
      }.toMap
      assert(gotDecon === expDecon, s"trial $trial decontamination diverged")

      // ---- source-overlap matrix vs set arithmetic (source = id % 3) ----
      val withSrc = docs.map { case (id, t) => (id, s"s${id % 3}", t) }
        .toDF("doc_id", "source", "text")
      val gotOv = Dedup.sourceOverlapOf(withSrc).collect()
        .map(r => ((r.getString(0), r.getString(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
      val srcGrams = docs.groupBy { case (id, _) => s"s${id % 3}" }.view
        .mapValues(_.flatMap { case (_, t) =>
          val ws = toks(t)
          if (ws.length < 5) Nil else ws.sliding(5).map(_.mkString(" ")).toSeq
        }.toSet).toMap
      for (a <- srcGrams.keys; b <- srcGrams.keys if a < b) {
        val shared = (srcGrams(a) & srcGrams(b)).size.toLong
        if (shared == 0) assert(!gotOv.contains((a, b)))
        else {
          val (na, nb) = (srcGrams(a).size.toLong, srcGrams(b).size.toLong)
          val j = BigDecimal(shared.toDouble / (na + nb - shared).toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(gotOv((a, b)) === ((shared, na, nb, j)),
            s"trial $trial overlap($a,$b) diverged")
        }
      }
    }
  }

  test("C72 quality AUC: rank-sum equals the brute-force pair probability") {
    val row = TextOps.qualityAuc(spark, sfDir).collect().head
    val scored = TextOps.nbQuality(spark, sfDir)
      .join(Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source").isin("src0", "src1", "src2", "src3").as("pos")),
        "doc_id")
      .select("llr", "pos").collect()
      .map(r => (r.getDouble(0), r.getBoolean(1)))
    val posScores = scored.collect { case (s, true) => s }
    val negScores = scored.collect { case (s, false) => s }
    assert(row.getAs[Long]("n_pos") === posScores.length.toLong)
    assert(row.getAs[Long]("n_neg") === negScores.length.toLong)
    // AUC ≡ P(s⁺ > s⁻) + ½·P(s⁺ = s⁻) — O(n²) brute force, different
    // algorithm from the rank-sum identity the operator uses
    val wins = (for (p <- posScores; n <- negScores)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val bf = wins / (posScores.length.toDouble * negScores.length.toDouble)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("auc") === r6(bf))
    // the classifier genuinely separates its classes on this corpus
    assert(row.getAs[Double]("auc") > 0.5)
  }

  test("C71 decontaminate: cleaned text shares NO 13-gram with the benchmark") {
    def toks(t: String) =
      t.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    def grams(ws: Seq[String], n: Int): Set[Seq[String]] =
      if (ws.length < n) Set.empty else ws.sliding(n).map(_.toSeq).toSet
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), toks(r.getString(1)))).toMap
    val bench = docs.collect { case (id, ws) if id % 10 == 0 => ws }
      .flatMap(grams(_, Dedup.DecontamN)).toSet
    val out = Dedup.decontaminate(spark, sfDir).collect()
    assert(out.nonEmpty, "the synthetic corpus plants real contamination")
    for (r <- out) {
      val id = r.getLong(0)
      // independently recompute the excision and pin the md5
      val ws = docs(id)
      val starts = (0 to ws.length - Dedup.DecontamN)
        .filter(i => bench.contains(ws.slice(i, i + Dedup.DecontamN)))
      assert(starts.nonEmpty && r.getAs[Long]("n_collisions") === starts.length.toLong)
      val covered = starts.flatMap(s => s until s + Dedup.DecontamN).toSet
      val kept = ws.zipWithIndex.collect { case (w, i) if !covered.contains(i) => w }
      assert(r.getAs[Long]("n_removed") === (ws.length - kept.length).toLong)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(kept.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("clean_md5") === md)
      // the decontamination guarantee itself
      assert(grams(kept, Dedup.DecontamN).intersect(bench).isEmpty)
    }
    // clean train docs are NOT rewritten (output is collision-proportional)
    val affected = out.map(_.getLong(0)).toSet
    assert(docs.keys.filter(id => id % 10 != 0).count(!affected.contains(_)) > 0)
  }

  test("C70 source overlap: matrix exact against a set-arithmetic recompute") {
    def toks(t: String) =
      t.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    def grams(t: String): Set[String] = {
      val w = toks(t)
      if (w.length < 5) Set.empty
      else w.sliding(5).map(_.mkString(" ")).toSet
    }
    val bySrc = Tables.documents(spark, sfDir).select("source", "text").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.flatMap(r => grams(r.getString(1))).toSet).toMap
    val expect = (for {
      a <- bySrc.keys; b <- bySrc.keys if a < b
      shared = (bySrc(a) & bySrc(b)).size.toLong if shared > 0
    } yield {
      val (na, nb) = (bySrc(a).size.toLong, bySrc(b).size.toLong)
      val j = BigDecimal(shared.toDouble / (na + nb - shared).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, shared, na, nb, j)
    }).toSeq.sortBy(p => (p._1, p._2))
    val got = Dedup.sourceOverlap(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got === expect)
    assert(got.forall(p => p._6 >= 0.0 && p._6 <= 1.0))
  }

  test("C70 sketch dial: per-source MinHash matrix bounds error vs exact, " +
    "complete matrix, planted-overlap sensitivity") {
    import spark.implicits._
    // --- real corpus: every estimated pair within 5σ of the exact J ---
    val exact = Dedup.sourceOverlap(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    val est = Dedup.sourceOverlapSketch(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
    val nSources = Tables.documents(spark, sfDir)
      .select("source").distinct().count().toInt
    assert(est.length === nSources * (nSources - 1) / 2, "matrix must be complete")
    for ((k, e) <- est)
      assert(math.abs(e - exact.getOrElse(k, 0.0)) <= 0.16,
        s"pair $k estimate $e vs exact ${exact.getOrElse(k, 0.0)} outside 5σ")
    // --- planted corpus: heavy / light / zero overlap must rank ---
    // shingle overlap = copied SEQUENCES, not shared word pools —
    // sB re-scrapes all of sA, sC re-scrapes half of sA, sD is fresh
    val rnd = new scala.util.Random(0xC70)
    val words = (0 until 400).map(i => s"w${i}q${rnd.nextInt(1000)}")
    def doc(n: Int) = (0 until n).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    val aDocs = (0 until 40).map(_ => doc(80))
    val planted = (
      aDocs.zipWithIndex.map { case (t, i) => (i.toLong, t, "sA") } ++
      aDocs.zipWithIndex.map { case (t, i) => (100L + i, t, "sB") } ++
      (aDocs.take(20) ++ (0 until 20).map(_ => doc(80))).zipWithIndex
        .map { case (t, i) => (200L + i, t, "sC") } ++
      (0 until 40).map(i => (300L + i, doc(80), "sD"))
    ).toDF("doc_id", "text", "source")
    val m = Dedup.sourceOverlapSketchOf(spark, planted).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m.size === 6)
    assert(m(("sA", "sB")) > 0.8, s"full re-scrape must read ~1: ${m(("sA", "sB"))}")
    assert(m(("sC", "sD")) < 0.16, s"fresh sources must read ~0: ${m(("sC", "sD"))}")
    assert(m(("sA", "sB")) > m(("sA", "sC")) && m(("sA", "sC")) > m(("sA", "sD")),
      "overlap ordering (full > half > none) must survive the sketch")
  }

  test("planted skew soak: PostingDfCap bounds the inverted-index fan-out and " +
    "BucketCap bounds the LSH bucket expansion, planted near-dups still recovered") {
    import spark.implicits._
    // ---- C4 mega-posting corpus: one boilerplate sentence in EVERY
    // doc (df = 2500 ≫ PostingDfCap) — uncapped, the self-join would
    // emit C(2500,2) ≈ 3.1M candidate rows from those shingles alone ----
    val boiler = "subscribe to our newsletter for daily updates"
    val rnd = new scala.util.Random(0x5EAC)
    def body(n: Int) = (0 until n).map(_ => s"tok${rnd.nextInt(100000)}x").mkString(" ")
    val regular = (0L until 2500L).map(id => (id, s"${body(20)} $boiler"))
    // planted near-dups: a 40-word shared body + 2-word unique tail +
    // boilerplate — their candidate evidence is the SUB-CAP body
    // shingles, their full-set Jaccard ≈ 0.95
    val planted = (0 until 8).flatMap { k =>
      val shared = body(40)
      Seq((10000L + 2 * k, s"$shared alpha$k beta$k $boiler"),
          (10001L + 2 * k, s"$shared gamma$k delta$k $boiler"))
    }
    val corpus = (regular ++ planted).toDF("doc_id", "text")
    // the fixture is REAL skew: boilerplate shingles exceed the cap
    val dfs = corpus
      .select(explode(exprs.shingleHashes(col("text"), 3)).as("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val mega = dfs.filter(col("df") > Dedup.PostingDfCap).count()
    assert(mega >= 4, s"fixture must plant over-cap shingles, saw $mega")
    // surviving (sub-cap) fan-out is bounded: Σ C(df,2) over kept
    // shingles stays candidate-tiny — no reducer sees a mega posting
    val volume = dfs.filter(col("df") <= Dedup.PostingDfCap)
      .agg(sum((col("df") * (col("df") - 1) / 2).cast("long"))).head().getLong(0)
    assert(volume < 100000L, s"capped candidate volume must be bounded, saw $volume")
    val pairs = Dedup.ngramJaccardOf(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (k <- 0 until 8)
      assert(pairs.contains((10000L + 2 * k, 10001L + 2 * k)),
        s"planted near-dup pair $k must be recovered via its sub-cap shingles")
    assert(!pairs.exists { case (a, b) => a < 2500L && b < 2500L },
      "boilerplate-only overlap must never produce a pair")

    // ---- C2 mega-bucket corpus: a 1000-doc identical-text flood
    // collapses into ONE LSH bucket per band; bucketPairs caps the
    // expansion at C(BucketCap,2) instead of C(1000,2) ----
    val flood = (0L until 1000L).map(id => (id, s"common flood text ${body(0)} " +
      "the very same duplicated document body repeated everywhere verbatim"))
    val floodPlanted = (0 until 4).flatMap { k =>
      val shared = body(40)
      Seq((20000L + 2 * k, s"$shared alpha$k beta$k"),
          (20001L + 2 * k, s"$shared gamma$k delta$k"))
    }
    val corpus2 = (flood ++ floodPlanted).toDF("doc_id", "text")
    val got2 = Dedup.minhashOf(corpus2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val floodPairs = got2.filter { case (a, b) => a < 1000L && b < 1000L }
    val capN = Dedup.BucketCap.toLong
    assert(floodPairs.size.toLong === capN * (capN - 1) / 2,
      s"flood expansion must be exactly C($capN,2), saw ${floodPairs.size}")
    assert(floodPairs.forall { case (a, b) => a < capN && b < capN },
      "the capped slice keeps the lowest doc ids (deterministic quarantine set)")
    for (k <- 0 until 4)
      assert(got2.contains((20000L + 2 * k, 20001L + 2 * k)),
        s"planted near-dup pair $k must survive the flood bucket cap")
  }

  test("C69 BPE encode: per-doc counts equal an independent re-encode") {
    def toks(t: String) =
      t.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val merges = TextOps.bpeTrain(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2)))
      .take(TextOps.BpeEncodeMerges) // encode runs at its own budget
    def encode(w: String): Int = {
      var syms: Seq[String] = w.map(_.toString)
      for ((l, r) <- merges) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toSeq
      }
      syms.length
    }
    val expect = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map { r =>
        val ws = toks(r.getString(1))
        (r.getLong(0), ws.length.toLong, ws.map(encode(_).toLong).sum)
      }.sortBy(_._1).toSeq
    val got = TextOps.bpeEncode(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"))).toSeq
    assert(got === expect)
    // merges only ever SHRINK the stream: 1 <= fertility <= chars/word
    assert(expect.forall { case (_, nw, nb) => nb >= nw })
  }

  test("C75 tokenizer eval: per-language fertility/compression equals an independent re-encode") {
    def toks(t: String) =
      t.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val merges = TextOps.bpeTrain(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2)))
      .take(TextOps.BpeEncodeMerges)
    def encode(w: String): Int = {
      var syms: Seq[String] = w.map(_.toString)
      for ((l, r) <- merges) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toSeq
      }
      syms.length
    }
    val words = Tables.documents(spark, sfDir).select("lang", "text").collect()
      .flatMap(r => toks(r.getString(1)).map(w => (r.getString(0), w)))
    val expect = words.groupBy(_._1).view.mapValues { ws =>
      val nW = ws.length.toLong
      val nC = ws.map(_._2.length.toLong).sum
      val nB = ws.map(w => encode(w._2).toLong).sum
      (nW, nC, nB,
        math.round(nB.toDouble / nW * 1e6) / 1e6,
        math.round(nC.toDouble / nB * 1e6) / 1e6)
    }.toMap
    val got = TextOps.tokenizerEval(spark, sfDir).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got === expect)
    // fertility >= 1 everywhere (merges only shrink), compression <= max word len
    assert(got.values.forall { case (_, _, _, f, c) => f >= 1.0 && c >= 1.0 })
  }

  test("C67 NFC normalization: decomposed converges to precomposed, ASCII untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "cafe\u0301"),        // e + combining acute (decomposed)
      (2L, "caf\u00e9"),         // precomposed e-acute
      (3L, "plain ascii text"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), exprs.nfcNormalize(col("text")).as("norm"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // both spellings normalize to the same (precomposed) bytes
    assert(df(1L) === df(2L))
    assert(df(1L) === "caf\u00e9")
    assert(df(1L).length === 4)
    // ASCII is the identity fast path
    assert(df(3L) === "plain ascii text")
    // and content-hash dedup AFTER normalization now sees the pair as
    // ONE document — the reason the pass sits in front of C1/C47
    val dedup = Seq((1L, "cafe\u0301"), (2L, "caf\u00e9")).toDF("doc_id", "text")
      .groupBy(md5(exprs.nfcNormalize(col("text")).cast("binary")).as("h"))
      .count().collect()
    assert(dedup.length === 1 && dedup.head.getLong(1) === 2L)
  }

  test("C66 compression signal: real zlib (inflate round-trip), ratios exact") {
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
                   (2L, ("spam " * 100).trim)).toDF("doc_id", "text")
    val stats = TextOps.compressionStats(spark, docs).collect()
      .map(st => st.doc_id -> st).toMap
    // recompute each length with an independent Deflater AND prove the
    // compressed stream inflates back to the original bytes
    for ((id, text) <- Seq((1L, "the quick brown fox jumps over the lazy dog"),
                           (2L, ("spam " * 100).trim))) {
      val in = text.getBytes("UTF-8")
      val d = new java.util.zip.Deflater()
      d.setInput(in); d.finish()
      val out = new Array[Byte](in.length * 2 + 64)
      val n = d.deflate(out); d.end()
      assert(stats(id).n_bytes === in.length.toLong)
      assert(stats(id).n_deflate === n.toLong)
      val inf = new java.util.zip.Inflater()
      inf.setInput(out, 0, n)
      val back = new Array[Byte](in.length)
      assert(inf.inflate(back) === in.length && back.toSeq === in.toSeq)
      inf.end()
    }
    // the repetitive doc compresses far better than natural text
    assert(stats(2L).ratio < stats(1L).ratio)
    assert(stats(2L).ratio < 0.1 && stats(1L).ratio > 0.5)
  }

  test("C61 BM25: score decomposes into per-term contributions, rank follows score") {
    val out = TextOps.bm25(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= TextOps.Bm25TopN)
    // ranks are 1..n in (score desc, doc_id) order
    val byRank = out.sortBy(_.getAs[Long]("rank"))
    assert(byRank.map(_.getAs[Long]("rank")).toSeq === (1L to out.length).toSeq)
    val scores = byRank.map(r => (r.getAs[Double]("score"), r.getAs[Long]("doc_id")))
    assert(scores.sliding(2).forall { case Array((s1, d1), (s2, d2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2) })
    // every scored doc matches at least one query term; recompute one
    // doc's score from scratch (no Spark) to pin the BM25 arithmetic
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def toks(t: String) =
      t.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val dls = docs.view.mapValues(t => toks(t).length.toLong).toMap
    val n = docs.size.toDouble
    val avgdl = dls.values.sum.toDouble / n
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r10(x: Double) = BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dfs = TextOps.Bm25Terms.map(t =>
      t -> docs.count { case (_, txt) => toks(txt).contains(t) }).toMap
    val top = byRank.head
    val id = top.getAs[Long]("doc_id")
    val tf = toks(docs(id)).groupBy(identity).view.mapValues(_.length).toMap
    val exp = r6(TextOps.Bm25Terms.flatMap { t =>
      val f = tf.getOrElse(t, 0)
      if (f == 0) None else {
        val idf = r6(math.log(1.0 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5)))
        Some(r10(idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * (dls(id) / avgdl)))))
      }
    }.sum)
    assert(top.getAs[Double]("score") === exp)
    assert(top.getAs[Long]("n_matched") ===
      TextOps.Bm25Terms.count(t => tf.contains(t)).toLong)
  }

  test("C62 Zipf fit: slope negative, OLS recomputed from the rank table") {
    val row = TextOps.corpusZipf(spark, sfDir).collect().head
    val nTerms = row.getAs[Long]("n_terms")
    assert(nTerms > 0 && nTerms <= TextOps.ZipfTopV)
    // natural-ish text: frequencies fall with rank
    assert(row.getAs[Double]("slope") < 0.0)
    // recompute the OLS fit from scratch
    def toks(t: String) =
      t.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r10(x: Double) = BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    val counts = Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(r => toks(r.getString(0)))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(TextOps.ZipfTopV)
    val pts = counts.zipWithIndex.map { case ((_, c), i) =>
      (r10(math.log(i + 1.0)), r10(math.log(c.toDouble))) }
    val v = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map { case (x, y) => r10(x * y) }.sum
    val sxx = pts.map { case (x, _) => r10(x * x) }.sum
    val slope = (v * sxy - sx * sy) / (v * sxx - sx * sx)
    assert(nTerms === pts.length.toLong)
    assert(row.getAs[Double]("slope") === r6(slope))
    assert(row.getAs[Double]("intercept") === r6((sy - slope * sx) / v))
  }

  test("C63 span removal: planted shared span removed, unique docs untouched") {
    import spark.implicits._
    val shared = (1 to 25).map(i => s"shared$i").mkString(" ")
    val plant = Seq(
      (1L, s"alpha beta $shared gamma"),          // shared 25-gram, offset 2
      (2L, s"$shared delta epsilon zeta"),        // same span at offset 0
      (3L, "totally unique words that never repeat anywhere else at all"),
      (4L, "short doc")                            // < 20 tokens: no grams
    ).toDF("doc_id", "text")
    // reuse the production operator body against the planted frame
    val grams = plant.select(col("doc_id"),
      posexplode(exprs.shingleHashesAll(col("text"), Dedup.SpanN)).as(Seq("pos", "sh")))
    val rep = grams.groupBy("sh").count().filter(col("count") >= 2).select("sh")
    val starts = grams.join(rep, "sh").groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("starts"))
    val out = plant.join(starts, Seq("doc_id"), "left")
      .withColumn("starts", coalesce(col("starts"), array().cast("array<int>")))
      .withColumn("covered", array_distinct(flatten(transform(col("starts"),
        st => sequence(st, st + lit(Dedup.SpanN - 1))))))
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("kept", filter(col("toks"), (t, i) => !array_contains(col("covered"), i)))
      .select(col("doc_id"), col("kept"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    // doc 1: tokens 2..28 are inside some duplicated 20-gram (the 25
    // shared tokens span starts 2..9 → covered 2..28); alpha/beta/gamma
    // survive only where no duplicated gram covers them
    assert(out(1L).take(2) === Seq("alpha", "beta"))
    assert(out(1L).forall(t => !t.startsWith("shared")))
    assert(out(2L).forall(t => !t.startsWith("shared")))
    // the unique doc and the short doc are untouched
    assert(out(3L).length === 10)
    assert(out(4L) === Seq("short", "doc"))
    // the production entry at sf: removal counts are consistent and the
    // kept+removed partition is exact
    val prod = Dedup.spanRemoval(spark, sfDir).collect()
    assert(prod.forall(r => r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed")
      === r.getAs[Long]("n_toks")))
  }

  test("C64 embedding drift: cosine bounded, integer-quantized centroids exact") {
    val out = VectorOps.embeddingDrift(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => math.abs(r.getAs[Double]("cos_to_global")) <= 1.0))
    // recompute one label's cosine from the raw vectors with the same
    // integer quantization — exact equality, not epsilon
    val vecs = Tables.embeddings(spark, sfDir).select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(v =>
        BigDecimal(v.toDouble * 1000000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)))
    val dim = vecs.head._2.length
    val lbl = out.head.getAs[Int]("label")
    def centroidSums(vs: Seq[Seq[Long]]) =
      (0 until dim).map(i => vs.map(_(i)).map(BigInt(_)).sum)
    val sl = centroidSums(vecs.filter(_._1 == lbl).map(_._2).toSeq)
    val sg = centroidSums(vecs.map(_._2).toSeq)
    val dot = (sl, sg).zipped.map(_ * _).sum
    val cos = dot.toDouble /
      (math.sqrt(sl.map(x => x * x).sum.toDouble) * math.sqrt(sg.map(x => x * x).sum.toDouble))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getAs[Double]("cos_to_global") === r6(cos))
    assert(out.map(_.getAs[Long]("n_vecs")).sum ===
      Tables.embeddings(spark, sfDir).count())
  }

  test("C65 hybrid RRF: fusion arithmetic exact, dual-rank-1 wins, depth respected") {
    val out = VectorOps.hybridRrf(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size <= VectorOps.NQueries)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((_, rows) <- byQ) {
      val byRank = rows.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq === (1L to rows.length).toSeq)
      assert(rows.length <= VectorOps.HybridTopK)
      for (r <- rows) {
        val (rb, rc) = (r.getAs[Long]("r_bm25"), r.getAs[Long]("r_cos"))
        assert(rb == -1L || (rb >= 1L && rb <= VectorOps.RrfDepth))
        assert(rc == -1L || (rc >= 1L && rc <= VectorOps.RrfDepth))
        assert(rb != -1L || rc != -1L)
        val exp = r6((if (rb == -1L) 0.0 else 1.0 / (60.0 + rb)) +
                     (if (rc == -1L) 0.0 else 1.0 / (60.0 + rc)))
        assert(r.getAs[Double]("rrf") === exp)
      }
      // a candidate ranked 1 by BOTH modalities can't be beaten
      byRank.find(r => r.getAs[Long]("r_bm25") == 1L && r.getAs[Long]("r_cos") == 1L)
        .foreach(r => assert(r.getAs[Long]("rank") === 1L))
      // fused order follows (rrf desc, cand_id)
      val keys = byRank.map(r => (r.getAs[Double]("rrf"), r.getAs[Long]("cand_id")))
      assert(keys.sliding(2).forall { case Array((s1, c1), (s2, c2)) =>
        s1 > s2 || (s1 == s2 && c1 < c2) })
    }
  }

  test("C74 edit-distance dedup: planted typo pairs exact, far pairs excluded") {
    import spark.implicits._
    val rnd = new scala.util.Random(74)
    val alpha = "abcdefghijklmnopqrstuvwxyz 0123456789"
    def randText(n: Int): String =
      (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def mutate(s: String, k: Int): String = {
      val chars = s.toCharArray
      val pos = rnd.shuffle(chars.indices.toList).take(k)
      pos.foreach { p =>
        var c = alpha(rnd.nextInt(alpha.length))
        while (c == chars(p)) c = alpha(rnd.nextInt(alpha.length))
        chars(p) = c
      }
      new String(chars)
    }
    // 40 unique docs + 6 planted near-pairs (k <= EdMax edits) + a
    // planted FAR pair (40% divergence) + heavy shared boilerplate
    // prefix on some docs (low-entropy grams must not flood candidates)
    val boiler = "the quick brown fox jumps over the lazy dog again and again "
    val uniques = (1 to 40).map(i => (i.toLong, randText(200)))
    val nears = (1 to 6).flatMap { j =>
      val base = (if (j % 2 == 0) boiler else "") + randText(200)
      Seq((100L + j * 2, base), (101L + j * 2, mutate(base, 1 + rnd.nextInt(graft.pipeline.Dedup.EdMax))))
    }
    val fars = {
      val base = randText(200)
      Seq((300L, base), (301L, mutate(base, 80)))
    }
    val docs = (uniques ++ nears ++ fars)
      .map { case (id, tx) => (id, tx, "en", "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.pipeline.Dedup.editDistancePairsOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gotPairs = got.map(t => (t._1, t._2)).toSet
    val wantPairs = (1 to 6).map(j => (100L + j * 2, 101L + j * 2)).toSet
    assert(wantPairs.subsetOf(gotPairs),
      s"planted near pairs missing: ${wantPairs -- gotPairs}")
    assert(!gotPairs.contains((300L, 301L)), "far pair must not pass the absolute threshold")
    // every reported distance verifies against a from-scratch DP
    def lev(a: String, b: String): Long = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length).toLong
    }
    val textOf = (uniques ++ nears ++ fars).toMap
    got.foreach { case (a, b, dist) =>
      assert(dist === lev(textOf(a).toLowerCase, textOf(b).toLowerCase),
        s"distance for ($a,$b) diverges from the independent DP")
      assert(dist <= graft.pipeline.Dedup.EdMax)
    }
  }

  test("C74 PassJoin dial: uniform-length corpus — cell join quadratic, segment index bounded, results identical") {
    import spark.implicits._
    import graft.pipeline.Dedup
    val rnd = new scala.util.Random(741)
    val alpha = "abcdefghijklmnopqrstuvwxyz 0123456789"
    def randText(n: Int): String =
      (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def substitute(s: String, k: Int): String = {
      val chars = s.toCharArray
      rnd.shuffle(chars.indices.toList).take(k).foreach { p =>
        var c = alpha(rnd.nextInt(alpha.length))
        while (c == chars(p)) c = alpha(rnd.nextInt(alpha.length))
        chars(p) = c
      }
      new String(chars)
    }
    // THE degenerate shape: every doc exactly 120 chars → one length
    // cell → the cell join admits all n(n−1)/2 pairs
    val n = 1200
    val uniques = (1 to n).map(i => (i.toLong, randText(120)))
    // planted near-pairs: substitutions (same length), a deletion pair
    // (length gap Δ > 0 exercises the probe's Δ windows), and a tiny
    // pair below the segment floor (exercises the fallback route)
    val nearSub = (1 to 8).flatMap { j =>
      val base = randText(120)
      Seq((10000L + j * 2, base),
        (10001L + j * 2, substitute(base, 1 + rnd.nextInt(Dedup.EdMax))))
    }
    val delBase = randText(120)
    val nearDel = Seq((20000L, delBase), (20001L, delBase.substring(6)) /* Δ=6 */)
    val tinyPair = Seq((30000L, "abcdefgh"), (30001L, "abcdefghij"))
    val docs = (uniques ++ nearSub ++ nearDel ++ tinyPair)
      .map { case (id, tx) => (id, tx, "en", "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

    val g0 = Dedup.edPrep(docs).localCheckpoint()
    val cellCands = Dedup.editDistanceCellCandidates(g0).count()
    val pjCands = Dedup.editDistancePassJoinCandidates(g0).count()
    val quad = n.toLong * (n - 1) / 2
    assert(cellCands >= quad,
      s"precondition: the cell join must be quadratic here ($cellCands < $quad)")
    assert(pjCands <= cellCands / 50,
      s"segment index must stay bounded on the uniform-length corpus: " +
        s"$pjCands candidates vs $cellCands for the cell join")

    // both routes equal each other AND the planted truth
    val viaCell = Dedup.editDistancePairsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaPj = Dedup.editDistancePairsPassJoinOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaPj === viaCell,
      s"routes diverge: onlyCell=${viaCell -- viaPj} onlyPj=${viaPj -- viaCell}")
    val wantPairs = (1 to 8).map(j => (10000L + j * 2, 10001L + j * 2)).toSet +
      ((20000L, 20001L)) + ((30000L, 30001L))
    val gotPairs = viaPj.map(t => (t._1, t._2))
    assert(wantPairs.subsetOf(gotPairs), s"planted pairs missing: ${wantPairs -- gotPairs}")

    // and on a realistic length-spread corpus the dial changes nothing
    val real = Tables.documents(spark, sfDir)
    val realCell = Dedup.editDistancePairsOf(real).collect().map(_.toString).toSeq
    val realPj = Dedup.editDistancePairsPassJoinOf(real).collect().map(_.toString).toSeq
    assert(realPj === realCell, "dial must be result-identical on the documents table")
  }

  test("C73 sample_epochs: plan equals a from-scratch Scala recompute; cap + regimes hold") {
    import org.apache.spark.sql.functions.{col, lower, split}
    val out = graft.pipeline.TextOps.sampleEpochs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // from-scratch recompute: plain Scala over the raw parquet, no
    // shared code with the operator beyond the declared contract
    val Mod = 1000000007L
    def polyHash(s: String): Long = graft.functions.Hashing.polyHashString(s)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), lower(col("text")))
      .collect().map { r =>
        val toks = r.getString(2).split("[^a-z0-9]+").count(_.nonEmpty).toLong
        (r.getLong(0), r.getString(1), toks)
      }
    val totals = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val mults = Seq(0.4, 1.0, 2.5, 5.2)
    val expected = docs.flatMap { case (id, src, nTok) =>
      val t = totals(src)
      val budget = math.round(mults((polyHash(src) % 4).toInt) * t)
      val full = math.min(budget / t, 4L)
      val thr = if (full < 4L)
        math.floor((budget - full * t).toDouble / t * Mod.toDouble).toLong else 0L
      val hash = ((id % Mod) * 2654435761L + 987654321L) % Mod
      val reps = full + (if (hash < thr) 1L else 0L)
      (1L to reps).map(e => (id, src, nTok, e))
    }.sortBy(r => (r._1, r._4))
    assert(out.toSeq === expected.toSeq)
    // the 5.2x source family hits the 4-epoch cap and never exceeds it
    val bySrc = out.groupBy(_._2).view.mapValues(_.map(_._4).max).toMap
    val capped = totals.keys.filter(s => mults((polyHash(s) % 4).toInt) == 5.2)
    assert(capped.nonEmpty && capped.forall(s => bySrc(s) == 4L), "cap regime present and capped")
    assert(out.forall(_._4 <= 4L), "no epoch beyond the cap anywhere")
    // an under-budget (0.4x) source emits ONLY fractional-epoch rows
    val under = totals.keys.filter(s => mults((polyHash(s) % 4).toInt) == 0.4)
    assert(under.nonEmpty && under.forall(s => bySrc.get(s).forall(_ == 1L)))
    // admitted fractional token mass lands near the remainder (hash uniformity)
    under.foreach { s =>
      val t = totals(s)
      val want = math.round(0.4 * t).toDouble
      val got = out.filter(_._2 == s).map(_._3).sum.toDouble
      assert(got > 0.1 * want && got < 2.5 * want, s"fractional mass off for $s: $got vs $want")
    }
  }
  test("C78 hard negatives: below the ceiling, exactly the closest non-dups per anchor") {
    import graft.pipeline.VectorOps
    val got = VectorOps.mineHardNegatives(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.nonEmpty)
    assert(got.forall(_._3 < VectorOps.HardNegCeil), "every negative below the ceiling")
    // recompute the exact expectation from raw embeddings in plain Scala
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.groupBy(_._1).foreach { case (a, rs) =>
      val expect = vecs.toSeq.filter(_._1 != a)
        .map { case (n, v) => (n, cos(vecs(a), v)) }
        .filter(_._2 < VectorOps.HardNegCeil)
        .sortBy { case (n, c) => (-c, n) }
        .take(VectorOps.HardNegK)
      val gotA = rs.sortBy(_._4).map(r => (r._2, r._3)).toSeq
      assert(gotA == expect, s"anchor $a: got $gotA expected $expect")
    }
  }
}
