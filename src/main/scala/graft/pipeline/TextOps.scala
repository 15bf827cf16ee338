package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Mat, Tables}
import graft.functions.exprs

/** Text-analysis operators for the training-data pipeline (SURVEY.md
  * §2.C8–C11). Everything is a narrow per-row map over `documents` —
  * no shuffle at all until an output ORDER BY — so each op scales
  * linearly with input splits at 100 TB. Arithmetic is written
  * identically to the DuckDB oracle SQL (same expression tree, double
  * ops in the same order) so results match bit-for-bit after rounding.
  */
object TextOps {

  /** lower → split on non-alphanumeric runs → drop empties. The exact
    * same tokenizer (regex + filter) is used by every text/dedup op and
    * by the oracles — shingle sets must agree across engines.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** The DuckDB spelling of [[tokens]]. */
  val tokensSql = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  private val stopEn = Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for")
  private val stopDe = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den")
  private val stopFr = Seq("le", "la", "les", "et", "est", "un", "une", "du", "pour", "que")
  private val stopEs = Seq("el", "los", "y", "es", "una", "lo", "para", "con", "por", "se")

  private def sqlList(ws: Seq[String]) = ws.mkString("['", "', '", "']")
  private def markerScore(toks: Column, ws: Seq[String]): Column =
    size(array_intersect(array_distinct(toks), array(ws.map(lit): _*))).cast("long")

  /** C8 `text_langid`: language ID by distinct-marker-word voting — the
    * classic n-gram/stopword heuristic (cf. langid.py's feature voting)
    * reduced to something two engines can agree on exactly. Ties break
    * in fixed order en > de > fr > es; all-zero → 'und'.
    */
  def langId(s: SparkSession, d: String): DataFrame = {
    val df = Tables.documents(s, d).withColumn("toks", tokens(col("text")))
      .withColumn("score_en", markerScore(col("toks"), stopEn))
      .withColumn("score_de", markerScore(col("toks"), stopDe))
      .withColumn("score_fr", markerScore(col("toks"), stopFr))
      .withColumn("score_es", markerScore(col("toks"), stopEs))
    df.select(
      col("doc_id"), col("score_en"), col("score_de"), col("score_fr"), col("score_es"),
      when(col("score_en") + col("score_de") + col("score_fr") + col("score_es") === 0, "und")
        .when(col("score_en") >= col("score_de") && col("score_en") >= col("score_fr") &&
              col("score_en") >= col("score_es"), "en")
        .when(col("score_de") >= col("score_fr") && col("score_de") >= col("score_es"), "de")
        .when(col("score_fr") >= col("score_es"), "fr")
        .otherwise("es").as("lang_pred"))
      .orderBy(col("doc_id"))
  }

  val langIdSql: String = {
    def sc(ws: Seq[String]) =
      s"len(list_intersect(list_distinct($tokensSql), ${sqlList(ws)}))"
    s"""SELECT doc_id,
       |  ${sc(stopEn)} AS score_en, ${sc(stopDe)} AS score_de,
       |  ${sc(stopFr)} AS score_fr, ${sc(stopEs)} AS score_es,
       |  CASE WHEN ${sc(stopEn)} + ${sc(stopDe)} + ${sc(stopFr)} + ${sc(stopEs)} = 0 THEN 'und'
       |       WHEN ${sc(stopEn)} >= ${sc(stopDe)} AND ${sc(stopEn)} >= ${sc(stopFr)} AND ${sc(stopEn)} >= ${sc(stopEs)} THEN 'en'
       |       WHEN ${sc(stopDe)} >= ${sc(stopFr)} AND ${sc(stopDe)} >= ${sc(stopEs)} THEN 'de'
       |       WHEN ${sc(stopFr)} >= ${sc(stopEs)} THEN 'fr'
       |       ELSE 'es' END AS lang_pred
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** C9 `text_quality`: length / punctuation / stopword-density
    * heuristics (the Gopher/C4-style quality-filter family) plus a
    * combined score. Ratios are rounded to 6 dp *before* entering the
    * combined score so both engines fold the identical doubles.
    */
  def quality(s: SparkSession, d: String): DataFrame = {
    val punct = length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_words", size(col("toks")).cast("long"))
      // greatest(…,1): an empty document has ratio 0, not a
      // divide-by-zero crash (ANSI mode) — same guard as stop_ratio
      .withColumn("punct_ratio", round(
        punct.cast("double") / greatest(col("n_chars"), lit(1L)), 6))
      .withColumn("stop_ratio", round(
        size(filter(col("toks"), t => array_contains(array(stopEn.map(lit): _*), t)))
          .cast("double") / greatest(col("n_words"), lit(1L)), 6))
      .withColumn("quality_score", round(
        least(lit(1.0), col("n_words") / lit(200.0)) *
          (lit(1.0) - col("punct_ratio")) *
          (lit(0.5) + lit(0.5) * col("stop_ratio")), 6))
      .select("doc_id", "n_chars", "n_words", "punct_ratio", "stop_ratio", "quality_score")
      .orderBy("doc_id")
  }

  val qualitySql: String =
    s"""WITH t AS (
       |  SELECT doc_id, length(text) AS n_chars,
       |    length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS punct,
       |    $tokensSql AS toks
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, n_chars, len(toks) AS n_words,
       |    round(punct * 1.0 / greatest(n_chars, 1), 6) AS punct_ratio,
       |    round(len(list_filter(toks, x -> list_contains(${sqlList(stopEn)}, x))) * 1.0
       |          / greatest(len(toks), 1), 6) AS stop_ratio
       |  FROM t)
       |SELECT doc_id, n_chars, n_words, punct_ratio, stop_ratio,
       |  round(least(1.0, n_words / 200.0) * (1.0 - punct_ratio)
       |        * (0.5 + 0.5 * stop_ratio), 6) AS quality_score
       |FROM r ORDER BY doc_id""".stripMargin

  /** C10 `text_tokens`: whitespace token count plus a BPE-ish regex
    * count (alnum runs or single non-space symbols — the GPT-2 pattern
    * family without the library dependency).
    */
  def tokenCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("ws_tokens",
        size(filter(split(col("text"), "[ \\t\\n\\x0B\\f\\r]+"), t => length(t) > 0)).cast("long"))
      .withColumn("bpe_tokens",
        regexp_count(lower(col("text")), lit("[a-z0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]")).cast("long"))
      .withColumn("chars_per_token",
        round(length(col("text")).cast("double") / greatest(col("bpe_tokens"), lit(1L)), 6))
      .select("doc_id", "ws_tokens", "bpe_tokens", "chars_per_token")
      .orderBy("doc_id")

  val tokenCountsSql: String =
    """SELECT doc_id,
      |  len(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'), x -> x <> '')) AS ws_tokens,
      |  len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 \t\n\x0B\f\r]')) AS bpe_tokens,
      |  round(length(text) * 1.0 / greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 \t\n\x0B\f\r]')), 1), 6) AS chars_per_token
      |FROM documents ORDER BY doc_id""".stripMargin

  /** C11 `text_fingerprint`: winnowing fingerprints (k=8-char grams,
    * window w=4) via the codegen'd [[graft.functions.WinnowFingerprint]]
    * expression; exploded to one row per selected hash. The hash is the
    * portable polynomial so DuckDB derives the identical fingerprints
    * from scratch in SQL.
    */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(exprs.winnowFp(col("text"), 8, 4)).as("fp"))
      .orderBy("doc_id", "fp")

  val fingerprintSql: String =
    """WITH h AS (
      |  SELECT doc_id, list_transform(range(1, length(text) - 8 + 2), i ->
      |    list_reduce(list_transform(string_split(substring(text, i, 8), ''), ch -> ascii(ch)::BIGINT),
      |                (a, x) -> (a * 31 + x) % 1000000007)) AS hs
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, list_sort(list_distinct(
      |    list_transform(range(1, len(hs) - 4 + 2), j -> list_min(hs[j:j+3])))) AS fps
      |  FROM h)
      |SELECT doc_id, unnest(fps) AS fp FROM m ORDER BY doc_id, fp""".stripMargin

  /** C14 `sample_split`: deterministic train/validation assignment by
    * portable hash of the document id — the reproducible held-out
    * split every training pipeline needs (stable under reshuffles,
    * re-runs, and engine changes; no RNG state anywhere).
    */
  def sampleSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("bucket", pmod(exprs.polyHash(col("doc_id").cast("string")), lit(100L)))
      .withColumn("split", when(col("bucket") < 90, "train").otherwise("val"))
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")

  val sampleSplitSql: String =
    """SELECT doc_id,
      |  list_reduce(list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
      |              ch -> ascii(ch)::BIGINT), (a, x) -> (a * 31 + x) % 1000000007) % 100 AS bucket,
      |  CASE WHEN list_reduce(list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
      |              ch -> ascii(ch)::BIGINT), (a, x) -> (a * 31 + x) % 1000000007) % 100 < 90
      |       THEN 'train' ELSE 'val' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  /** C56 `corpus_vocab_growth`: Heaps-law vocabulary-growth profiling —
    * the tokenizer-sizing / dedup-health curve: cumulative distinct
    * vocabulary vs cumulative tokens over a deterministic 10-slice
    * ingestion order (C14's polyHash bucketing, so the "order" is
    * reproducible across engines and runs). A sub-linear curve is
    * healthy natural text; a near-linear one means unbounded junk
    * vocabulary (serial numbers, hashes) that will blow up a BPE
    * vocabulary. Shape: each term's FIRST slice via one
    * map-side-combined min-aggregation (never a per-slice rescan —
    * the naive "distinct per prefix" is 10 corpus scans), token
    * counts per slice in the same pass structure, then the cumulative
    * sums run on the 10-row grid — a single-partition window over 10
    * rows, constant at any corpus size.
    */
  def vocabGrowth(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, d)
      .withColumn("bucket", pmod(exprs.polyHash(col("doc_id").cast("string")), lit(10L)))
      .select(col("bucket"), explode(tokens(col("text"))).as("term"))
    val newTerms = toks.groupBy(col("term")).agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_terms"))
    val tokCounts = toks.groupBy(col("bucket")).agg(count(lit(1)).as("n_tokens"))
    val grid = s.range(10).select(col("id").as("bucket"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(newTerms, Seq("bucket"), "left").join(tokCounts, Seq("bucket"), "left")
      .withColumn("new_terms", coalesce(col("new_terms"), lit(0L)))
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
      .withColumn("cum_vocab", sum(col("new_terms")).over(w))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select(col("bucket"), col("new_terms"), col("cum_vocab"),
        col("n_tokens"), col("cum_tokens"))
      .orderBy(col("bucket"))
  }

  val vocabGrowthSql: String =
    s"""WITH d AS (
       |  SELECT list_reduce(list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
       |           ch -> ascii(ch)::BIGINT), (a, x) -> (a * 31 + x) % 1000000007) % 10 AS bucket,
       |         $tokensSql AS t
       |  FROM documents),
       |toks AS (SELECT bucket, unnest(t) AS term FROM d),
       |nt AS (SELECT bucket, count(*) AS new_terms FROM
       |        (SELECT term, min(bucket) AS bucket FROM toks GROUP BY term) GROUP BY bucket),
       |tc AS (SELECT bucket, count(*) AS n_tokens FROM toks GROUP BY bucket),
       |g AS (SELECT unnest(range(10)) AS bucket)
       |SELECT g.bucket, coalesce(nt.new_terms, 0)::BIGINT AS new_terms,
       |  CAST(sum(coalesce(nt.new_terms, 0)) OVER (ORDER BY g.bucket) AS BIGINT) AS cum_vocab,
       |  coalesce(tc.n_tokens, 0)::BIGINT AS n_tokens,
       |  CAST(sum(coalesce(tc.n_tokens, 0)) OVER (ORDER BY g.bucket) AS BIGINT) AS cum_tokens
       |FROM g LEFT JOIN nt ON nt.bucket = g.bucket LEFT JOIN tc ON tc.bucket = g.bucket
       |ORDER BY g.bucket""".stripMargin

  /** C60 `corpus_divergence`: per-source domain-shift detection — the
    * KL divergence of each source's add-1-smoothed unigram
    * distribution from the whole corpus's, over the shared vocabulary.
    * An outlier source (machine-generated spam, a different language
    * slipping past langid, template noise) shows up as a KL spike
    * before it poisons a mixture. Shapes: three map-side-combined
    * count aggregations over one token stream; the per-(source, term)
    * contribution grid is vocab × sources rows (sources broadcast —
    * tiny), LEFT-joined against the observed counts so absent terms
    * contribute their smoothed mass; at 100 TB the grid is capped to
    * the top-V vocabulary exactly like C48. Per-term contributions
    * quantize to 10 dp before the per-source sum (magnitudes are
    * ~1/|V|, so the C20 6-dp grid would crush them), final 6-dp snap.
    */
  def corpusDivergence(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("term"))
    // ONE tokenize pass: the three coarser count tables all derive from
    // the (source, term) counts by exact integer roll-up — unchecked,
    // each aggregation re-planned the tokenize+explode chain (4
    // documents scans in the before-plan; r13 optimization; r14 swaps
    // the localCheckpoint for a fault-tolerant persist, see graft.Mat)
    val byST = Mat.factRows(
      toks.groupBy(col("source"), col("term")).agg(count(lit(1)).as("c_st")))
    val byT = byST.groupBy(col("term")).agg(sum(col("c_st")).as("c_t"))
    val byS = byST.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val tot = byT.agg(sum(col("c_t")).cast("double").as("n_tot"),
      count(lit(1)).cast("double").as("v"))
    val grid = byT.crossJoin(broadcast(byS)).crossJoin(broadcast(tot))
    val joined = grid.join(byST, Seq("source", "term"), "left")
      .withColumn("c_st", coalesce(col("c_st"), lit(0L)))
    val p = (col("c_st") + lit(1)).cast("double") / (col("n_s") + col("v"))
    val q = (col("c_t") + lit(1)).cast("double") / (col("n_tot") + col("v"))
    joined
      .withColumn("contrib", round(p * log(p / q), 10))
      .groupBy(col("source"))
      .agg(first(col("n_s")).as("n_tokens"),
        round(sum(col("contrib")), 6).as("kl_divergence"))
      .orderBy(col("source"))
  }

  val corpusDivergenceSql: String =
    s"""WITH toks AS (SELECT source, unnest($tokensSql) AS term FROM documents),
       |st AS (SELECT source, term, count(*) AS c_st FROM toks GROUP BY 1, 2),
       |t AS (SELECT term, count(*) AS c_t FROM toks GROUP BY 1),
       |sc AS (SELECT source, count(*) AS n_s FROM toks GROUP BY 1),
       |tot AS (SELECT count(*) AS n_tot, count(DISTINCT term) AS v FROM toks),
       |j AS (SELECT sc.source, sc.n_s, t.c_t, coalesce(st.c_st, 0) AS c_st, tot.n_tot, tot.v
       |      FROM sc CROSS JOIN t CROSS JOIN tot
       |      LEFT JOIN st ON st.source = sc.source AND st.term = t.term)
       |SELECT source, any_value(n_s)::BIGINT AS n_tokens,
       |  round(sum(round(
       |    ((c_st + 1) * 1.0 / (n_s + v))
       |    * ln(((c_st + 1) * 1.0 / (n_s + v)) / ((c_t + 1) * 1.0 / (n_tot + v))), 10)), 6)
       |    AS kl_divergence
       |FROM j GROUP BY source ORDER BY source""".stripMargin

  /** C36 `sample_shuffle`: deterministic global corpus shuffle — the
    * training-order permutation. The key is the Knuth multiplicative
    * hash of (doc_id + seed) (integer-only, engine-identical, no RNG
    * state); ordering by it is a reproducible pseudo-random
    * permutation, and `key mod nShards` hands each trainer worker its
    * slice. Cost is one range-partitioned sort — exactly how a 100 TB
    * corpus is shuffled (Spark's orderBy range-samples the keys, so
    * output shards stay balanced); everything else is a narrow map.
    */
  val ShuffleSeed = 42L
  val ShuffleShards = 8L

  def sampleShuffle(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("shuffle_key",
        pmod((col("doc_id") + lit(ShuffleSeed)) * lit(2654435761L), lit(1000000007L)))
      .withColumn("shard", pmod(col("shuffle_key"), lit(ShuffleShards)))
      .select(col("doc_id"), col("shuffle_key"), col("shard"))
      .orderBy(col("shuffle_key"), col("doc_id"))

  val sampleShuffleSql: String =
    s"""SELECT doc_id,
       |  ((doc_id + $ShuffleSeed) * 2654435761) % 1000000007 AS shuffle_key,
       |  ((doc_id + $ShuffleSeed) * 2654435761) % 1000000007 % $ShuffleShards AS shard
       |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin

  /** C27 `sample_mixture`: deterministic data mixing — per-source
    * sampling rates (the domain-weighting step of training-set
    * construction: upweight curated sources, downsample crawl). The
    * keep decision hashes `doc_id` with the portable polynomial hash
    * (so both engines and every re-run agree row-for-row — no RNG) and
    * compares against the source's rate; rates here derive from the
    * source index (≤5 → 100 %, ≤10 → 50 %, else 20 %). A narrow
    * per-row map: at 100 TB this is a zero-shuffle filter you fuse
    * into the first pass over the corpus.
    */
  def sampleMixture(s: SparkSession, d: String): DataFrame = {
    val srcIdx = substring(col("source"), 4, 10).cast("int")
    val rate = when(srcIdx <= 5, 1.0).when(srcIdx <= 10, 0.5).otherwise(0.2)
    // Knuth multiplicative hash: integer-only, overflow-free for any
    // realistic id domain (id < 2^31 ⇒ product < 2^63), and identical
    // arithmetic in both engines — the short-digit-string polynomial
    // hash used by sample_split correlates with id % |sources| here
    // (ids are assigned round-robin) and skews per-source rates badly
    Tables.documents(s, d)
      .withColumn("bucket",
        pmod(col("doc_id") * lit(2654435761L), lit(1000000007L)) % 1000)
      .filter(col("bucket") < rate * 1000)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  val sampleMixtureSql: String =
    """WITH h AS (
      |  SELECT doc_id, source,
      |    (doc_id * 2654435761) % 1000000007 % 1000 AS bucket,
      |    CASE WHEN CAST(substr(source, 4) AS INT) <= 5 THEN 1.0
      |         WHEN CAST(substr(source, 4) AS INT) <= 10 THEN 0.5
      |         ELSE 0.2 END AS rate
      |  FROM documents)
      |SELECT doc_id, source FROM h WHERE bucket < rate * 1000
      |ORDER BY doc_id""".stripMargin

  /** C28 `pipeline_corpus_e2e`: the composed cleaning pipeline in ONE
    * Catalyst DAG — quality gate (C24) → exact dedup keeper election
    * (C1, keyed on the md5 content hash so the shuffle carries 32-byte
    * keys, not document bodies) → per-source survivor rollup. This is
    * the flagship composition a training-data run executes end-to-end;
    * every stage is a narrow map or a partial-agg-friendly keyed
    * shuffle, and Catalyst pipelines them without materialization
    * boundaries. The oracle composes the SAME stages in SQL.
    */
  def pipelineE2e(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val kept = corpusFilterCore(docs).filter(col("keep")).select("doc_id")
    val k = docs.join(kept, "doc_id")
      .select(col("doc_id"), col("source"), md5(col("text").cast("binary")).as("h"))
    val keepers = k.groupBy(col("h")).agg(min(col("doc_id")).as("keeper"))
    k.join(keepers, k("doc_id") === keepers("keeper"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"))
  }

  // lazy: corpusFilterSql initializes later in this object
  lazy val pipelineE2eSql: String =
    s"""WITH f AS (SELECT doc_id FROM ($corpusFilterSql) WHERE keep),
       |k AS (SELECT d.doc_id, d.source, md5(d.text) AS h
       |      FROM documents d JOIN f USING (doc_id)),
       |ded AS (SELECT min(doc_id) AS keeper FROM k GROUP BY h)
       |SELECT source, count(*) AS n_docs
       |FROM k JOIN ded ON doc_id = keeper
       |GROUP BY source ORDER BY source""".stripMargin

  // PII patterns shared by the op and its oracle — simple enough that
  // Java regex and DuckDB's RE2 agree exactly (plain classes, \b, {n,m})
  private val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** C18 `text_redact`: PII scrubbing — the redaction pass every
    * training-data pipeline runs before a corpus ships. Emails and
    * IPv4 literals are replaced with typed placeholders and counted
    * per document; a narrow per-row map (regex in codegen), so it
    * scales like the other text ops. Order matters: emails first, so
    * an address's host part can't be half-eaten by the IP pass.
    */
  def redact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_emails", regexp_count(col("text"), lit(EmailRe)).cast("long"))
      .withColumn("n_ips", regexp_count(col("text"), lit(Ipv4Re)).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("text"), EmailRe, "[EMAIL]"), Ipv4Re, "[IP]"))
      .select("doc_id", "n_emails", "n_ips", "redacted")
      .orderBy("doc_id")

  val redactSql: String =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(text, '$EmailRe')) AS n_emails,
       |  len(regexp_extract_all(text, '$Ipv4Re')) AS n_ips,
       |  regexp_replace(regexp_replace(text, '$EmailRe', '[EMAIL]', 'g'),
       |                 '$Ipv4Re', '[IP]', 'g') AS redacted
       |FROM documents ORDER BY doc_id""".stripMargin

  /** C20 `text_unigram_logprob`: corpus-unigram language-model score —
    * the perplexity-filter family (filter docs whose tokens are
    * improbable under the corpus LM). Score = Σ round(ln(count(t)/N), 6)
    * over a doc's tokens: per-token logprobs are quantized to 6 dp
    * BEFORE summing so the float sum is engine-order-independent, and
    * the final round snaps accumulation noise (~1e-11) back to the
    * quantum. Two keyed aggregations + one vocabulary join — the same
    * scale shape as tf·idf.
    */
  def unigramLogprob(s: SparkSession, d: String): DataFrame =
    unigramLogprobCore(Tables.documents(s, d)).orderBy(col("doc_id"))

  /** [[unigramLogprob]] without the output ordering — the reusable
    * form for downstream stages (C54 buckets on it).
    */
  def unigramLogprobCore(docs: DataFrame): DataFrame = {
    // one tokenize pass (r13 optimization): the token stream
    // materializes once and the grand total rolls up from the vocab
    // counts — unchecked, vocab / total / scoring join each re-planned
    // the tokenize+explode chain (3 scans). Same integer counts, same
    // per-instance addends. Fault-tolerant persist (r14, graft.Mat):
    // the exploded stream is fact-sized, so lineage must survive
    // executor loss.
    val toks = Mat.factRows(docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term")))
    val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).cast("double").as("n_total"))
    toks.join(vocab, "term").crossJoin(broadcast(total))
      .withColumn("lp", round(log(col("c") / col("n_total")), 6))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), round(sum(col("lp")), 6).as("logprob"))
  }

  val unigramLogprobSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
       |v AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
       |tot AS (SELECT count(*) AS n FROM toks)
       |SELECT doc_id, count(*) AS n_toks,
       |  round(sum(round(ln(c * 1.0 / tot.n), 6)), 6) AS logprob
       |FROM toks JOIN v USING (term), tot
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** C54 `text_ppl_buckets`: CCNet-style perplexity bucketing — split
    * each language's corpus into head/middle/tail thirds by LM score
    * (CCNet trains KenLM on Wikipedia and keeps the low-perplexity
    * "head" for quality data; the bucket label is the mixture dial
    * every curriculum/mixing stage downstream consumes). Score = the
    * C20 corpus-unigram logprob normalized per token; thresholds = the
    * exact interpolated 1/3 and 2/3 percentiles PER LANGUAGE.
    *
    * Scale shape — deliberately not a rank window: thresholds come
    * from one (lang → two percentiles) aggregate over the narrow
    * (lang, nlp) projection, then the #langs-row threshold table
    * BROADCASTS into the per-doc comparison. No corpus-wide sort, no
    * skewed-key window (contrast C45, which needs exact quotas and
    * therefore ranks); the exact `percentile` buffers one language's
    * scores on a reducer — at 100 TB flip the same plan to
    * `approx_percentile`, which is the documented production dial for
    * threshold-style buckets (ties all land in one bucket either way,
    * so the label is threshold-stable, unlike rank quotas). The
    * LM-score subtree feeds both the threshold collect and the bucket
    * pass — two separate ACTIONS, so it is eagerly checkpointed and
    * the corpus is scored once (r13; plan-level exchange reuse cannot
    * span actions).
    */
  def pplBuckets(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // materialize the scored corpus ONCE (r13 optimization): the
    // cut-point collect is a separate ACTION, so no plan-level reuse
    // can carry the score subtree over to the bucket pass — unchecked,
    // the whole LM-score subtree executed twice
    val sc = Mat.factRows(unigramLogprobCore(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("nlp", round(col("logprob") / col("n_toks"), 6)))
    // |langs|-row cut-point table collected once (bounded by
    // construction) and injected as plan-constant threshold lookups —
    // the bucket pass is then ONE score subtree + a narrow map, not a
    // second planned copy joined against a broadcast quantile subtree
    val th = sc.groupBy(col("lang")).agg(
        round(expr("percentile(nlp, 0.333333)"), 6).as("t1"),
        round(expr("percentile(nlp, 0.666667)"), 6).as("t2"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val t1 = exprs.constLookupD(col("lang"), th.map { case (k, v) => k -> v._1 },
      Double.MaxValue)
    val t2 = exprs.constLookupD(col("lang"), th.map { case (k, v) => k -> v._2 },
      Double.MaxValue)
    sc.select(col("doc_id"), col("lang"), col("nlp"),
        when(col("nlp") > t2, "head")
          .when(col("nlp") > t1, "middle")
          .otherwise("tail").as("ppl_bucket"))
      .orderBy(col("doc_id"))
  }

  val pplBucketsSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
       |v AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
       |tot AS (SELECT count(*) AS n FROM toks),
       |lp AS (SELECT doc_id, count(*) AS n_toks,
       |         round(sum(round(ln(c * 1.0 / tot.n), 6)), 6) AS logprob
       |       FROM toks JOIN v USING (term), tot GROUP BY doc_id),
       |sc AS (SELECT d.doc_id, d.lang, round(lp.logprob / lp.n_toks, 6) AS nlp
       |       FROM lp JOIN documents d ON d.doc_id = lp.doc_id),
       |th AS (SELECT lang, round(quantile_cont(nlp, 0.333333), 6) AS t1,
       |              round(quantile_cont(nlp, 0.666667), 6) AS t2
       |       FROM sc GROUP BY lang)
       |SELECT doc_id, lang, nlp,
       |  CASE WHEN nlp > t2 THEN 'head' WHEN nlp > t1 THEN 'middle'
       |       ELSE 'tail' END AS ppl_bucket
       |FROM sc JOIN th USING (lang) ORDER BY doc_id""".stripMargin

  /** C52 `text_entropy`: character-level Shannon entropy — the
    * classic gibberish/boilerplate signal (near-zero entropy = one
    * repeated character, ~4.1 bits-e for natural English; encrypted
    * or base64 blobs sit near ln(64)). A narrow per-row map with zero
    * shuffles. Cost is O(|alphabet|·n_chars) per document with the
    * alphabet bounded by the charset (≤ ~100 distinct units in
    * practice), i.e. linear with a constant — the per-unit counts are
    * recomputed per distinct unit rather than via a hash table so the
    * whole expression stays inside Spark's higher-order-function
    * kernels with no UDF. Cross-engine exactness: both engines fold
    * `p·ln(1/p)` terms over the SAME sorted-distinct unit order
    * (Spark `aggregate` and DuckDB `list_reduce` are both left
    * folds), so the double accumulation is bit-identical before the
    * final 6-dp snap. `[\s\S]` (not `.`) so newlines count as units,
    * and because its union is charset-complete it dodges the
    * Java-vs-RE2 `\s` divergence entirely.
    */
  def charEntropy(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("cs", regexp_extract_all(col("text"), lit("[\\s\\S]"), lit(0)))
      .withColumn("n", size(col("cs")))
      .withColumn("ds", array_sort(array_distinct(col("cs"))))
      .select(col("doc_id"),
        col("n").cast("long").as("n_units"),
        size(col("ds")).cast("long").as("n_distinct"),
        when(col("n") === 0, lit(0.0)).otherwise(round(
          aggregate(col("ds"), lit(0.0), (acc, c) => {
            val cnt = size(filter(col("cs"), x => x === c)).cast("double")
            acc + cnt / col("n") * log(col("n") / cnt)
          }), 6)).as("char_entropy"))
      .orderBy(col("doc_id"))

  val charEntropySql: String =
    """WITH b AS (
      |  SELECT doc_id, regexp_extract_all(text, '[\s\S]') AS cs FROM documents),
      |s AS (
      |  SELECT doc_id, cs, len(cs) AS n, list_sort(list_distinct(cs)) AS ds FROM b)
      |SELECT doc_id, n::BIGINT AS n_units, len(ds)::BIGINT AS n_distinct,
      |  CASE WHEN n = 0 THEN 0.0 ELSE round(list_reduce(
      |    list_transform(ds, c -> len(list_filter(cs, x -> x = c))::DOUBLE / n
      |                         * ln(n::DOUBLE / len(list_filter(cs, x -> x = c)))),
      |    (a, b) -> a + b), 6) END AS char_entropy
      |FROM s ORDER BY doc_id""".stripMargin

  /** C22 `text_repetition`: Gopher-style repetition signals — the
    * quality-filter family that drops boilerplate/spam by how much of
    * a document repeats itself: duplicate-line, duplicate-paragraph,
    * duplicate-word and duplicate-2/3-gram fractions (each =
    * (total − distinct) / total over the respective units). A narrow
    * per-doc map with zero shuffles; the n-gram units ride the codegen
    * [[graft.functions.exprs.shingleHashes]] kernel (64-bit hashes) so
    * the hot path never materializes n-gram strings — the oracle
    * recomputes over string n-grams, which agrees because the hash is
    * injective on real corpora.
    */
  def repetitionOf(docs: DataFrame): DataFrame = {
    def dupFrac(arr: Column): Column =
      when(size(arr) === 0, lit(0.0))
        .otherwise(round((size(arr) - size(array_distinct(arr)))
          .cast("double") / size(arr), 6))
    docs.select(col("doc_id"),
      dupFrac(split(col("text"), "\n")).as("dup_line_frac"),
      dupFrac(split(col("text"), "\n\n")).as("dup_para_frac"),
      dupFrac(tokens(col("text"))).as("dup_word_frac"),
      dupFrac(exprs.shingleHashesAll(col("text"), 2)).as("dup_2gram_frac"),
      dupFrac(exprs.shingleHashesAll(col("text"), 3)).as("dup_3gram_frac"))
      .orderBy(col("doc_id"))
  }

  def repetition(s: SparkSession, d: String): DataFrame =
    repetitionOf(Tables.documents(s, d))

  val repetitionSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, string_split(text, chr(10)) AS ls,
       |         string_split(text, chr(10) || chr(10)) AS ps,
       |         $tokensSql AS w
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, ls, ps, w,
       |    CASE WHEN len(w) >= 2
       |      THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
       |      ELSE [] END AS g2,
       |    CASE WHEN len(w) >= 3
       |      THEN list_transform(range(1, len(w) - 1),
       |             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |      ELSE [] END AS g3
       |  FROM base)
       |SELECT doc_id,
       |  CASE WHEN len(ls) = 0 THEN 0.0 ELSE
       |    round((len(ls) - len(list_distinct(ls))) / len(ls)::DOUBLE, 6) END AS dup_line_frac,
       |  CASE WHEN len(ps) = 0 THEN 0.0 ELSE
       |    round((len(ps) - len(list_distinct(ps))) / len(ps)::DOUBLE, 6) END AS dup_para_frac,
       |  CASE WHEN len(w) = 0 THEN 0.0 ELSE
       |    round((len(w) - len(list_distinct(w))) / len(w)::DOUBLE, 6) END AS dup_word_frac,
       |  CASE WHEN len(g2) = 0 THEN 0.0 ELSE
       |    round((len(g2) - len(list_distinct(g2))) / len(g2)::DOUBLE, 6) END AS dup_2gram_frac,
       |  CASE WHEN len(g3) = 0 THEN 0.0 ELSE
       |    round((len(g3) - len(list_distinct(g3))) / len(g3)::DOUBLE, 6) END AS dup_3gram_frac
       |FROM g ORDER BY doc_id""".stripMargin

  /** C24 `corpus_filter`: the composed keep/drop gate a training-data
    * pipeline runs ahead of dedup — Gopher-style rules over the same
    * signal definitions as [[quality]] and [[repetitionOf]], evaluated
    * in a fixed precedence so every dropped doc carries ONE
    * deterministic reason. A narrow per-row map (zero shuffles): at
    * 100 TB this is the cheapest pass in the pipeline and the one that
    * pays for every later stage by shrinking the corpus first.
    * Thresholds are the classic ones: ≥5 and ≤5000 words, punctuation
    * ≤30 % of chars, ≥1 % English stopwords, ≤30 % duplicate
    * lines/3-grams.
    */
  def corpusFilterOf(docs: DataFrame): DataFrame =
    corpusFilterCore(docs).orderBy(col("doc_id"))

  /** [[corpusFilterOf]] without the output ordering — safe inside an
    * append-mode streaming query (D8), where a global sort is illegal.
    */
  def corpusFilterCore(docs: DataFrame): DataFrame = {
    val punct = length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))
    def dupFrac(arr: Column): Column =
      when(size(arr) === 0, lit(0.0))
        .otherwise(round((size(arr) - size(array_distinct(arr)))
          .cast("double") / size(arr), 6))
    docs.withColumn("toks", tokens(col("text")))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("punct_ratio", round(
        punct.cast("double") / greatest(length(col("text")).cast("long"), lit(1L)), 6))
      .withColumn("stop_ratio", round(
        size(filter(col("toks"), t => array_contains(array(stopEn.map(lit): _*), t)))
          .cast("double") / greatest(col("n_words"), lit(1L)), 6))
      .withColumn("dup_line_frac", dupFrac(split(col("text"), "\n")))
      .withColumn("dup_3gram_frac", dupFrac(exprs.shingleHashesAll(col("text"), 3)))
      .withColumn("reason",
        when(col("n_words") < 5, "too_short")
          .when(col("n_words") > 5000, "too_long")
          .when(col("punct_ratio") > 0.3, "high_punct")
          .when(col("stop_ratio") < 0.01, "low_stopword")
          .when(col("dup_line_frac") > 0.3, "repetitive_lines")
          .when(col("dup_3gram_frac") > 0.3, "repetitive_ngrams")
          .otherwise("ok"))
      .select(col("doc_id"), (col("reason") === "ok").as("keep"), col("reason"))
  }

  def corpusFilter(s: SparkSession, d: String): DataFrame =
    corpusFilterOf(Tables.documents(s, d))

  val corpusFilterSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, length(text) AS n_chars,
       |    length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS punct,
       |    $tokensSql AS toks,
       |    string_split(text, chr(10)) AS ls
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, ls, toks, n_chars, punct,
       |    CASE WHEN len(toks) >= 3
       |      THEN list_transform(range(1, len(toks) - 1),
       |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |      ELSE [] END AS g3
       |  FROM t),
       |r AS (
       |  SELECT doc_id, len(toks) AS n_words,
       |    round(punct * 1.0 / greatest(n_chars, 1), 6) AS punct_ratio,
       |    round(len(list_filter(toks, x -> list_contains(${sqlList(stopEn)}, x))) * 1.0
       |          / greatest(len(toks), 1), 6) AS stop_ratio,
       |    CASE WHEN len(ls) = 0 THEN 0.0 ELSE
       |      round((len(ls) - len(list_distinct(ls))) / len(ls)::DOUBLE, 6) END AS dup_line_frac,
       |    CASE WHEN len(g3) = 0 THEN 0.0 ELSE
       |      round((len(g3) - len(list_distinct(g3))) / len(g3)::DOUBLE, 6) END AS dup_3gram_frac
       |  FROM g),
       |rr AS (
       |  SELECT doc_id,
       |    CASE WHEN n_words < 5 THEN 'too_short'
       |         WHEN n_words > 5000 THEN 'too_long'
       |         WHEN punct_ratio > 0.3 THEN 'high_punct'
       |         WHEN stop_ratio < 0.01 THEN 'low_stopword'
       |         WHEN dup_line_frac > 0.3 THEN 'repetitive_lines'
       |         WHEN dup_3gram_frac > 0.3 THEN 'repetitive_ngrams'
       |         ELSE 'ok' END AS reason
       |  FROM r)
       |SELECT doc_id, reason = 'ok' AS keep, reason FROM rr ORDER BY doc_id""".stripMargin

  /** C25 `text_dup_spans`: repeated-substring exposure per document —
    * the token-granular form of the ExactSubstr signal (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better"): the
    * fraction of a document's 20-token grams that occur at least twice
    * in the whole corpus (counting repeats inside the same document —
    * self-plagiarism is still duplication). Shape at 100 TB: explode →
    * one partial-agg groupBy on the 64-bit gram hash → one hash-keyed
    * join back → per-doc count. Shuffle keys are 8-byte hashes, never
    * 20-gram strings; the repeated-gram table is a small fraction of
    * the gram stream and AQE broadcasts it. The oracle recomputes over
    * gram strings (injective-hash argument, as `text_repetition`).
    */
  def dupSpansOf(docs: DataFrame): DataFrame = {
    // gram stream materialized ONCE (fault-tolerant persist, graft.Mat)
    // so the repeated-gram table and the per-doc tally share one gram
    // chain (the r13 goal). Multiplicity comes from a map-side-combined
    // groupBy joined back on the hash — NOT the r13 count window, which
    // buffered every instance of exactly the hot repeated grams in one
    // window task (AQE skew handling applies to joins, never windows —
    // guide §2.5; the repeated-gram table is a small fraction of the
    // stream, so AQE broadcasts the join-back). is_rep per instance ≡
    // cnt ≥ 2, identical row for row.
    val grams = Mat.fact(docs.select(col("doc_id"),
      explode(exprs.shingleHashesAll(col("text"), 20)).as("sh"))
      .repartition(col("sh")))
    val rep = grams.groupBy(col("sh")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select(col("sh"), lit(true).as("is_rep"))
    docs.select(col("doc_id"))
      .join(grams.join(rep, Seq("sh"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("is_rep").isNotNull, 1L).otherwise(0L)).as("n_rep")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_rep"), lit(0L)).as("n_rep"),
        round(coalesce(col("n_rep"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_grams"), lit(0L)), lit(1L)), 6).as("rep_frac"))
      .orderBy(col("doc_id"))
  }

  def dupSpans(s: SparkSession, d: String): DataFrame =
    dupSpansOf(Tables.documents(s, d))

  val dupSpansSql: String = {
    val gram20 = (0 until 20).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    s"""WITH w AS (SELECT doc_id, $tokensSql AS t FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(CASE WHEN len(t) >= 20
       |    THEN list_transform(range(1, len(t) - 18), i -> $gram20)
       |    ELSE [] END) AS sh
       |  FROM w),
       |rep AS (SELECT sh FROM g GROUP BY sh HAVING count(*) >= 2),
       |agg AS (
       |  SELECT g.doc_id, count(*) AS n_grams,
       |    count(*) FILTER (WHERE rep.sh IS NOT NULL) AS n_rep
       |  FROM g LEFT JOIN rep ON g.sh = rep.sh
       |  GROUP BY g.doc_id)
       |SELECT w.doc_id,
       |  coalesce(n_grams, 0) AS n_grams,
       |  coalesce(n_rep, 0) AS n_rep,
       |  round(coalesce(n_rep, 0) * 1.0 / greatest(coalesce(n_grams, 0), 1), 6) AS rep_frac
       |FROM w LEFT JOIN agg ON w.doc_id = agg.doc_id
       |ORDER BY w.doc_id""".stripMargin
  }

  /** C21 `text_contamination`: train/benchmark overlap detection — the
    * decontamination pass LLM training sets run against eval sets
    * (13-token-gram collision, the GPT-3 recipe). Benchmark docs here
    * are `doc_id % 10 == 0`; a train doc is flagged with the number of
    * benchmark docs it shares a 13-gram with and the total collision
    * count. Inverted-index join on 64-bit shingle hashes — shuffle is
    * O(shared shingles), never O(docs²); at 100 TB the benchmark side
    * is tiny and broadcasts.
    */
  def contamination(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(s, d)
      .select(col("doc_id"), explode(exprs.shingleHashes(col("text"), 13)).as("sh"))
    val bench = sh.filter(col("doc_id") % 10 === 0)
      .select(col("sh"), col("doc_id").as("bench_id"))
    val train = sh.filter(col("doc_id") % 10 =!= 0)
      .select(col("sh"), col("doc_id").as("train_id"))
    train.join(bench, "sh")
      .groupBy(col("train_id"))
      .agg(countDistinct(col("bench_id")).as("n_bench_docs"),
        count(lit(1)).as("n_hits"))
      .orderBy(col("train_id"))
  }

  val contaminationSql: String = {
    val gram13 = (0 until 13).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    s"""WITH w AS (SELECT doc_id, $tokensSql AS t FROM documents),
       |g AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 13
       |    THEN list_transform(range(1, len(t) - 11), i -> $gram13)
       |    ELSE [] END) AS shs
       |  FROM w),
       |s AS (SELECT doc_id, unnest(shs) AS sh FROM g),
       |bench AS (SELECT doc_id AS bench_id, sh FROM s WHERE doc_id % 10 = 0),
       |train AS (SELECT doc_id AS train_id, sh FROM s WHERE doc_id % 10 <> 0)
       |SELECT train_id, count(DISTINCT bench_id) AS n_bench_docs, count(*) AS n_hits
       |FROM train JOIN bench USING (sh)
       |GROUP BY train_id ORDER BY train_id""".stripMargin
  }

  /** C17 `text_tfidf`: top-3 keywords per document by tf·idf
    * (idf = ln(N/df)). Two partial-agg-friendly shuffles (doc×term
    * counts, then term document-frequencies) + one term-keyed join +
    * one per-doc window — every stage is keyed, none is O(corpus²).
    * At 100 TB the df table is vocabulary-sized; the term join stays a
    * shuffle join (AQE may broadcast if the vocab is small). Scores
    * are rounded to 6 dp BEFORE ranking and ties broken by term, so
    * the top-k set is deterministic and engine-independent.
    */
  def tfidf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    // corpus size rides the same DAG as a broadcast 1-row aggregate —
    // no separate count() job before the real work starts
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    // tf materializes ONCE (fault-tolerant persist) and document
    // frequency rolls up from it with a map-side-combined groupBy
    // joined back on term (tf is unique per (doc, term), so
    // count-per-term ≡ df). r13 computed df as a count window over tf,
    // which put every row of a hot term (stopwords — the most frequent
    // keys in any corpus) into ONE window task; AQE skew handling
    // applies to the join-back but never to windows (guide §2.5), and
    // the partial aggregation collapses hot keys map-side. The df
    // aggregation + join of r12 planned the tokenize+groupBy subtree
    // twice; the cache keeps it at one pass.
    val tf = Mat.factRows(docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfT, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk").cast("long").as("rk"),
        col("term"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  val tfidfSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |scored AS (
       |  SELECT doc_id, term, round(tf * ln(n.n * 1.0 / df), 6) AS score
       |  FROM tf JOIN df USING (term), n),
       |rk AS (
       |  SELECT doc_id, term, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
       |  FROM scored)
       |SELECT doc_id, rk::BIGINT AS rk, term, score FROM rk
       |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** C38 `text_chunk`: per-document overlapping-window chunking — the
    * RAG/context-prep counterpart of C32's cross-document packing:
    * each document's token stream is cut into windows of 64 tokens
    * with a 48-token stride (16-token overlap), so retrieval snippets
    * never lose boundary context. Pure narrow ops: tokenize → integer
    * chunk-count arithmetic → `explode(sequence)` → `slice` — zero
    * shuffles, zero UDFs, embarrassingly parallel over documents at
    * any scale (the per-row fanout is bounded by doc length / stride).
    */
  def textChunk(s: SparkSession, d: String): DataFrame = {
    val chunk = 64
    val stride = 48
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")))
    toks
      .withColumn("max_chunk",
        when(col("n") <= chunk, lit(0))
          .otherwise(expr(s"(n - $chunk + ${stride - 1}) div $stride").cast("int")))
      .withColumn("chunk_id", explode(sequence(lit(0), col("max_chunk"))))
      .withColumn("piece", slice(col("t"), col("chunk_id") * stride + 1, lit(chunk)))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(col("piece")).cast("long").as("n_toks"),
        concat_ws(" ", col("piece")).as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val textChunkSql: String =
    s"""WITH w AS (SELECT doc_id, $tokensSql AS t FROM documents),
       |c AS (
       |  SELECT doc_id, t,
       |    unnest(range(0, 1 + CASE WHEN len(t) <= 64 THEN 0
       |      ELSE (len(t) - 64 + 47) // 48 END)) AS chunk_id
       |  FROM w)
       |SELECT doc_id, chunk_id,
       |  len(t[chunk_id*48 + 1 : chunk_id*48 + 64]) AS n_toks,
       |  coalesce(list_aggregate(t[chunk_id*48 + 1 : chunk_id*48 + 64],
       |    'string_agg', ' '), '') AS chunk_text
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  /** C41 `text_bpe_pairs`: adjacent-character-pair frequencies over
    * the tokenized corpus — the inner statistic of BPE tokenizer
    * TRAINING (each merge step picks the most frequent adjacent pair;
    * this computes step one exactly, GPT-2-style within-word pairs).
    * Shape at 100 TB: narrow per-row maps fanning out to pairs, then
    * ONE partial-aggregated groupBy over a tiny key domain (≤ |Σ|²
    * distinct pairs) — map-side combine collapses virtually all of
    * the volume before the shuffle, so the reduce side is constant.
    * Iterating merges re-runs this over re-segmented tokens; the
    * per-iteration cost stays one such pass.
    */
  def bpePairs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)

  val bpePairsSql: String =
    s"""WITH toks AS (SELECT unnest($tokensSql) AS w FROM documents),
       |pairs AS (
       |  SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pair
       |  FROM toks WHERE length(w) >= 2)
       |SELECT pair, count(*) AS n FROM pairs
       |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin

  /** C32 `sample_pack`: concat-and-chunk sequence packing — the
    * GPT-style training-prep step that concatenates token streams in a
    * fixed document order and slices them into fixed-budget sequences
    * (B = 256 tokens here), letting documents span sequence boundaries.
    * Each document maps to (start_seq, end_seq, offset) purely from the
    * running token count before it, so the whole op is ONE window over
    * a shard key: shard = portable-hash(doc_id) % NShards, cumulative
    * sum ordered by doc_id within the shard.
    *
    * Scale shape: packing is embarrassingly parallel ACROSS shards and
    * inherently sequential WITHIN one (each offset depends on every
    * predecessor), so the shard count is the parallelism dial — at
    * 100 TB you run ~10⁴ shards of a few GB each, one sorted window
    * task per shard, and sequence ids are (shard, seq) pairs. Zero dp
    * divergence risk: every output is integer arithmetic.
    */
  def samplePack(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 256L
    val docs = Tables.documents(s, d)
      .withColumn("n_tokens",
        size(filter(split(col("text"), "[ \\t\\n\\x0B\\f\\r]+"), t => length(t) > 0)).cast("long"))
      .withColumn("shard",
        pmod(col("doc_id") * lit(2654435761L), lit(1000000007L)) % 8)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("tok_start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // empty docs (n_tokens = 0) still land in ONE sequence: floor of
      // (tok_start + max(n,1) - 1) keeps end_seq >= start_seq
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor(col("tok_start") / lit(budget.toDouble)).cast("long").as("start_seq"),
        floor((col("tok_start") + greatest(col("n_tokens"), lit(1L)) - 1L)
          / lit(budget.toDouble)).cast("long").as("end_seq"),
        pmod(col("tok_start"), lit(budget)).as("tok_offset"))
      .orderBy(col("doc_id"))
  }

  val samplePackSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'), x -> x <> '')) AS n_tokens,
      |    (doc_id * 2654435761) % 1000000007 % 8 AS shard
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, shard, n_tokens,
      |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
      |  FROM t)
      |SELECT doc_id, shard, n_tokens,
      |  CAST(floor(tok_start / 256.0) AS BIGINT) AS start_seq,
      |  CAST(floor((tok_start + greatest(n_tokens, 1) - 1) / 256.0) AS BIGINT) AS end_seq,
      |  CAST(tok_start % 256 AS BIGINT) AS tok_offset
      |FROM c ORDER BY doc_id""".stripMargin

  /** C33 `sample_stratified`: exact proportional stratified sampling —
    * keep ceil(25 %) of every `lang` stratum, picked deterministically
    * by portable-hash order (hash, doc_id tie-break), so every engine
    * and every re-run selects the identical rows and each stratum's
    * allocation is EXACT, not expected-value. The integer guard
    * `rn·4 ≤ cnt+3` is ceil(cnt/4) without any division.
    *
    * Scale shape: the corpus is never fully sorted. Because the hash is
    * uniform, a `h < 1.5·f·MOD` prefilter (a narrow map, no shuffle)
    * admits ~1.5× the target before the per-stratum rank window, so the
    * sort sees ~37 % of rows instead of all of them; kept ranks are
    * provably identical because whenever ≥ k_l rows survive, the k_l
    * globally-lowest hashes are all below the threshold and their
    * relative order is unchanged. A per-stratum safety check (tiny
    * aggregate) folds any stratum with < k_l survivors — possible only
    * on a pathological hash distribution — back to the full-rank
    * fallback by lifting its threshold to MOD (admit-everything).
    *
    * Plan shape: the |langs|-row quota/threshold table is collected
    * once (bounded by construction) and injected as a plan-constant
    * [[graft.functions.ConstLongLookup]], so the corpus-side plan is
    * scan → narrow filter → one rank window — no broadcast join whose
    * tiny apportionment subtree gets re-planned per reference.
    */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val Mod = 1000000007L
    // ceil(1.5 * 0.25 * MOD): overshoot 1.5 over the 25 % keep rate
    val thr = 375000003L
    // project to the 3 needed columns up front: the rank window's
    // shuffle moves (id, lang, h), never the document bodies
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        pmod(col("doc_id") * lit(2654435761L), lit(Mod)).as("h"))
    // k_l = ceil(cnt/4); |langs| rows collected (bounded by construction)
    val kMap = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getString(0) -> (r.getLong(1) + 3L) / 4L).toMap
    // safety probe: strata where < k_l rows clear the prefilter lift
    // their threshold to MOD — the single-filter equivalent of the
    // full-rank fallback branch
    val scnt = docs.filter(col("h") < thr).groupBy(col("lang"))
      .agg(count(lit(1)).as("scnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val effThr = kMap.map { case (l, k) =>
      l -> (if (scnt.getOrElse(l, 0L) >= k) thr else Mod) }
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    docs.filter(col("h") < exprs.constLookup(col("lang"), effThr, Mod))
      .withColumn("pick_rank", row_number().over(w).cast("long"))
      .filter(col("pick_rank") <= exprs.constLookup(col("lang"), kMap, 0L))
      .select(col("doc_id"), col("lang"), col("pick_rank"))
      .orderBy(col("lang"), col("pick_rank"))
  }

  val sampleStratifiedSql: String =
    """WITH h AS (
      |  SELECT doc_id, lang, (doc_id * 2654435761) % 1000000007 AS h FROM documents),
      |r AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS cnt
      |  FROM h)
      |SELECT doc_id, lang, CAST(rn AS BIGINT) AS pick_rank FROM r
      |WHERE rn * 4 <= cnt + 3 ORDER BY lang, pick_rank""".stripMargin

  /** C34 `corpus_domain_cap`: per-source document cap (the per-domain
    * cap every crawl pipeline applies so a handful of giant domains
    * can't dominate the training mix) — keep at most 8 docs per
    * source, chosen by portable-hash order.
    *
    * The plan is deliberately two-branch: a tiny per-source count
    * (partial-agg shuffle on the domain key) splits sources into
    * under-cap — which pass through with NO sort at all — and over-cap,
    * which alone pay the rank. At crawl scale that's the difference
    * between sorting the whole corpus and sorting only the heavy-hitter
    * domains' slice; the under-cap majority stays a narrow scan. The
    * membership joins broadcast the domain list (O(#domains) rows).
    */
  def domainCap(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cap = 8L
    val docs = Tables.documents(s, d)
    val over = docs.groupBy(col("source")).agg(count(lit(1)).as("src_cnt"))
      .filter(col("src_cnt") > cap).select("source")
    val under = docs.join(broadcast(over), Seq("source"), "left_anti")
      .select(col("doc_id"), col("source"))
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    val capped = docs.join(broadcast(over), Seq("source"))
      .withColumn("h", pmod(col("doc_id") * lit(2654435761L), lit(1000000007L)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .select(col("doc_id"), col("source"))
    under.union(capped).orderBy(col("source"), col("doc_id"))
  }

  val domainCapSql: String =
    """WITH h AS (
      |  SELECT doc_id, source, (doc_id * 2654435761) % 1000000007 AS h FROM documents),
      |r AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
      |  FROM h)
      |SELECT doc_id, source FROM r WHERE rn <= 8 ORDER BY source, doc_id""".stripMargin

  /** C39 `text_nb_quality`: model-based quality filtering — the
    * fastText-classifier family (GPT-3/LLaMA-style "looks like curated
    * text vs crawl" gate), as a multinomial Naive Bayes log-likelihood
    * ratio trained IN THE SAME DAG it scores with. The "curated" class
    * is the deterministic source whitelist (src0-src3 stand in for the
    * wiki/books side of the real pipeline). Training is one
    * conditional aggregation over the token stream (per-term class
    * counts, map-side combined); scoring joins each token against the
    * learned weight table and sums per doc. All counts are integers,
    * so the smoothed probabilities are identical doubles on both
    * engines; per-term log-weights quantize to 6 dp BEFORE the sum
    * (C20's order-independence trick) and the final score re-rounds to
    * snap accumulation noise. At 100 TB: two keyed shuffles (term agg,
    * doc agg) + one term join — the tf·idf scale shape; the weight
    * table is |vocab|-sized and AQE picks its join side.
    */
  def nbQuality(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("pos", col("source").isin("src0", "src1", "src2", "src3"))
    // both materializations are r13 optimizations: the unchecked DAG
    // planned the tokenize+explode chain four times (termCounts,
    // totals, weights, scoring join) with no exchange reuse. The
    // materializations preserve the numeric structure exactly — same
    // multiset of per-instance addends, only computed once. r14 swaps
    // both localCheckpoints for fault-tolerant persists (graft.Mat);
    // the vocab-sized termCounts one is lazy — totals and weights run
    // in the same action, so the first leg populates the cache with no
    // extra materialization job (the un-amortized checkpoint job was
    // the r13 sf0.1 regression on this entry).
    val toks = Mat.factRows(docs.select(col("doc_id"), col("pos"),
      explode(tokens(col("text"))).as("term")))
    val termCounts = Mat.factRows(toks.groupBy(col("term")).agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("cn")))
    val totals = termCounts.agg(
      sum(col("cp")).cast("double").as("totp"),
      sum(col("cn")).cast("double").as("totn"),
      count(lit(1)).cast("double").as("v"))
    val weights = termCounts.crossJoin(broadcast(totals))
      .select(col("term"),
        (round(log((col("cp").cast("double") + lit(1.0)) / (col("totp") + col("v"))), 6) -
         round(log((col("cn").cast("double") + lit(1.0)) / (col("totn") + col("v"))), 6))
          .as("w"))
    // add-1 smoothed prior: an all-positive (or all-negative) corpus
    // would otherwise produce ln(0)/division-by-zero and poison every
    // llr with NULL/-Inf instead of degrading gracefully
    val priors = docs.agg(
      round(log((sum(when(col("pos"), 1L).otherwise(0L)).cast("double") + lit(1.0)) /
                (sum(when(col("pos"), 0L).otherwise(1L)).cast("double") + lit(1.0))), 6)
        .as("prior"))
    toks.join(weights, "term")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("llr0"))
      .crossJoin(broadcast(priors))
      .select(col("doc_id"), col("n_toks"),
        round(col("llr0") + col("prior"), 6).as("llr"),
        (round(col("llr0") + col("prior"), 6) > 0.0).as("keep"))
      .orderBy(col("doc_id"))
  }

  val nbQualitySql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, text, source IN ('src0','src1','src2','src3') AS pos
       |  FROM documents),
       |toks AS (SELECT doc_id, pos, unnest($tokensSql) AS term FROM docs),
       |tc AS (
       |  SELECT term,
       |    sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cp,
       |    sum(CASE WHEN pos THEN 0 ELSE 1 END) AS cn
       |  FROM toks GROUP BY term),
       |tot AS (
       |  SELECT CAST(sum(cp) AS DOUBLE) AS totp, CAST(sum(cn) AS DOUBLE) AS totn,
       |    CAST(count(*) AS DOUBLE) AS v FROM tc),
       |w AS (
       |  SELECT term,
       |    round(ln((CAST(cp AS DOUBLE) + 1.0) / (totp + v)), 6) -
       |    round(ln((CAST(cn AS DOUBLE) + 1.0) / (totn + v)), 6) AS w
       |  FROM tc, tot),
       |pr AS (
       |  SELECT round(ln((CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE) + 1.0) /
       |                 (CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS DOUBLE) + 1.0)), 6) AS prior
       |  FROM docs)
       |SELECT doc_id, count(*) AS n_toks,
       |  round(sum(w) + pr.prior, 6) AS llr,
       |  round(sum(w) + pr.prior, 6) > 0.0 AS keep
       |FROM toks JOIN w USING (term), pr
       |GROUP BY doc_id, pr.prior ORDER BY doc_id""".stripMargin

  /** C79 `text_lr_quality`: DISCRIMINATIVE model-based quality
    * filtering — the fastText-classifier recipe (Joulin et al. 2016;
    * the CCNet/LLaMA data pipelines train exactly this shape) as a
    * linear model over term counts, trained IN SPARK by [[LrIters]]
    * unrolled iterations of full-batch gradient descent. Complements
    * C39's generative Naive Bayes: same planted labels (source
    * whitelist), but weights learned by minimizing prediction error
    * instead of counting, so correlated terms stop double-counting.
    *
    * Every arithmetic step is chosen to be BIT-IDENTICAL across
    * engines, which is what lets a 3-iteration training loop oracle
    * exactly in DuckDB:
    *  - the sigmoid is the ALGEBRAIC σ̃(s) = ½(1 + s/(1+|s|)) — no
    *    exp(), whose last-ulp differs between libm and the JVM;
    *    +, −, ×, / are IEEE correctly-rounded and identical;
    *  - per-doc errors and weights live on the integer millionth grid
    *    (floor(x·10⁶), floor deterministic), so every SUM is an exact
    *    integer sum — order-independent at any parallelism
    *    (the C64 quantize-before-sum trick);
    *  - gradient sums ride decimal(38,0) (a long would overflow near
    *    10⁹ docs × 10⁹ per-row products).
    *
    * Scale shape: the token table materializes once (localCheckpoint,
    * the C65 cache-before-multi-pass pattern) and each iteration is
    * one |vocab|-keyed join + two keyed aggregations — no broadcast of
    * the weight table (vocab is unbounded; AQE picks sides), no
    * driver-side math beyond the doc count. Weights checkpoint per
    * iteration: without it iteration k's plan re-executes every prior
    * iteration twice (each wᵢ feeds both the scoring join and the
    * update), going exponential in depth.
    */
  val LrIters = 5
  val LrEta = 0.2

  def lrQuality(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("y", when(col("source").isin("src0", "src1", "src2", "src3"),
        lit(1.0)).otherwise(lit(0.0)))
    // fault-tolerant persist of the fact-sized token table (r14); the
    // per-iteration weight tables below keep localCheckpoint — they are
    // vocab-sized and the TRUNCATION is the point (without it iteration
    // k's plan re-executes every prior iteration twice)
    val toks = Mat.factRows(docs
      .select(col("doc_id"), col("y"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("y"), col("term"))
      .agg(count(lit(1)).as("tf")))
    val n = toks.select(col("doc_id")).distinct().count()
    val sig = (sm: Column) => {
      val sr = sm.cast("double") / lit(1000000.0)
      lit(0.5) * (lit(1.0) + sr / (lit(1.0) + abs(sr)))
    }
    var w: DataFrame = null // (term, wm) — weights in millionths
    for (_ <- 1 to LrIters) {
      val em = {
        val scored =
          if (w == null)
            toks.select(col("doc_id"), col("y")).distinct()
              .withColumn("sm", lit(0L))
          else toks.join(w, Seq("term"), "left_outer")
            .groupBy(col("doc_id"), col("y"))
            .agg(sum(col("tf") * coalesce(col("wm"), lit(0L))).as("sm"))
        scored.select(col("doc_id"),
          floor((sig(col("sm")) - col("y")) * lit(1000000.0)).as("em"))
      }
      val grad = toks.join(em, "doc_id")
        .groupBy(col("term"))
        .agg(sum((col("tf") * col("em")).cast("decimal(38,0)")).as("gm"))
        .select(col("term"),
          floor(lit(LrEta) * col("gm").cast("double") / lit(n.toDouble)).as("dm"))
      w = (if (w == null) grad.select(col("term"), (-col("dm")).as("wm"))
           else w.join(grad, Seq("term"), "full_outer")
             .select(col("term"),
               (coalesce(col("wm"), lit(0L)) - coalesce(col("dm"), lit(0L))).as("wm")))
        .localCheckpoint(true)
    }
    toks.join(w, Seq("term"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_toks"),
        sum(col("tf") * coalesce(col("wm"), lit(0L))).as("score_m"))
      .select(col("doc_id"), col("n_toks"), col("score_m"),
        (col("score_m") > 0L).as("keep"))
      .orderBy(col("doc_id"))
  }

  val lrQualitySql: String = {
    // the GD iterations unroll as generated CTE chains; arithmetic
    // mirrors the Spark side op for op (algebraic sigmoid, millionth
    // grid, floor, eta)
    val sig = (x: String) => s"(0.5 * (1.0 + ($x) / (1.0 + abs($x))))"
    def gradCte(i: Int, eSrc: String) =
      s"""g$i AS (
         |  SELECT term, CAST(floor($LrEta * CAST(sum(CAST(tf * em AS DECIMAL(38,0))) AS DOUBLE) / n.n)
         |         AS BIGINT) AS dm
         |  FROM toks JOIN $eSrc USING (doc_id), n GROUP BY term, n.n)"""
    val iters = (2 to LrIters).map { i =>
      s"""s$i AS (
         |  SELECT doc_id, any_value(y) AS y, sum(tf * coalesce(wm, 0)) AS sm
         |  FROM toks LEFT JOIN w${i - 1} USING (term) GROUP BY doc_id),
         |e$i AS (
         |  SELECT doc_id, CAST(floor((${sig(s"CAST(sm AS DOUBLE) / 1000000.0")} - y)
         |    * 1000000.0) AS BIGINT) AS em FROM s$i),
         |${gradCte(i, s"e$i")},
         |w$i AS (
         |  SELECT term, coalesce(wm, 0) - coalesce(dm, 0) AS wm
         |  FROM w${i - 1} FULL OUTER JOIN g$i USING (term))"""
    }.mkString(",\n")
    s"""WITH docs AS (
       |  SELECT doc_id, text,
       |    CASE WHEN source IN ('src0','src1','src2','src3')
       |         THEN 1.0 ELSE 0.0 END AS y
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, y, term, count(*) AS tf
       |  FROM (SELECT doc_id, y, unnest($tokensSql) AS term FROM docs)
       |  GROUP BY doc_id, y, term),
       |n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM toks),
       |e1 AS (
       |  SELECT doc_id, CAST(floor((0.5 - y) * 1000000.0) AS BIGINT) AS em
       |  FROM (SELECT DISTINCT doc_id, y FROM toks)),
       |${gradCte(1, "e1")},
       |w1 AS (SELECT term, -dm AS wm FROM g1),
       |$iters
       |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks,
       |  CAST(sum(tf * coalesce(wm, 0)) AS BIGINT) AS score_m,
       |  sum(tf * coalesce(wm, 0)) > 0 AS keep
       |FROM toks LEFT JOIN w$LrIters USING (term)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** C43 `sample_importance`: DSIR-style importance resampling (Xie et
    * al. 2023, "Data Selection for Language Models via Importance
    * Resampling") — reweight a raw corpus toward a target distribution
    * using unigram bag-of-features LMs, then draw a fixed-size sample
    * WITHOUT replacement via the Gumbel-top-k trick. Target here is the
    * lang='en' slice; the importance weight of a doc is
    * Σ_t [round(ln p_tgt(t),6) − round(ln p_raw(t),6)] (add-1 smoothed,
    * quantized per token so the sum is order-independent). The Gumbel
    * key adds −ln(−ln(u)) where u comes from the Knuth multiplicative
    * hash of doc_id — integer arithmetic both engines compute exactly,
    * no RNG state, reproducible at any parallelism. Selection is
    * orderBy(key).limit(k) → TakeOrderedAndProject: no global sort at
    * 100 TB, each partition keeps its local top-k.
    */
  val ImportanceK = 200
  def sampleImportance(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // one tokenize pass + one vocab-table pass (r13 optimization, the
    // nbQuality pattern: the unchecked DAG planned tokenize 3× and the
    // term counts 2× with no exchange reuse; r14: fault-tolerant
    // persists, the vocab-sized one lazy — see nbQuality)
    val toks = Mat.factRows(docs.select(col("doc_id"), col("lang"),
      explode(tokens(col("text"))).as("term")))
    val termCounts = Mat.factRows(toks.groupBy(col("term")).agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr")))
    val totals = termCounts.agg(
      sum(col("ct")).cast("double").as("tott"),
      sum(col("cr")).cast("double").as("totr"),
      count(lit(1)).cast("double").as("v"))
    val weights = termCounts.crossJoin(broadcast(totals))
      .select(col("term"),
        (round(log((col("ct").cast("double") + lit(1.0)) / (col("tott") + col("v"))), 6) -
         round(log((col("cr").cast("double") + lit(1.0)) / (col("totr") + col("v"))), 6))
          .as("w"))
    val scored = toks.join(weights, "term")
      .groupBy(col("doc_id"))
      .agg(round(sum(col("w")), 6).as("weight"))
    // u ∈ (0,1) exactly: (h+1)/(p+1) with h = Knuth hash mod p. doc_id
    // reduces mod p BEFORE the multiply so the widest intermediate is
    // (p−1)·2654435761 ≈ 2.7e18 < 2^63 — no overflow at any corpus id.
    val u = (pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L) + lit(12345L),
      lit(1000000007L)).cast("double") + lit(1.0)) / lit(1000000008.0)
    scored
      .withColumn("gkey", round(col("weight") - log(-log(u)), 6))
      .orderBy(col("gkey").desc, col("doc_id"))
      .limit(ImportanceK)
  }

  val sampleImportanceSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, unnest($tokensSql) AS term FROM documents),
       |tc AS (
       |  SELECT term,
       |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct,
       |    count(*) AS cr
       |  FROM toks GROUP BY term),
       |tot AS (
       |  SELECT CAST(sum(ct) AS DOUBLE) AS tott, CAST(sum(cr) AS DOUBLE) AS totr,
       |    CAST(count(*) AS DOUBLE) AS v FROM tc),
       |w AS (
       |  SELECT term,
       |    round(ln((CAST(ct AS DOUBLE) + 1.0) / (tott + v)), 6) -
       |    round(ln((CAST(cr AS DOUBLE) + 1.0) / (totr + v)), 6) AS w
       |  FROM tc, tot),
       |scored AS (
       |  SELECT doc_id, round(sum(w), 6) AS weight
       |  FROM toks JOIN w USING (term) GROUP BY doc_id)
       |SELECT doc_id, weight,
       |  round(weight - ln(-ln((CAST(((doc_id % 1000000007) * 2654435761 + 12345) % 1000000007 AS DOUBLE) + 1.0)
       |    / 1000000008.0)), 6) AS gkey
       |FROM scored
       |ORDER BY gkey DESC, doc_id LIMIT $ImportanceK""".stripMargin

  /** C44 `corpus_profile`: the one-pass corpus data card — per-source
    * document/token/char totals, language spread and english share,
    * with a ROLLUP grand-total row (the report a 100 TB ingest job
    * emits before training starts). Integer sums are exact on both
    * engines; the only doubles are final ratios. One grouping-sets
    * aggregation, map-side combined — no joins, no second pass.
    */
  def corpusProfile(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), col("lang"), col("n_chars"),
        size(tokens(col("text"))).cast("long").as("n_toks"))
      .rollup(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_toks")).as("total_tokens"),
        sum(col("n_chars").cast("long")).as("total_chars"),
        // raw double quotient, NOT rounded: an integer/integer average
        // like 123.455 is a genuine 2-dp tie that the two engines'
        // double-rounding modes resolve differently; the unrounded
        // quotient is the same double on both. Sum as BIGINT (exact at
        // any corpus size) and cast once, matching the oracle's
        // CAST(sum(...) AS DOUBLE)/count(*) arithmetic.
        (sum(col("n_chars").cast("long")).cast("double") / count(lit(1))).as("avg_chars"),
        round(sum(when(col("lang") === "en", 1.0).otherwise(0.0)) / count(lit(1)), 6)
          .as("en_frac"))
      .select(coalesce(col("source"), lit("ALL")).as("source"), col("n_docs"),
        col("n_langs"), col("total_tokens"), col("total_chars"),
        col("avg_chars"), col("en_frac"))
      .orderBy(col("source"))

  val corpusProfileSql: String =
    s"""SELECT COALESCE(source, 'ALL') AS source,
       |  count(*) AS n_docs,
       |  count(DISTINCT lang) AS n_langs,
       |  CAST(sum(len($tokensSql)) AS BIGINT) AS total_tokens,
       |  CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
       |  CAST(sum(CAST(n_chars AS BIGINT)) AS DOUBLE) / count(*) AS avg_chars,
       |  round(sum(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END) / count(*), 6) AS en_frac
       |FROM documents
       |GROUP BY ROLLUP(source)
       |ORDER BY source""".stripMargin

  /** C45 `sample_temperature`: temperature-balanced multilingual
    * sampling (the XLM-R/mT5 α-upsampling rule): per-language share
    * q_l ∝ (n_l/N)^α with α=0.3, a fixed total budget K apportioned by
    * the largest-remainder method (exact, no RNG), then per-language
    * selection of the k_l lowest-Knuth-hash documents — reproducible at
    * any parallelism. The apportionment runs on the DRIVER over the
    * collected |langs|-row count table (bounded by construction) with
    * arithmetic that replicates the engines' step for step — pow^α
    * rounds to 6 dp via the same HALF_UP BigDecimal snap Spark's
    * `round` uses, the weight sum re-snaps to the 6-dp grid so
    * summation order can't move floor(K·w/sw) — and the resulting
    * quota/threshold maps ride into the corpus plan as plan-constant
    * [[graft.functions.ConstLongLookup]] expressions. The only
    * data-proportional work is one per-language rank window (C33's
    * shape — at 100 TB a hash-threshold prefilter bounds each sorted
    * partition to ~2·k_l before ranking). Languages smaller than
    * their inflated quota contribute all n_l docs (total may fall
    * short of K — documented, matches the oracle).
    */
  val TempK = 200
  def sampleTemperature(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val Mod = 1000000007L
    val docs = Tables.documents(s, d)
    // |langs| rows to the driver; everything below is exact integer or
    // grid-snapped double arithmetic, identical to what the engines
    // compute from the same counts
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nn = counts.values.sum.toDouble
    val wMap = counts.map { case (l, n) => l -> round6(math.pow(n / nn, 0.3)) }
    // sw re-quantized to the 6-dp grid: the per-language weights are
    // already 6-dp, but engines may sum them in different orders —
    // snapping the sum keeps floor(K*w/sw) engine-identical
    val sw = round6(wMap.toSeq.sortBy(_._1).map(_._2).sum)
    val k0 = wMap.map { case (l, w) => l -> math.floor(TempK * w / sw).toLong }
    val rem = wMap.map { case (l, w) =>
      l -> (TempK * w / sw - math.floor(TempK * w / sw)) }
    val leftover = TempK - k0.values.sum
    // largest-remainder ranks: rem desc, lang asc (0-based here, the
    // SQL's row_number is 1-based — `< leftover` vs `<= leftover`)
    val rnk = rem.toSeq.sortBy { case (l, r) => (-r, l) }
      .map(_._1).zipWithIndex.toMap
    val kMap = counts.map { case (l, n) =>
      l -> math.min(n, k0(l) + (if (rnk(l) < leftover) 1L else 0L)) }
    // Hash-threshold prefilter: the hash is uniform on [0, MOD), so
    // admitting h < 2·(k_l/n_l)·MOD keeps ~2× the quota before the rank
    // window — the per-language sort sees ~2·k_l rows, not n_l (at
    // 100 TB that is ~400 docs per language instead of the corpus).
    // Exactness: whenever ≥ k_l rows survive, the k_l lowest hashes are
    // all below the threshold with order preserved.
    val thrMap = kMap.map { case (l, k) =>
      l -> math.min(Mod,
        math.ceil(2.0 * k * Mod.toDouble / counts(l)).toLong) }
    val h = pmod(pmod(col("doc_id"), lit(Mod)) * lit(2654435761L) + lit(12345L),
      lit(Mod))
    val hashed = docs.select(col("doc_id"), col("lang")).withColumn("h", h)
    // safety probe (one tiny aggregate): a stratum with < k_l survivors
    // — possible only on a pathological hash distribution — lifts its
    // threshold to MOD, which IS the full-rank fallback
    val scnt = hashed.filter(col("h") < exprs.constLookup(col("lang"), thrMap, 0L))
      .groupBy(col("lang")).agg(count(lit(1)).as("scnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val effThr = kMap.map { case (l, k) =>
      l -> (if (scnt.getOrElse(l, 0L) >= k) thrMap(l) else Mod) }
    // corpus-side plan: scan → narrow const-lookup filter → one rank
    // window — the tiny quota chain never appears in it
    val rw = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    hashed.filter(col("h") < exprs.constLookup(col("lang"), effThr, Mod))
      .withColumn("pick_rank", row_number().over(rw).cast("long"))
      .filter(col("pick_rank") <= exprs.constLookup(col("lang"), kMap, 0L))
      .select(col("doc_id"), col("lang"), col("pick_rank"))
      .orderBy(col("lang"), col("pick_rank"))
  }

  val sampleTemperatureSql: String =
    s"""WITH lc AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn FROM lc),
       |w AS (SELECT lang, n, round(pow(CAST(n AS DOUBLE) / nn, 0.3), 6) AS w FROM lc, tot),
       |sw AS (SELECT round(sum(w), 6) AS sw FROM w),
       |base AS (
       |  SELECT lang, n, CAST(floor($TempK * w / sw) AS BIGINT) AS k0,
       |    $TempK * w / sw - floor($TempK * w / sw) AS rem
       |  FROM w, sw),
       |leftover AS (SELECT $TempK - sum(k0) AS leftover FROM base),
       |quota AS (
       |  SELECT lang, least(n, k0 + CASE WHEN
       |      row_number() OVER (ORDER BY rem DESC, lang) <= leftover
       |    THEN 1 ELSE 0 END) AS k
       |  FROM base, leftover),
       |ranked AS (
       |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
       |    ORDER BY ((doc_id % 1000000007) * 2654435761 + 12345) % 1000000007, doc_id) AS pick_rank
       |  FROM documents)
       |SELECT doc_id, lang, pick_rank
       |FROM ranked JOIN quota USING (lang)
       |WHERE pick_rank <= k
       |ORDER BY lang, pick_rank""".stripMargin

  /** C73 `sample_epochs`: token-budget allocation with epoch
    * repetition — the data-constrained-scaling recipe (Muennighoff
    * 2023: repeating up to ~4 epochs is near-as-good as fresh data,
    * beyond that returns decay): each source gets a token budget; the
    * source's corpus is repeated floor(budget/T_s) full epochs (capped
    * at [[EpochCap]] — over-budget tokens beyond the cap are
    * deliberately dropped), and the remainder becomes a fractional
    * epoch admitted by hash threshold (expected token mass = the
    * remainder; the C45/C33 admission pattern — deterministic,
    * shuffle-free, reproducible at any parallelism). Output is the
    * exploded training plan `(doc_id, source, n_tok, epoch)`.
    *
    * Scale shape: ONE corpus scan + a |sources|-row aggregate
    * broadcast back + a map-side explode — no corpus-wide shuffle and
    * no window anywhere, so the plan is scan-bound at 100 TB. All
    * boundary arithmetic is engine-portable: budgets round once from
    * the 1-dp multiplier grid, full epochs use integer division, and
    * the admission threshold floors an exact-integer-ratio double.
    * Budgets here are derived from each source's own token mass by a
    * hashed multiplier (0.4×/1×/2.5×/5.2× — under-, exactly-, over-,
    * and cap-exceeding-budget regimes all exercised); a production
    * caller passes absolute per-source budgets instead.
    */
  val EpochCap = 4L
  def sampleEpochs(s: SparkSession, d: String): DataFrame = {
    val Mod = 1000000007L
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), size(tokens(col("text"))).cast("long").as("n_tok"))
    val mults = Seq(0.4, 1.0, 2.5, 5.2)
    val srcBudget = docs.groupBy(col("source"))
      .agg(sum(col("n_tok")).as("t"))
      .withColumn("mult", element_at(
        typedLit(mults), (pmod(exprs.polyHash(col("source")), lit(4L)) + 1L).cast("int")))
      .withColumn("budget", round(col("mult") * col("t")).cast("long"))
      .withColumn("full", least(expr("budget DIV t"), lit(EpochCap)))
      // the fractional epoch exists only below the cap; at the cap the
      // overrun is dropped (the whole point of the 4-epoch rule)
      .withColumn("thr", when(col("full") < EpochCap,
        floor((col("budget") - col("full") * col("t")).cast("double") / col("t")
          * lit(Mod.toDouble)).cast("long")).otherwise(lit(0L)))
      .select(col("source"), col("full"), col("thr"))
    val h = pmod(pmod(col("doc_id"), lit(Mod)) * lit(2654435761L) + lit(987654321L), lit(Mod))
    docs.join(broadcast(srcBudget), "source")
      .withColumn("repeats", col("full") + when(h < col("thr"), 1L).otherwise(0L))
      // sequence(1, 0) would generate DESCENDING [1, 0] — guard repeats=0
      .filter(col("repeats") >= 1L)
      .select(col("doc_id"), col("source"), col("n_tok"),
        explode(sequence(lit(1L), col("repeats"))).as("epoch"))
      .orderBy(col("doc_id"), col("epoch"))
  }

  val sampleEpochsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, CAST(len($tokensSql) AS BIGINT) AS n_tok FROM documents),
       |st AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS t FROM d GROUP BY source),
       |b AS (
       |  SELECT source, t,
       |    CAST(round((CASE list_reduce(list_transform(string_split(source, ''),
       |        ch -> ascii(ch)::BIGINT), (a, x) -> (a * 31 + x) % 1000000007) % 4
       |      WHEN 0 THEN 0.4 WHEN 1 THEN 1.0 WHEN 2 THEN 2.5 ELSE 5.2 END) * t) AS BIGINT) AS budget
       |  FROM st),
       |e AS (
       |  SELECT source, t, budget, least(budget // t, 4) AS "full",
       |    CASE WHEN least(budget // t, 4) < 4 THEN
       |      CAST(floor(CAST(budget - least(budget // t, 4) * t AS DOUBLE) / t * 1000000007.0) AS BIGINT)
       |    ELSE 0 END AS thr
       |  FROM b),
       |r AS (
       |  SELECT d.doc_id, d.source, d.n_tok,
       |    e."full" + CASE WHEN ((d.doc_id % 1000000007) * 2654435761 + 987654321) % 1000000007 < e.thr
       |      THEN 1 ELSE 0 END AS repeats
       |  FROM d JOIN e USING (source))
       |SELECT doc_id, source, n_tok, CAST(unnest(generate_series(1, repeats)) AS BIGINT) AS epoch
       |FROM r WHERE repeats >= 1
       |ORDER BY doc_id, epoch""".stripMargin

  /** C46 `text_bigram_lp`: interpolated bigram language-model score —
    * the CCNet/KenLM perplexity-filter family one order up from C20's
    * unigram. The model is trained on the corpus it scores (per-bigram
    * and per-unigram counts, two map-side-combined aggregations); each
    * position's probability is the λ-mixture of the add-1-smoothed
    * conditional bigram and the unigram fallback,
    * λ·(c₁₂+1)/(c₁+V) + (1−λ)·(c₂+1)/(N+V), λ=0.7. All inputs to the
    * mixture are integer-ratio doubles (correctly-rounded, identical on
    * both engines); ln quantizes to 6 dp per DISTINCT BIGRAM before the
    * per-doc SUM — the exact sum lies on the 1e-6 grid, so the final
    * round snaps float accumulation noise back to the quantum (C20's
    * convention; a mean would leave the grid and sit on round-half
    * boundaries). The
    * weight table is |distinct bigrams|-sized, built once and joined
    * once against the bigram stream — at 100 TB that's two keyed
    * shuffles + one join, the same shape as tf·idf; the lead() window
    * partitions by doc_id (unbounded cardinality — no skew). Docs with
    * <2 tokens have no bigram and drop out (inner join), matching the
    * oracle.
    */
  def bigramLp(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialize the bigram stream and the unigram counts once (r13
    // optimization): bigr feeds the count aggregation AND the scoring
    // join, uni feeds totals AND both weight joins — unchecked, the
    // tokenize chain planned five times (5 documents scans in the
    // before-plan). Checkpoints keep the per-instance addend multiset
    // identical.
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "term")))
    val bigr = Mat.factRows(toks
      .withColumn("w2", lead(col("term"), 1).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("term").as("w1"), col("w2")))
    // vocab-sized: lazy persist — totals and the two weight joins run
    // in one action, so the first leg populates the cache and the
    // r13 checkpoint job (the sf0.1 regression on this entry) is gone
    val uni = Mat.factRows(toks.groupBy(col("term")).agg(count(lit(1)).as("c")))
    val totals = uni.agg(sum(col("c")).cast("double").as("nn"),
      count(lit(1)).cast("double").as("v"))
    val bigCounts = bigr.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val weights = bigCounts
      .join(uni.select(col("term").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("term").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"),
        round(log(
          lit(0.7) * (col("c12").cast("double") + lit(1.0)) / (col("c1").cast("double") + col("v")) +
          lit(0.3) * (col("c2").cast("double") + lit(1.0)) / (col("nn") + col("v"))), 6).as("lp"))
    bigr.join(weights, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp")), 6).as("bigram_lp"))
      .orderBy(col("doc_id"))
  }

  val bigramLpSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(t) AS term, unnest(range(1, len(t)+1)) AS pos
       |  FROM (SELECT doc_id, $tokensSql AS t FROM documents)),
       |bigr AS (
       |  SELECT doc_id, term AS w1,
       |    lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
       |  FROM toks),
       |bg AS (SELECT doc_id, w1, w2 FROM bigr WHERE w2 IS NOT NULL),
       |uni AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
       |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS nn, CAST(count(*) AS DOUBLE) AS v FROM uni),
       |bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
       |w AS (
       |  SELECT bc.w1, bc.w2,
       |    round(ln(
       |      0.7 * (CAST(c12 AS DOUBLE) + 1.0) / (CAST(u1.c AS DOUBLE) + v) +
       |      0.3 * (CAST(u2.c AS DOUBLE) + 1.0) / (nn + v)), 6) AS lp
       |  FROM bc
       |  JOIN uni u1 ON u1.term = bc.w1
       |  JOIN uni u2 ON u2.term = bc.w2, tot)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  round(sum(lp), 6) AS bigram_lp
       |FROM bg JOIN w USING (w1, w2)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** C48 `text_vocab_coverage`: vocabulary coverage / out-of-vocab
    * scoring — the tokenizer-sizing statistic: given the corpus's
    * top-V vocabulary (by frequency, term-asc tie break), the
    * per-document fraction of tokens that fall outside it. Pipelines
    * use the OOV rate both to size tokenizer vocabularies and as a
    * junk signal (OCR noise and non-linguistic content score high).
    * Scale shape: the vocabulary is one map-side-combined term count
    * + `orderBy(c).limit(V)` — TakeOrderedAndProject, each partition
    * keeps a local top-V, no global sort — and the V-row vocab then
    * BROADCASTS into the membership join, so the per-doc pass is one
    * narrow probe + one partial-agged groupBy at any corpus size.
    */
  val VocabV = 16
  def vocabCoverage(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(VocabV)
      .select(col("term"), lit(true).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_frac",
        round(col("n_oov").cast("double") / col("n_toks"), 6))
      .orderBy(col("doc_id"))
  }

  val vocabCoverageSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
       |v AS (SELECT term FROM (
       |  SELECT term, count(*) AS c FROM toks GROUP BY term
       |  ORDER BY c DESC, term LIMIT $VocabV)),
       |j AS (SELECT toks.doc_id, toks.term, v.term AS vt
       |      FROM toks LEFT JOIN v ON toks.term = v.term)
       |SELECT doc_id, count(*) AS n_toks,
       |  CAST(count(*) FILTER (WHERE vt IS NULL) AS BIGINT) AS n_oov,
       |  round(CAST(count(*) FILTER (WHERE vt IS NULL) AS DOUBLE) / count(*), 6)
       |    AS oov_frac
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** C49 `text_boilerplate`: per-source boilerplate line removal — the
    * CCNet/RefinedWeb site-template pass: a non-blank line is
    * boilerplate for source s when it appears in ≥ 30 % of s's
    * documents and s has ≥ [[BoilerplateMinDocs]] docs (small sources
    * can't vote a template); boilerplate lines are stripped only
    * within their own source (nav bars are site-specific — C23's
    * global ≥2-docs rule is the cross-site complement). Threshold is
    * pure integer arithmetic (nd·10 ≥ 3·n_docs), no doubles. Scale
    * shape: per-source doc counts are a tiny agg; line stats shuffle
    * on the (source, 64-bit line hash) key — the line string never
    * rides the detection shuffle; the template table is
    * boilerplate-sized so AQE broadcasts the join back; reassembly is
    * one per-doc groupBy with exact order via posexplode + array_sort.
    * The oracle joins on the line string itself; agreement holds
    * because xxhash64 is injective on real corpora.
    */
  val BoilerplateMinDocs = 10L
  def boilerplateOf(docs: DataFrame): DataFrame = {
    val srcCnt = docs.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("src_docs"))
    val lines = docs
      .select(col("doc_id"), col("source"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "ln")))
      .withColumn("lh", xxhash64(col("ln")))
    val bp = lines.filter(trim(col("ln")) =!= "")
      .groupBy(col("source"), col("lh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .join(broadcast(srcCnt), "source")
      .filter(col("src_docs") >= BoilerplateMinDocs &&
        col("nd") * 10 >= col("src_docs") * 3)
      .select(col("source"), col("lh"), lit(true).as("is_bp"))
    lines.join(bp, Seq("source", "lh"), "left")
      .groupBy(col("doc_id"), col("source"))
      .agg(
        sum(when(col("is_bp").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("is_bp").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        array_join(transform(
          array_sort(collect_list(when(col("is_bp").isNull,
            struct(col("pos"), col("ln"))))),
          x => x.getField("ln")), "\n").as("clean_text"))
      .orderBy(col("doc_id"))
  }

  def boilerplate(s: SparkSession, d: String): DataFrame =
    boilerplateOf(Tables.documents(s, d))

  val boilerplateSql: String =
    s"""WITH base AS (SELECT doc_id, source, string_split(text, chr(10)) AS ls
       |              FROM documents),
       |l AS (SELECT doc_id, source, unnest(ls) AS ln,
       |             unnest(range(1, len(ls) + 1)) AS pos FROM base),
       |sc AS (SELECT source, count(DISTINCT doc_id) AS src_docs FROM base
       |       GROUP BY source),
       |bp AS (SELECT l.source, ln FROM l JOIN sc ON l.source = sc.source
       |       WHERE trim(ln) <> '' AND src_docs >= $BoilerplateMinDocs
       |       GROUP BY l.source, ln, src_docs
       |       HAVING count(DISTINCT doc_id) * 10 >= src_docs * 3),
       |j AS (SELECT l.doc_id, l.source, l.ln, l.pos, bp.ln AS bl
       |      FROM l LEFT JOIN bp ON l.source = bp.source AND l.ln = bp.ln)
       |SELECT doc_id, source,
       |  count(*) FILTER (WHERE bl IS NULL) AS n_kept,
       |  count(*) FILTER (WHERE bl IS NOT NULL) AS n_removed,
       |  coalesce(string_agg(ln, chr(10) ORDER BY pos)
       |             FILTER (WHERE bl IS NULL), '') AS clean_text
       |FROM j GROUP BY doc_id, source ORDER BY doc_id""".stripMargin

  /** C51 `corpus_threshold_sweep`: quality-gate calibration — the
    * keep-rate curve every pipeline sweeps before choosing a filter
    * threshold: for each of [[SweepSteps]] grid points t = i/steps,
    * how many documents (and what fraction) clear
    * `quality_score ≥ t`. Computed as ONE conditional aggregation over
    * the scored corpus (steps+1 partial-agged counters in a single
    * map-side-combined pass — no per-threshold scan, no row
    * explosion), then the single result row unpivots into the curve.
    * At 100 TB the cost is the C9 scoring scan plus one 21-counter
    * agg; the same shape calibrates any per-doc score (LM logprob, NB
    * llr) by swapping the input. Grid points are i/steps (exact IEEE
    * division both engines agree on — never i·0.05, which DuckDB
    * would evaluate in DECIMAL).
    */
  val SweepSteps = 20
  def thresholdSweep(s: SparkSession, d: String): DataFrame = {
    val scores = quality(s, d).select(col("quality_score"))
    val ks = (0 to SweepSteps).map(i =>
      sum(when(col("quality_score") >= lit(i.toDouble / SweepSteps), 1L)
        .otherwise(0L)).as(s"k$i"))
    val tot = scores.agg(count(lit(1)).as("n"), ks: _*)
    tot.select(explode(array((0 to SweepSteps).map(i => struct(
        lit(i.toDouble / SweepSteps).as("threshold"),
        col(s"k$i").as("n_kept"),
        round(col(s"k$i").cast("double") / col("n"), 6).as("keep_frac"))): _*))
        .as("r"))
      .select(col("r.threshold"), col("r.n_kept"), col("r.keep_frac"))
      .orderBy(col("threshold"))
  }

  val thresholdSweepSql: String =
    s"""WITH q AS (SELECT quality_score FROM ($qualitySql)),
       |n AS (SELECT count(*) AS n FROM q),
       |g AS (SELECT unnest(range(0, ${SweepSteps + 1})) AS i)
       |SELECT CAST(i AS DOUBLE) / $SweepSteps AS threshold,
       |  count(*) FILTER (WHERE quality_score >= CAST(i AS DOUBLE) / $SweepSteps)
       |    AS n_kept,
       |  round(CAST(count(*) FILTER (WHERE quality_score >= CAST(i AS DOUBLE) / $SweepSteps)
       |    AS DOUBLE) / any_value(n.n), 6) AS keep_frac
       |FROM q, g, n GROUP BY i ORDER BY threshold""".stripMargin

  /** C61 `text_bm25`: Okapi BM25 relevance scoring against a fixed
    * keyword query — the lexical half of every retrieval / data-
    * curation stack (and the scoring function behind "keep documents
    * relevant to topic X" corpus filters). Standard k1=1.2, b=0.75 with
    * the Lucene non-negative idf `ln(1 + (N-df+0.5)/(df+0.5))`.
    * Shapes at 100 TB: the document-length table is a narrow per-row
    * map; tf is one partial-agg groupBy over only the rows matching
    * the (tiny, broadcast) query-term set; df/N/avgdl are scalar
    * aggregates broadcast back. Per-term contributions quantize to
    * 10 dp before the per-doc sum (C60's convention), final 6-dp snap;
    * ranking happens on the snapped score so both engines agree. The
    * top-100 cut is orderBy+limit → TakeOrderedAndProject (no global
    * sort); the rank column is derived on the ≤100 surviving rows.
    */
  val Bm25Terms = Seq("hash", "join", "vector", "stream")
  val Bm25TopN = 100

  def bm25(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val corpus = docs.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val qtoks = docs.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(Bm25Terms: _*))
    // tf (only the query-term rows — bounded by |terms|·|docs|) is
    // cached once; df rolls up from it with a map-side-combined groupBy
    // joined back on term (tf is unique per (doc, term), so
    // count-per-term ≡ count_distinct(doc_id)). r13 computed df as a
    // count window partitioned by term — with 4 query terms that is AT
    // MOST 4 window partitions, each a single task buffering every
    // matching document at 100 TB; the groupBy+join keeps one tokenize
    // pass (the r13 goal) while staying skew-immune (guide §2.5). idf
    // arithmetic is unchanged: same df per term, same 6-dp round.
    val tf = graft.Mat.factRows(qtoks.groupBy(col("doc_id"), col("term"))
      .agg(first(col("dl")).as("dl"), count(lit(1)).as("tf")))
    // dfT is provably ≤ |Bm25Terms| rows at ANY corpus size — hint the
    // broadcast so the join-back never plans an exchange of tf
    val dfT = broadcast(tf.groupBy(col("term")).agg(count(lit(1)).as("df")))
    val scored = tf.join(dfT, "term")
      .crossJoin(broadcast(corpus))
      .withColumn("idf", round(log(lit(1.0) +
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))), 6))
      .withColumn("contrib", round(col("idf") *
        (col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") +
          lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl")))),
        10))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched"), round(sum(col("contrib")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(Bm25TopN)
    scored.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .orderBy(col("rank"))
  }

  val bm25Sql: String = {
    val terms = Bm25Terms.mkString("('", "', '", "')")
    s"""WITH docs AS (SELECT doc_id, $tokensSql AS toks FROM documents),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM docs),
       |corpus AS (SELECT count(*) AS n_docs,
       |  CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
       |qt AS (SELECT doc_id, unnest(toks) AS term FROM docs),
       |m AS (SELECT qt.doc_id, term, dl.dl FROM qt JOIN dl USING (doc_id)
       |      WHERE term IN $terms),
       |tf AS (SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
       |       FROM m GROUP BY doc_id, term),
       |idf AS (SELECT term,
       |  round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
       |                 / (CAST(df AS DOUBLE) + 0.5)), 6) AS idf, avgdl
       |  FROM (SELECT term, count(DISTINCT doc_id) AS df FROM m GROUP BY term), corpus),
       |scored AS (
       |  SELECT doc_id, count(*) AS n_matched,
       |    round(sum(round(idf * (CAST(tf AS DOUBLE) * 2.2)
       |      / (CAST(tf AS DOUBLE)
       |         + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))), 10)), 6) AS score
       |  FROM tf JOIN idf USING (term) GROUP BY doc_id
       |  ORDER BY score DESC, doc_id LIMIT $Bm25TopN)
       |SELECT doc_id, n_matched, score,
       |  row_number() OVER (ORDER BY score DESC, doc_id) AS rank
       |FROM scored ORDER BY rank""".stripMargin
  }

  /** C62 `corpus_zipf`: Zipf's-law fit over the term-frequency
    * distribution — the corpus-health diagnostic next to C56's
    * Heaps-law curve (natural text sits near slope −1; machine spam,
    * template floods, or tokenizer damage bend it). One map-side-
    * combined term count is the only data-proportional pass; the rank
    * window and the OLS fit run over the top-$ZipfTopV rows of the
    * aggregated vocabulary table (tiny — at 100 TB cap the vocabulary
    * exactly like C48's top-V). ln(rank)/ln(freq) grid points quantize
    * to 10 dp before the regression sums, final 6-dp snap.
    */
  val ZipfTopV = 100

  def corpusZipf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tc = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    // Pre-cut to top-V with orderBy+limit (plans as TakeOrderedAndProject
    // — per-partition heaps, no global sort) so the unpartitioned rank
    // window only ever sees ZipfTopV rows, as bm25 does.
    val ranked = tc
      .orderBy(col("c").desc, col("term")).limit(ZipfTopV)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("c").desc, col("term"))).cast("long"))
      .select(round(log(col("rank").cast("double")), 10).as("x"),
        round(log(col("c").cast("double")), 10).as("y"))
    ranked.agg(
        count(lit(1)).cast("double").as("v"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(round(col("x") * col("y"), 10)).as("sxy"),
        sum(round(col("x") * col("x"), 10)).as("sxx"))
      .select(col("v").cast("long").as("n_terms"),
        round((col("v") * col("sxy") - col("sx") * col("sy")) /
              (col("v") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") - ((col("v") * col("sxy") - col("sx") * col("sy")) /
              (col("v") * col("sxx") - col("sx") * col("sx"))) * col("sx")) / col("v"), 6)
          .as("intercept"))
  }

  val corpusZipfSql: String =
    s"""WITH tc AS (
       |  SELECT term, count(*) AS c
       |  FROM (SELECT unnest($tokensSql) AS term FROM documents) GROUP BY term),
       |ranked AS (
       |  SELECT round(ln(CAST(rank AS DOUBLE)), 10) AS x,
       |         round(ln(CAST(c AS DOUBLE)), 10) AS y
       |  FROM (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rank FROM tc)
       |  WHERE rank <= $ZipfTopV),
       |s AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS v, sum(x) AS sx, sum(y) AS sy,
       |    sum(round(x * y, 10)) AS sxy, sum(round(x * x, 10)) AS sxx
       |  FROM ranked)
       |SELECT CAST(v AS BIGINT) AS n_terms,
       |  round((v * sxy - sx * sy) / (v * sxx - sx * sx), 6) AS slope,
       |  round((sy - ((v * sxy - sx * sy) / (v * sxx - sx * sx)) * sx) / v, 6)
       |    AS intercept
       |FROM s""".stripMargin

  /** Per-doc deflate statistics for C66 — a REAL zlib pass (the
    * FineWeb/Gopher "compression ratio" junk signal: machine-generated
    * repetition compresses far better than natural text, binary blobs
    * and high-entropy junk compress worse). One Deflater per PARTITION
    * (native-memory codec init amortized across rows, freed on task
    * completion — the mm-decode idiom), so the op is a narrow per-row
    * map at any corpus size.
    */
  final case class DeflateStat(doc_id: Long, n_bytes: Long, n_deflate: Long, ratio: Double)

  def compressionStats(s: SparkSession, docs: DataFrame): org.apache.spark.sql.Dataset[DeflateStat] = {
    import s.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, false)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val in = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset(); deflater.setInput(in); deflater.finish()
          var n = 0L
          while (!deflater.finished()) n += deflater.deflate(buf)
          DeflateStat(id, in.length.toLong, n,
            BigDecimal(n.toDouble / math.max(in.length, 1).toDouble)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
  }

  /** C66 `text_compression`: the deflate-ratio signal as a gate entry.
    * Compressed lengths are codec-internal (no SQL spelling), so the
    * driver row carries corpus-level invariants the entry *proves* by
    * require() — the check-entry idiom the lake gates use — while the
    * per-doc dataset ([[compressionStats]]) is the reusable operator
    * and the spec pins the codec round-trip.
    */
  def textCompression(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val stats = compressionStats(s, Tables.documents(s, d))
    // The hi<2.0 sanity band only applies to docs long enough that the
    // fixed ~8-byte deflate header can't dominate: a legal 3-byte doc
    // deflates to ~11 bytes (ratio ≈ 3.7) without anything being wrong.
    // Below the floor we only require a positive ratio.
    val SaneBandMinBytes = 64L
    val row = stats.agg(
      count(lit(1)).as("n"),
      min(col("ratio")).as("lo"),
      max(when(col("n_bytes") >= SaneBandMinBytes, col("ratio"))).as("hi"),
      sum(when(col("n_deflate") <= 0L, 1L).otherwise(0L)).as("bad")).head()
    require(row.getAs[Long]("bad") == 0L, "every document must deflate to >0 bytes")
    val hiVal = if (row.isNullAt(row.fieldIndex("hi"))) 0.0 else row.getAs[Double]("hi")
    require(row.getAs[Double]("lo") > 0.0 && hiVal < 2.0,
      s"deflate ratios out of the sane band (docs >= $SaneBandMinBytes B): " +
        s"[${row.getAs[Double]("lo")}, $hiVal]")
    // planted contrast: a pathologically repetitive doc must compress
    // strictly better than distinct-token text of the same length
    val rep = ("token " * 200).trim
    val varied = (0 until 200).map(i => s"tok$i").mkString(" ").take(rep.length)
    val planted = compressionStats(s,
      Seq((1L, rep), (2L, varied)).toDF("doc_id", "text")).collect()
      .map(st => st.doc_id -> st.ratio).toMap
    require(planted(1L) < planted(2L),
      s"repetition must compress better: ${planted(1L)} vs ${planted(2L)}")
    Seq((row.getAs[Long]("n"), true, true))
      .toDF("n_docs", "ratios_bounded", "repetitive_compresses_better")
  }

  val textCompressionSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_docs, true AS ratios_bounded,
      |  true AS repetitive_compresses_better FROM documents""".stripMargin

  /** C67 `text_normalize`: Unicode NFC normalization — the cleanup
    * pass that makes visually-identical strings byte-identical BEFORE
    * content hashing / exact dedup (decomposed `e`+U+0301 and
    * precomposed `é` md5 apart but are the same text; C1/C47 keyed on
    * raw bytes would miss the duplicate). A custom codegen'd Catalyst
    * expression ([[graft.functions.NfcNormalize]]) wraps the JDK
    * normalizer with an `isNormalized` fast path, so the op is a
    * zero-shuffle narrow map whose common case allocates nothing. The
    * test corpus is ASCII (normalization = identity there), so the
    * entry UNIONs planted decomposed/precomposed rows — built from
    * codepoints on BOTH engines (chr() in DuckDB, \\u escapes here) to
    * keep literal encoding out of the comparison; the oracle proves
    * the planted pair CONVERGES to one md5 after NFC.
    */
  def textNormalize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planted = Seq(
      (1000001L, "cafe\u0301 latte"), // decomposed: e + combining acute
      (1000002L, "caf\u00e9 latte")   // precomposed e-acute
    ).toDF("doc_id", "text")
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      .unionByName(planted)
    val out = docs.select(col("doc_id"),
      md5(exprs.nfcNormalize(col("text")).cast("binary")).as("norm_md5"),
      length(col("text")).cast("long").as("n_chars_raw"),
      length(exprs.nfcNormalize(col("text"))).cast("long").as("n_chars_norm"))
      .orderBy(col("doc_id"))
    out
  }

  val textNormalizeSql: String =
    """WITH d AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT 1000001, 'cafe' || chr(769) || ' latte'
      |  UNION ALL SELECT 1000002, 'caf' || chr(233) || ' latte')
      |SELECT doc_id, md5(nfc_normalize(text)) AS norm_md5,
      |  CAST(length(text) AS BIGINT) AS n_chars_raw,
      |  CAST(length(nfc_normalize(text)) AS BIGINT) AS n_chars_norm
      |FROM d ORDER BY doc_id""".stripMargin

  /** C68 `text_bpe_train`: the BPE MERGE LOOP — actual tokenizer
    * training (Sennrich et al. 2016; the GPT-2 recipe C41 only
    * measured the first step of). k=[[BpeMerges]] iterations of
    * count-adjacent-pairs → merge the argmax pair corpus-wide,
    * emitting the learned merge table (rank, lhs, rhs, weighted pair
    * count).
    *
    * Shapes at 100 TB: the corpus is touched ONCE (the word-frequency
    * groupBy, top-V capped to [[BpeVocabCap]] with a deterministic
    * orderBy+limit cut); the k-merge loop then runs DRIVER-LOCAL over
    * that bounded table with incremental pair-count maintenance
    * ([[bpeMergeLoop]]) — a 32k-merge production vocabulary costs ONE
    * corpus pass and zero further Spark jobs. The k-jobs distributed
    * loop survives as [[bpeTrainDistributed]] for genuinely uncappable
    * vocabularies.
    *
    * Determinism/oracle: words are encoded with DOUBLE-bar symbol
    * boundaries ('||c||a||t||'), so the merge of (l, r) is a plain
    * `replace(enc, '|l||r|', '|lr|')` — left-to-right, non-overlapping,
    * cannot match inside a symbol, and each neighbor keeps its half of
    * the boundary so chained occurrences ('aaaa' → [aa, aa]) and
    * symbol-prefix near-misses ([ab, bb] stays unmerged) both behave
    * exactly like a list-scan BPE pass (randomized spec pins this
    * against a from-scratch trainer) — with IDENTICAL semantics in Spark
    * and DuckDB, which lets the oracle replay the whole loop as k
    * unrolled CTE stages (generated below). Ties break on (count desc,
    * pair string) in both engines.
    */
  /** Real-vocab-scale merge budget for the C68 entry. The synthetic
    * corpus (31 distinct words) exhausts its pair pool after ~89
    * merges, so the entry ALSO exercises early-stop: the output is
    * every merge that exists, not k rows. */
  val BpeMerges = 256
  /** Merge budget for the C69 ENCODE entry — kept small so fertility
    * stays a non-trivial signal on the tiny test vocabulary (training
    * to exhaustion fuses every word to one token, fertility ≡ 1). */
  val BpeEncodeMerges = 8
  /** Top-V cap on the word-frequency table pulled to the driver — 2^18
    * words bounds driver memory by construction at any corpus size
    * (the C48 top-V idiom; cut is deterministic: count desc, word). */
  val BpeVocabCap = 262144

  def bpeTrain(s: SparkSession, d: String): DataFrame =
    bpeTrainOf(s, Tables.documents(s, d))

  /** Production body over any (doc_id, text) frame — the randomized
    * exactness spec drives synthetic corpora through this same plan.
    *
    * Scale shape (the production trainer recipe): the CORPUS is touched
    * exactly once — one map-side-combined word-frequency groupBy, top-V
    * capped via orderBy+limit (TakeOrderedAndProject: per-partition
    * heaps, no global sort) so at most [[BpeVocabCap]] (word, count)
    * rows ever reach the driver. The k-merge loop then runs DRIVER-LOCAL
    * over that bounded table ([[bpeMergeLoop]]) with incremental
    * pair-count maintenance — k=32k merges cost zero further Spark jobs
    * and zero further corpus reads, exactly how subword-nmt/HF trainers
    * amortize. Training stops early when no adjacent pair remains
    * (every vocab word fused to a single symbol) — on a small corpus
    * the merge table is the complete merge history, never an error.
    */
  def bpeTrainOf(s: SparkSession, docs: DataFrame): DataFrame =
    bpeTrainOf(s, docs, BpeMerges)

  def bpeTrainOf(s: SparkSession, docs: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    val wf = docs
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(BpeVocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    bpeMergeLoop(wf, k).toDF("merge_rank", "lhs", "rhs", "n_pairs")
      .orderBy(col("merge_rank"))
  }

  /** The Sennrich merge loop, driver-local over the capped
    * word-frequency table. Pair counts are maintained INCREMENTALLY:
    * merging (l, r) only rescans the words that actually contain the
    * pair (a pair→word-indices posting index), so a full training run
    * is O(one init scan + Σ touched-word lengths), not O(k · vocab).
    * The per-merge argmax is a plain scan of the live pair map —
    * documented trade: at k=32k × a 2^18 vocab a lazy max-heap shaves
    * the scan, but the scan keeps the tie-break (count desc, then
    * "l r" ascending by UTF-8 BYTES — matching Spark's UTF8String and
    * DuckDB's binary collation, NOT java.lang.String UTF-16 order)
    * trivially auditable. Merge application is the same left-to-right
    * non-overlapping list scan the '||'-replace semantics encode;
    * the randomized spec pins all three implementations pair-for-pair.
    */
  def bpeMergeLoop(wf: Array[(String, Long)], k: Int): Seq[(Long, String, String, Long)] = {
    import scala.collection.mutable
    def utf8Lt(a: String, b: String): Boolean = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    def wordPairs(syms: Array[String]): mutable.Map[(String, String), Long] = {
      val m = mutable.Map.empty[(String, String), Long]
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        m(p) = m.getOrElse(p, 0L) + 1L
        i += 1
      }
      m
    }
    val words = wf.map(_._1.map(_.toString).toArray)
    val cnts = wf.map(_._2)
    val pairCnt = mutable.Map.empty[(String, String), Long]
    val posting = mutable.Map.empty[(String, String), mutable.Set[Int]]
    for (wi <- words.indices; (p, m) <- wordPairs(words(wi))) {
      pairCnt(p) = pairCnt.getOrElse(p, 0L) + m * cnts(wi)
      posting.getOrElseUpdate(p, mutable.Set.empty) += wi
    }
    // per-merge argmax via a LAZY max-heap with the scan's exact
    // selection order (count desc, then "l r" ascending by UTF-8
    // bytes): every count change pushes a fresh snapshot, pops
    // validate against the live map and discard stale entries. This is
    // what makes production-k training driver-cheap — the plain
    // live-map scan re-reads O(|pairs|) per merge and measures ~8×
    // slower at k=4096 on a 2^16 vocab (see BENCH_NOTES_r11 bpeprobe);
    // selection equality stays pinned by the randomized C68 spec.
    val heapOrd = new Ordering[(Long, String, (String, String))] {
      def compare(a: (Long, String, (String, String)),
          b: (Long, String, (String, String))): Int =
        if (a._1 != b._1) java.lang.Long.compare(a._1, b._1)
        else if (a._2 == b._2) 0
        else if (utf8Lt(a._2, b._2)) 1 else -1 // smaller key pops first
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, (String, String))](heapOrd)
    for ((p, n) <- pairCnt) heap.enqueue((n, p._1 + " " + p._2, p))
    def pushCurrent(p: (String, String)): Unit =
      pairCnt.get(p).foreach(n => heap.enqueue((n, p._1 + " " + p._2, p)))
    val out = mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var rank = 1
    while (rank <= k && pairCnt.nonEmpty) {
      var best: (String, String) = null
      var bestN = Long.MinValue
      while (best == null) {
        val (n, _, p) = heap.dequeue()
        if (pairCnt.get(p).contains(n)) { best = p; bestN = n }
      }
      val (l, r) = best
      out += ((rank.toLong, l, r, bestN))
      val changed = mutable.Set.empty[(String, String)]
      // rescan only the posting-list words; delta-update the pair maps
      for (wi <- posting(best).toArray) {
        val before = wordPairs(words(wi))
        val merged = {
          val syms = words(wi)
          val o = mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              o += (l + r); i += 2
            } else { o += syms(i); i += 1 }
          }
          o.toArray
        }
        words(wi) = merged
        val after = wordPairs(merged)
        for (p <- (before.keySet ++ after.keySet)) {
          val d = after.getOrElse(p, 0L) - before.getOrElse(p, 0L)
          if (d != 0L) {
            val n = pairCnt.getOrElse(p, 0L) + d * cnts(wi)
            if (n <= 0L) pairCnt.remove(p) else pairCnt(p) = n
            changed += p
          }
          if (after.getOrElse(p, 0L) > 0L)
            posting.getOrElseUpdate(p, mutable.Set.empty) += wi
          else posting.get(p).foreach { s => s -= wi; if (s.isEmpty) posting.remove(p) }
        }
      }
      // one fresh heap snapshot per changed pair per merge (not per
      // touched word) — heap size stays O(init + Σ changed)
      changed.foreach(pushCurrent)
      rank += 1
    }
    out.toSeq
  }

  /** The k-Spark-jobs distributed fallback — the loop shape for corpora
    * whose vocabulary genuinely cannot cap (no top-V is sound, e.g.
    * byte-level pretokenization disabled over adversarial serial-number
    * text). One pair-count aggregation + one narrow re-encode map per
    * merge, lineage cut with an eager localCheckpoint per iteration;
    * same early-stop and tie-break as [[bpeMergeLoop]] (spec-pinned
    * equal). Prefer [[bpeTrainOf]] — at a real 32k-merge vocabulary
    * this path costs 32k Spark jobs to the capped loop's one.
    */
  def bpeTrainDistributed(s: SparkSession, docs: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    val wf = docs
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    var cur = wf.select(col("cnt"),
      concat(regexp_replace(col("w"), "(.)", "||$1"), lit("||")).as("enc"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (i <- 1 to k if !exhausted) {
      val best = cur
        .select(col("cnt"),
          expr("filter(split(enc, '[|][|]'), x -> x != '')").as("syms"))
        .select(col("cnt"), explode(expr(
          """CASE WHEN size(syms) >= 2
            |THEN transform(sequence(1, size(syms) - 1), i -> concat(syms[i-1], ' ', syms[i]))
            |ELSE array() END""".stripMargin)).as("pair"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("pair")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val Array(l, r) = best(0).getString(0).split(" ", 2)
        merges += ((i.toLong, l, r, best(0).getLong(1)))
        cur = cur.select(col("cnt"),
          expr(s"replace(enc, '|$l||$r|', '|$l$r|')").as("enc")).localCheckpoint()
      }
    }
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "n_pairs")
      .orderBy(col("merge_rank"))
  }

  /** Shared CTE block: word frequencies, '||'-boundary encoding, and the k
    * unrolled train stages (p_i pair counts, b_i argmax, e_i merged
    * encodings) — the training oracle selects the b_i rows, the
    * encoding oracle chains the b_i merges over the vocabulary.
    */
  /** Shared CTE block generator: word frequencies (top-V capped exactly
    * like the Spark side), '||'-boundary encoding, and k unrolled train
    * stages (p_i pair counts, b_i argmax, e_i merged encodings),
    * finishing with a `merges` CTE that unions the b_i rows. Every
    * chained CTE is MATERIALIZED — e_i is referenced twice (p_{i+1} and
    * e_{i+1}), so inlining would double the scan tree per stage
    * (2^k scans by k=256). The union is a BALANCED tree: a 256-arm
    * left-deep UNION ALL chain trips DuckDB's max_expression_depth.
    * Past pair-pool exhaustion b_i is empty, which empties e_i and
    * every later stage — the unrolled replay early-stops exactly like
    * the trainers, contributing no rows.
    */
  private def bpeWithBlock(k: Int): String = {
    val stages = (1 to k).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT pair, sum(cnt) AS n FROM (
         |    SELECT cnt, unnest(CASE WHEN len(syms) >= 2
         |      THEN list_transform(range(1, len(syms)), j -> syms[j] || ' ' || syms[j+1])
         |      ELSE [] END) AS pair
         |    FROM (SELECT cnt, list_filter(string_split(enc, '||'), x -> x <> '') AS syms
         |          FROM e${i - 1}))
         |  GROUP BY pair),
         |b$i AS MATERIALIZED (SELECT string_split(pair, ' ')[1] AS l, string_split(pair, ' ')[2] AS r,
         |               n, pair
         |        FROM p$i ORDER BY n DESC, pair LIMIT 1),
         |e$i AS MATERIALIZED (SELECT cnt, replace(enc, '|' || b.l || '||' || b.r || '|',
         |                            '|' || b.l || b.r || '|') AS enc
         |        FROM e${i - 1}, b$i b)""".stripMargin
    }.mkString(",\n")
    val arms = (1 to k).map { i =>
      s"SELECT CAST($i AS BIGINT) AS merge_rank, l AS lhs, r AS rhs, CAST(n AS BIGINT) AS n_pairs FROM b$i"
    }
    def tree(a: Seq[String]): String =
      if (a.size == 1) a.head
      else "(" + tree(a.take(a.size / 2)) + "\nUNION ALL\n" + tree(a.drop(a.size / 2)) + ")"
    s"""wf AS MATERIALIZED (
       |  SELECT w, cnt FROM (
       |    SELECT w, count(*) AS cnt
       |    FROM (SELECT unnest($tokensSql) AS w FROM documents) GROUP BY w)
       |  ORDER BY cnt DESC, w LIMIT $BpeVocabCap),
       |e0 AS MATERIALIZED (SELECT cnt, regexp_replace(w, '(.)', '||\\1', 'g') || '||' AS enc FROM wf),
       |$stages,
       |merges AS MATERIALIZED (SELECT * FROM ${tree(arms)})""".stripMargin
  }

  val bpeTrainSql: String =
    s"""WITH ${bpeWithBlock(BpeMerges)}
       |SELECT merge_rank, lhs, rhs, n_pairs FROM merges
       |ORDER BY merge_rank""".stripMargin

  /** C69 `text_bpe_encode`: BPE ENCODING with the learned merges — the
    * inference half of C68 (what the training pipeline actually runs
    * over every document). Applying k ordered merges to a word is k
    * chained `replace()`s on the '|'-encoding; crucially the encoding
    * runs on the VOCABULARY (distinct words), not the token stream —
    * the corpus pays one groupBy to build the vocab and one broadcast
    * join to map words back to their BPE length, which is exactly how
    * a production tokenizer amortizes at 100 TB (encode cache keyed by
    * word). Output: per-doc whitespace-token vs BPE-token counts and
    * the fertility ratio (BPE tokens per word — THE tokenizer-quality
    * metric). The oracle replays training (C68's stages) AND encoding.
    */
  def bpeEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val merges = bpeTrainOf(s, Tables.documents(s, d), BpeEncodeMerges).collect()
      .map(r => (r.getString(1), r.getString(2))) // (lhs, rhs) in rank order
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    val vocab = docs.select(col("w")).distinct()
    // fold the k replaces as chained narrow maps over the vocab table
    val encoded = merges.foldLeft(vocab.withColumn("enc",
        concat(regexp_replace(col("w"), "(.)", "||$1"), lit("||")))) { case (df, (l, r)) =>
      df.withColumn("enc", expr(s"replace(enc, '|$l||$r|', '|$l$r|')"))
    }.select(col("w"),
      size(expr("filter(split(enc, '[|][|]'), x -> x != '')")).cast("long").as("n_bpe"))
    docs.join(broadcast(encoded), "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_bpe")).as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") / col("n_words").cast("double"), 6)
          .as("fertility"))
      .orderBy(col("doc_id"))
  }

  val bpeEncodeSql: String =
    // replay training at the encode budget, then apply the learned
    // merges to the vocabulary ITERATIVELY via a per-row recursive CTE
    // (one rank per recursion step) — survives any k, unlike a k-deep
    // nested replace() chain; rows past exhaustion pass through on the
    // NULL-merge branch. Roll up per document at the end.
    s"""WITH RECURSIVE ${bpeWithBlock(BpeEncodeMerges)},
       |dt AS (SELECT doc_id, unnest($tokensSql) AS w FROM documents),
       |vw AS (SELECT DISTINCT w FROM dt),
       |rec(iter, w, enc) AS (
       |  SELECT 0, w, regexp_replace(w, '(.)', '||\\1', 'g') || '||' FROM vw
       |  UNION ALL
       |  SELECT r.iter + 1, r.w,
       |    CASE WHEN m.lhs IS NULL THEN r.enc
       |         ELSE replace(r.enc, '|' || m.lhs || '||' || m.rhs || '|',
       |                      '|' || m.lhs || m.rhs || '|') END
       |  FROM rec r LEFT JOIN merges m ON m.merge_rank = r.iter + 1
       |  WHERE r.iter < (SELECT count(*) FROM merges)),
       |venc AS (
       |  SELECT w, CAST(len(list_filter(string_split(enc, '||'), x -> x <> '')) AS BIGINT) AS n_bpe
       |  FROM rec WHERE iter = (SELECT count(*) FROM merges))
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
       |  round(CAST(sum(n_bpe) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS fertility
       |FROM dt JOIN venc USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** C75 `text_tokenizer_eval`: per-LANGUAGE tokenizer quality report —
    * fertility (BPE tokens per word) and compression (word chars per
    * BPE token) for the C68-trained tokenizer, the standard
    * multilingual-tokenizer disparity table (XLM-R/NLLB practice: a
    * language whose fertility runs ~2× English pays double the
    * sequence length for the same content, which mis-weights any
    * token-budgeted mixture — C73's budgets are exactly where this
    * feeds). Same shape as C69: the merge fold runs over the DISTINCT
    * VOCABULARY (narrow maps, broadcast back), the corpus contributes
    * one scan; per-language rollup is a map-side-combined aggregation.
    * Integer sums throughout; the two ratios round once at 6 dp.
    */
  def tokenizerEval(s: SparkSession, d: String): DataFrame = {
    val merges = bpeTrainOf(s, Tables.documents(s, d), BpeEncodeMerges).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val docs = Tables.documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("w"))
    val vocab = docs.select(col("w")).distinct()
    val encoded = merges.foldLeft(vocab.withColumn("enc",
        concat(regexp_replace(col("w"), "(.)", "||$1"), lit("||")))) { case (df, (l, r)) =>
      df.withColumn("enc", expr(s"replace(enc, '|$l||$r|', '|$l$r|')"))
    }.select(col("w"), length(col("w")).cast("long").as("n_chars_w"),
      size(expr("filter(split(enc, '[|][|]'), x -> x != '')")).cast("long").as("n_bpe"))
    docs.join(broadcast(encoded), "w")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_chars_w")).as("n_chars"),
        sum(col("n_bpe")).as("n_bpe_tokens"))
      .select(col("lang"), col("n_words"), col("n_chars"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") / col("n_words").cast("double"), 6)
          .as("fertility"),
        round(col("n_chars").cast("double") / col("n_bpe_tokens").cast("double"), 6)
          .as("chars_per_token"))
      .orderBy(col("lang"))
  }

  val tokenizerEvalSql: String =
    s"""WITH RECURSIVE ${bpeWithBlock(BpeEncodeMerges)},
       |dt AS (SELECT lang, unnest($tokensSql) AS w FROM documents),
       |vw AS (SELECT DISTINCT w FROM dt),
       |rec(iter, w, enc) AS (
       |  SELECT 0, w, regexp_replace(w, '(.)', '||\\1', 'g') || '||' FROM vw
       |  UNION ALL
       |  SELECT r.iter + 1, r.w,
       |    CASE WHEN m.lhs IS NULL THEN r.enc
       |         ELSE replace(r.enc, '|' || m.lhs || '||' || m.rhs || '|',
       |                      '|' || m.lhs || m.rhs || '|') END
       |  FROM rec r LEFT JOIN merges m ON m.merge_rank = r.iter + 1
       |  WHERE r.iter < (SELECT count(*) FROM merges)),
       |venc AS (
       |  SELECT w, CAST(length(w) AS BIGINT) AS n_chars_w,
       |    CAST(len(list_filter(string_split(enc, '||'), x -> x <> '')) AS BIGINT) AS n_bpe
       |  FROM rec WHERE iter = (SELECT count(*) FROM merges))
       |SELECT lang, count(*) AS n_words,
       |  CAST(sum(n_chars_w) AS BIGINT) AS n_chars,
       |  CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
       |  round(CAST(sum(n_bpe) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS fertility,
       |  round(CAST(sum(n_chars_w) AS DOUBLE) / CAST(sum(n_bpe) AS DOUBLE), 6) AS chars_per_token
       |FROM dt JOIN venc USING (w)
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** C72 `quality_auc`: exact ROC-AUC of the C39 quality classifier
    * against its own training labels (the calibration number a filter
    * design is judged by — "does the model-based gate actually rank
    * curated above crawl?"). Computed via the rank-sum identity
    * AUC = (Σ rank⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻) with AVERAGE ranks on
    * ties — exact, no trapezoid sampling. The C39 scores are already
    * 6-dp-snapped so ties are real and engine-identical; the rank
    * window runs over per-doc scores (one row per document — at
    * 100 TB a distributed sort by score, the same shape as C36's
    * range-partitioned shuffle, not a single-partition window... here
    * the |docs|-row window is acceptable at test scale and the
    * scaladoc'd scale path is rank = count-below + (ties+1)/2 via a
    * score-keyed aggregation join, identical output). One output row.
    */
  def qualityAuc(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = nbQuality(s, d)
      .join(Tables.documents(s, d).select(col("doc_id"),
        col("source").isin("src0", "src1", "src2", "src3").as("pos")), "doc_id")
    // average rank by score: count-below + (ties + 1) / 2 — a
    // score-keyed aggregation (map-side combined), no per-row window
    val byScore = scored.groupBy(col("llr")).agg(
      count(lit(1)).as("ties"),
      sum(when(col("pos"), 1L).otherwise(0L)).as("pos_ties"))
    val w = Window.orderBy(col("llr")).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byScore
      .withColumn("below", coalesce(sum(col("ties")).over(w), lit(0L)))
      .select(((col("below").cast("double") + (col("ties").cast("double") + lit(1.0)) / lit(2.0))
        * col("pos_ties").cast("double")).as("rank_sum_part"),
        col("pos_ties"), col("ties"))
    ranked.agg(
        sum(col("rank_sum_part")).as("rs"),
        sum(col("pos_ties")).cast("double").as("np"),
        (sum(col("ties")) - sum(col("pos_ties"))).cast("double").as("nn"))
      .select(
        col("np").cast("long").as("n_pos"), col("nn").cast("long").as("n_neg"),
        round((col("rs") - col("np") * (col("np") + lit(1.0)) / lit(2.0)) /
          (col("np") * col("nn")), 6).as("auc"))
  }

  val qualityAucSql: String =
    s"""WITH scored AS (
       |  SELECT q.llr, d.source IN ('src0','src1','src2','src3') AS pos
       |  FROM ($nbQualitySql) q JOIN documents d USING (doc_id)),
       |bys AS (
       |  SELECT llr, count(*) AS ties,
       |    sum(CASE WHEN pos THEN 1 ELSE 0 END) AS pos_ties
       |  FROM scored GROUP BY llr),
       |rk AS (
       |  SELECT (CAST(coalesce(sum(ties) OVER (ORDER BY llr
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
       |          + (CAST(ties AS DOUBLE) + 1.0) / 2.0) * CAST(pos_ties AS DOUBLE)
       |    AS rank_sum_part, pos_ties, ties
       |  FROM bys),
       |agg AS (
       |  SELECT sum(rank_sum_part) AS rs,
       |    CAST(sum(pos_ties) AS DOUBLE) AS np,
       |    CAST(sum(ties) - sum(pos_ties) AS DOUBLE) AS nn
       |  FROM rk)
       |SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       |  round((rs - np * (np + 1.0) / 2.0) / (np * nn), 6) AS auc
       |FROM agg""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_auc"      -> (qualityAuc _),
    "text_bpe_train"   -> (bpeTrain _),
    "text_bpe_encode"  -> (bpeEncode _),
    "text_normalize"   -> (textNormalize _),
    "text_compression" -> (textCompression _),
    "text_bm25"        -> (bm25 _),
    "corpus_zipf"      -> (corpusZipf _),
    "corpus_threshold_sweep" -> (thresholdSweep _),
    "text_vocab_coverage" -> (vocabCoverage _),
    "text_boilerplate" -> (boilerplate _),
    "sample_temperature" -> (sampleTemperature _),
    "sample_epochs"    -> (sampleEpochs _),
    "text_tokenizer_eval" -> (tokenizerEval _),
    "text_bigram_lp"   -> (bigramLp _),
    "text_nb_quality"  -> (nbQuality _),
    "text_lr_quality"  -> (lrQuality _),
    "sample_importance" -> (sampleImportance _),
    "corpus_profile"   -> (corpusProfile _),
    "sample_pack"      -> (samplePack _),
    "sample_stratified" -> (sampleStratified _),
    "corpus_domain_cap" -> (domainCap _),
    "sample_split"     -> (sampleSplit _),
    "sample_shuffle"   -> (sampleShuffle _),
    "sample_mixture"   -> (sampleMixture _),
    "text_entropy"     -> (charEntropy _),
    "text_ppl_buckets" -> (pplBuckets _),
    "corpus_vocab_growth" -> (vocabGrowth _),
    "corpus_divergence" -> (corpusDivergence _),
    "text_langid"      -> (langId _),
    "text_quality"     -> (quality _),
    "text_tokens"      -> (tokenCounts _),
    "text_fingerprint" -> (fingerprint _),
    "text_redact"      -> (redact _),
    "text_unigram_lp"  -> (unigramLogprob _),
    "text_contamination" -> (contamination _),
    "text_repetition"  -> (repetition _),
    "corpus_filter"    -> (corpusFilter _),
    "text_dup_spans"   -> (dupSpans _),
    "pipeline_corpus_e2e" -> (pipelineE2e _),
    "text_chunk"       -> (textChunk _),
    "text_bpe_pairs"   -> (bpePairs _),
    "text_unigram_train"  -> (UnigramLm.unigramTrain _),
    "text_unigram_encode" -> (UnigramLm.unigramEncode _),
    "text_unigram_check"  -> (UnigramLm.unigramCheck _),
    "text_tfidf"       -> (tfidf _))

  val oracles: Map[String, String] = Map(
    "quality_auc"      -> qualityAucSql,
    "text_unigram_check" -> UnigramLm.unigramCheckSql,
    "text_bpe_train"   -> bpeTrainSql,
    "text_bpe_encode"  -> bpeEncodeSql,
    "text_normalize"   -> textNormalizeSql,
    "text_compression" -> textCompressionSql,
    "text_bm25"        -> bm25Sql,
    "corpus_zipf"      -> corpusZipfSql,
    "corpus_threshold_sweep" -> thresholdSweepSql,
    "text_vocab_coverage" -> vocabCoverageSql,
    "text_boilerplate" -> boilerplateSql,
    "sample_temperature" -> sampleTemperatureSql,
    "sample_epochs"    -> sampleEpochsSql,
    "text_tokenizer_eval" -> tokenizerEvalSql,
    "text_bigram_lp"   -> bigramLpSql,
    "text_nb_quality"  -> nbQualitySql,
    "text_lr_quality"  -> lrQualitySql,
    "sample_importance" -> sampleImportanceSql,
    "corpus_profile"   -> corpusProfileSql,
    "sample_pack"      -> samplePackSql,
    "sample_stratified" -> sampleStratifiedSql,
    "corpus_domain_cap" -> domainCapSql,
    "sample_split"     -> sampleSplitSql,
    "sample_shuffle"   -> sampleShuffleSql,
    "sample_mixture"   -> sampleMixtureSql,
    "text_entropy"     -> charEntropySql,
    "text_ppl_buckets" -> pplBucketsSql,
    "corpus_vocab_growth" -> vocabGrowthSql,
    "corpus_divergence" -> corpusDivergenceSql,
    "text_langid"      -> langIdSql,
    "text_quality"     -> qualitySql,
    "text_tokens"      -> tokenCountsSql,
    "text_fingerprint" -> fingerprintSql,
    "text_redact"      -> redactSql,
    "text_unigram_lp"  -> unigramLogprobSql,
    "text_contamination" -> contaminationSql,
    "text_repetition"  -> repetitionSql,
    "corpus_filter"    -> corpusFilterSql,
    "text_dup_spans"   -> dupSpansSql,
    "pipeline_corpus_e2e" -> pipelineE2eSql,
    "text_chunk"       -> textChunkSql,
    "text_bpe_pairs"   -> bpePairsSql,
    "text_tfidf"       -> tfidfSql)
}
