package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Unigram-LM subword tokenizer (SentencePiece's unigram model — Kudo
  * 2018 re-derived from scratch) beside the C68 BPE trainer: pieces
  * carry PROBABILITIES and a word's tokenization is its most-likely
  * segmentation, where BPE's is a frozen merge replay.
  *
  * Shape is C68's verbatim (the bounded-table trainer recipe): the
  * corpus is touched ONCE — the same map-side-combined word-frequency
  * groupBy with the deterministic top-[[TextOps.BpeVocabCap]] cut — and
  * the training loop (seed → EM → prune → EM …) runs DRIVER-LOCAL over
  * that bounded table: zero further Spark jobs, zero further corpus
  * reads. Encoding is distributed: the final (piece, logprob) vocab is
  * a few-KB plan constant riding a [[graft.functions.UnigramSegmentN]]
  * narrow map over the DISTINCT corpus words (C69's broadcast-back
  * shape).
  *
  * The trainer is the real algorithm with two documented
  * simplifications (both standard in from-scratch reimplementations):
  * M-step is plain MLE (SentencePiece Bayesianizes with digamma), and
  * pruning ranks pieces by their EXPECTED COUNT under the current
  * model instead of the exact leave-one-out likelihood loss (the loss
  * and the expected count order pieces near-identically at the tail
  * being cut; single-character pieces are never pruned, which is the
  * coverage guarantee both share). EM is full forward-backward over
  * each word's segmentation lattice in log space — corpus
  * log-likelihood is non-decreasing per EM step, and the spec asserts
  * the recorded trace.
  *
  * Everything is deterministic: seed/prune ties break on UTF-8 byte
  * order, Viterbi ties prefer the FEWER-piece segmentation then
  * lexicographic — equal corpora give byte-equal vocabularies on any
  * cluster.
  */
object UnigramLm {

  /** Final vocabulary size (test-scale dial; production = 32k–128k —
    * the loop is O(seed·len) per EM pass regardless of corpus size).
    */
  val VocabTarget = 512
  val MaxPieceLen = 8
  /** Seed pieces before pruning (≈ 8× the target, SentencePiece's
    * seed_sentencepiece_size role, similarly capped).
    */
  val SeedCap = 4096
  val EmItersPerRound = 2
  /** Fraction KEPT per prune round. */
  val KeepFraction = 0.75

  private def utf8Lt(a: String, b: String): Boolean = {
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

  private def logSumExp(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }

  /** Train on a capped (word, freq) table. Returns the final
    * (piece, logprob) vocabulary (sorted by logprob desc, piece asc)
    * and the corpus log-likelihood trace across every EM step (for the
    * monotonicity spec).
    */
  def train(wf: Array[(String, Long)], vocabTarget: Int = VocabTarget)
      : (Array[(String, Double)], Seq[Double]) = {
    import scala.collection.mutable
    // ---- seed: all substrings ≤ MaxPieceLen by occurrence mass ------
    val seedCnt = mutable.Map.empty[String, Long]
    for ((w, f) <- wf; i <- 0 until w.length;
         j <- (i + 1) to math.min(i + MaxPieceLen, w.length))
      seedCnt(w.substring(i, j)) = seedCnt.getOrElse(w.substring(i, j), 0L) + f
    val chars = seedCnt.keys.filter(_.length == 1).toSeq
    val multi = seedCnt.toSeq.filter(_._1.length > 1)
      .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && utf8Lt(a._1, b._1)))
      .take(math.max(0, SeedCap - chars.size)).map(_._1)
    var pieces: Array[String] = (chars ++ multi).toArray.sortWith(utf8Lt)
    var logp: mutable.Map[String, Double] = {
      val tot = pieces.map(seedCnt(_).toDouble).sum
      mutable.Map(pieces.map(p => p -> math.log(seedCnt(p) / tot)): _*)
    }
    val llTrace = mutable.ArrayBuffer.empty[Double]

    // ---- one EM step: forward-backward expected counts ---------------
    def emStep(): mutable.Map[String, Double] = {
      val exp = mutable.Map.empty[String, Double]
      var ll = 0.0
      for ((w, f) <- wf) {
        val n = w.length
        val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
        val beta = Array.fill(n + 1)(Double.NegativeInfinity)
        alpha(0) = 0.0; beta(n) = 0.0
        for (i <- 1 to n; j <- math.max(0, i - MaxPieceLen) until i) {
          val lp = logp.get(w.substring(j, i))
          if (lp.isDefined && alpha(j) != Double.NegativeInfinity)
            alpha(i) = logSumExp(alpha(i), alpha(j) + lp.get)
        }
        for (i <- (n - 1) to 0 by -1; j <- (i + 1) to math.min(i + MaxPieceLen, n)) {
          val lp = logp.get(w.substring(i, j))
          if (lp.isDefined && beta(j) != Double.NegativeInfinity)
            beta(i) = logSumExp(beta(i), lp.get + beta(j))
        }
        val z = alpha(n)
        if (z != Double.NegativeInfinity) {
          ll += f * z
          for (i <- 0 until n; j <- (i + 1) to math.min(i + MaxPieceLen, n)) {
            val p = w.substring(i, j)
            val lp = logp.get(p)
            if (lp.isDefined && alpha(i) != Double.NegativeInfinity &&
                beta(j) != Double.NegativeInfinity) {
              val post = math.exp(alpha(i) + lp.get + beta(j) - z)
              if (post > 0) exp(p) = exp.getOrElse(p, 0.0) + f * post
            }
          }
        }
      }
      llTrace += ll
      // M-step: MLE renormalization
      val tot = exp.values.sum
      logp = mutable.Map(exp.iterator.map { case (p, c) => p -> math.log(c / tot) }.toSeq: _*)
      // pieces that got zero expectation vanish from logp; keep chars
      // alive at a floor so coverage never breaks mid-training
      for (c <- chars) if (!logp.contains(c)) logp(c) = math.log(1e-12)
      exp
    }

    // ---- EM + prune until the target size -----------------------------
    var expected = mutable.Map.empty[String, Double]
    for (_ <- 1 to EmItersPerRound) expected = emStep()
    pieces = logp.keys.toArray
    while (pieces.length > vocabTarget) {
      val (mono, rest) = pieces.partition(_.length == 1)
      val keepN = math.max(vocabTarget - mono.length,
        math.min(rest.length - 1, (rest.length * KeepFraction).toInt))
      val kept = rest
        .sortWith((a, b) => {
          val ca = expected.getOrElse(a, 0.0); val cb = expected.getOrElse(b, 0.0)
          ca > cb || (ca == cb && utf8Lt(a, b))
        })
        .take(math.max(0, keepN))
      pieces = mono ++ kept
      val keep = pieces.toSet
      logp = logp.filter { case (p, _) => keep.contains(p) }
      for (_ <- 1 to EmItersPerRound) expected = emStep()
      pieces = logp.keys.toArray
    }
    val out = logp.toArray
      .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && utf8Lt(a._1, b._1)))
    (out, llTrace.toSeq)
  }

  /** Serializable Viterbi vocabulary (plan constant for the encode
    * expression): piece → logprob, plus the max piece length.
    */
  final class Vocab(val pieces: Array[String], val logps: Array[Double])
      extends Serializable {
    @transient lazy val map: java.util.HashMap[String, java.lang.Double] = {
      val m = new java.util.HashMap[String, java.lang.Double]()
      var i = 0
      while (i < pieces.length) { m.put(pieces(i), logps(i)); i += 1 }
      m
    }
    @transient lazy val maxLen: Int =
      if (pieces.isEmpty) 1 else pieces.iterator.map(_.length).max
  }

  /** Viterbi best segmentation: max total logprob, ties → fewer pieces,
    * then the lexicographically-smallest piece sequence (full
    * determinism). Characters missing from the vocab pass through as
    * single-char pieces at a floor logprob (never on corpus-trained
    * words, but encode must total-function).
    */
  def viterbi(word: String, v: Vocab): Array[String] = {
    val n = word.length
    val Floor = -1e9
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val bestK = Array.fill(n + 1)(Int.MaxValue)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0; bestK(0) = 0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - math.max(v.maxLen, 1))
      while (j < i) {
        if (best(j) != Double.NegativeInfinity) {
          val piece = word.substring(j, i)
          val lp0 = v.map.get(piece)
          val lp: Double =
            if (lp0 != null) lp0.doubleValue
            else if (i - j == 1) Floor
            else Double.NegativeInfinity
          if (lp != Double.NegativeInfinity) {
            val cand = best(j) + lp
            val candK = bestK(j) + 1
            val better = cand > best(i) ||
              (cand == best(i) && (candK < bestK(i) ||
                (candK == bestK(i) && back(i) >= 0 && j < back(i))))
            if (better) { best(i) = cand; bestK(i) = candK; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { out += word.substring(back(k), k); k = back(k) }
    out.reverse.toArray
  }

  /** Static kernel for the codegen'd expression. */
  def segmentCount(word: org.apache.spark.unsafe.types.UTF8String, v: Vocab): Long =
    viterbi(word.toString, v).length.toLong

  def segmentJoined(word: org.apache.spark.unsafe.types.UTF8String,
      v: Vocab): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      viterbi(word.toString, v).mkString(" "))

  // ---- driver entries -------------------------------------------------

  private def cappedWordFreq(s: SparkSession, docs: DataFrame): Array[(String, Long)] =
    docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(TextOps.BpeVocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  private[graft] def trainOf(s: SparkSession, docs: DataFrame,
      target: Int = VocabTarget): (Array[(String, Double)], Seq[Double]) =
    train(cappedWordFreq(s, docs), target)

  /** `text_unigram_train`: the trained (rank, piece, logprob) table —
    * EM has no SQL replay (unlike C68's merge list), so the entry is
    * rows-only; `text_unigram_check` is the full-pass twin.
    */
  def unigramTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (vocab, _) = trainOf(s, Tables.documents(s, d))
    vocab.zipWithIndex
      .map { case ((p, lp), i) => (i + 1L, p, math.rint(lp * 1e6) / 1e6) }
      .toSeq.toDF("rank", "piece", "logprob")
      .orderBy(col("rank"))
  }

  /** `text_unigram_encode`: Viterbi-encode the corpus under the trained
    * vocab — per-document token counts and fertility, C69's
    * distinct-words + broadcast-back shape with the vocabulary as a
    * plan constant through the codegen'd segment-count kernel.
    */
  def unigramEncode(s: SparkSession, d: String): DataFrame = {
    val (vocabArr, _) = trainOf(s, Tables.documents(s, d))
    val v = new Vocab(vocabArr.map(_._1), vocabArr.map(_._2))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
    val encoded = docs.select(col("w")).distinct()
      .withColumn("n_pieces", graft.functions.exprs.unigramSegmentN(col("w"), v))
    docs.join(broadcast(encoded), "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_unigram_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_unigram_tokens"),
        round(col("n_unigram_tokens").cast("double") / col("n_words").cast("double"), 6)
          .as("fertility"))
      .orderBy(col("doc_id"))
  }

  /** `text_unigram_check`: the deterministic full-pass twin — Spark
    * verifies the trained model's hard invariants and emits violation
    * counts the oracle pins at zero:
    *  - coverage: every character of the capped word table is a piece;
    *  - probability: Σ exp(logprob) = 1 within 1e-6;
    *  - size: vocab ≤ target, > target·KeepFraction (the prune loop
    *    terminated AT the target, not past it);
    *  - reconstruction: Viterbi pieces of every vocab word concatenate
    *    back to the word exactly.
    */
  def unigramCheck(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wf = cappedWordFreq(s, Tables.documents(s, d))
    val (vocabArr, _) = train(wf)
    val v = new Vocab(vocabArr.map(_._1), vocabArr.map(_._2))
    val pieceSet = vocabArr.map(_._1).toSet
    val coverageViolations =
      wf.flatMap(_._1.map(_.toString)).distinct.count(c => !pieceSet.contains(c)).toLong
    val probSum = vocabArr.map { case (_, lp) => math.exp(lp) }.sum
    val probViolations = if (math.abs(probSum - 1.0) < 1e-6) 0L else 1L
    val sizeViolations =
      if (vocabArr.length <= VocabTarget) 0L else 1L
    val reconstructionViolations =
      wf.count { case (w, _) => viterbi(w, v).mkString("") != w }.toLong
    Seq((coverageViolations, probViolations, sizeViolations, reconstructionViolations))
      .toDF("coverage_violations", "prob_violations", "size_violations",
        "reconstruction_violations")
  }

  val unigramCheckSql: String =
    "SELECT CAST(0 AS BIGINT) AS coverage_violations, " +
      "CAST(0 AS BIGINT) AS prob_violations, " +
      "CAST(0 AS BIGINT) AS size_violations, " +
      "CAST(0 AS BIGINT) AS reconstruction_violations"
}
