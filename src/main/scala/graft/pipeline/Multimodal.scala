package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** C12 `mm_decode_stub`: multimodal-column plumbing (SURVEY.md §2.C12).
  *
  * Media assets ride through the pipeline as opaque `binary` payloads
  * plus a typed metadata struct — the Spark-side contract a real
  * image/audio pipeline needs: schema, per-partition batched decode,
  * and a typed `Dataset` boundary. The codec itself is a clearly-marked
  * STUB (this container has no image/audio libraries): payloads are the
  * documents' UTF-8 bytes and "decode" derives deterministic features,
  * so the whole path — including the oracle — stays verifiable.
  *
  * Scale notes: decode runs in `mapPartitions` (one codec init per
  * partition, not per row — the pattern you'd use for a JNI decoder or
  * an Arrow-batched Python worker); payload columns should be
  * size-capped per row group, and decode output is columnar-friendly
  * case classes, so Tungsten keeps it off-heap.
  */
object Multimodal {

  /** Typed decode output. */
  final case class MmFeature(
      doc_id: Long, n_bytes: Long, checksum: Long, width: Long, n_frames: Long)

  /** Raw asset row: payload + metadata struct, the storage schema. */
  def assets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** Batched "decode": one iterator pass per partition.
    *
    * STUB CODEC — a real implementation would hand `payload` to an
    * image/audio decoder here; the fake features below are
    * deterministic functions of the bytes so correctness of the
    * *plumbing* (schema, batching, partition shape) is still oracled.
    */
  def decode(s: SparkSession, raw: DataFrame): Dataset[MmFeature] = {
    import s.implicits._
    raw.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here (e.g. loading a JNI lib)
        it.map { case (id, bytes) =>
          val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          MmFeature(
            doc_id = id,
            n_bytes = bytes.length.toLong,
            checksum = Hashing.polyHashString(text),
            width = bytes.length.toLong % 64,           // stub "decoded width"
            n_frames = bytes.length.toLong / 1024 + 1)  // stub "frame count"
        }
      }
  }

  def mmDecodeStub(s: SparkSession, d: String): DataFrame =
    decode(s, assets(s, d)).toDF().orderBy("doc_id")

  /** Oracle recomputes the stub features from the raw text (UTF-8 byte
    * length via encode(); checksum via the portable polynomial hash).
    */
  val mmDecodeStubSql: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  list_reduce(list_transform(string_split(text, ''), ch -> ascii(ch)::BIGINT),
      |              (a, x) -> (a * 31 + x) % 1000000007) AS checksum,
      |  octet_length(encode(text)) % 64 AS width,
      |  octet_length(encode(text)) // 1024 + 1 AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Output of the full media pipeline (resize + frame-sample). */
  final case class MmSample(
      doc_id: Long, out_chars: Long, thumb_hash: Long, n_sampled: Long)

  private val ThumbChars = 2048
  private val FrameStride = 4
  private val BatchSize = 64

  /** C19 `mm_pipeline_stub`: the decode → resize → frame-sample chain a
    * video/image curation pipeline runs, as one batched per-partition
    * pass. Rows are processed in fixed-size batches (`grouped(64)`) —
    * the shape a real implementation needs to amortize GPU/codec
    * submissions — and each stage is a STUB with deterministic outputs
    * ("resize" = first 2048 chars, "thumbnail hash" = portable
    * polyhash of the resized content, "frame sampling" = every 4th
    * stub frame), so the plumbing stays exactly oracle-checkable.
    */
  def pipeline(s: SparkSession, d: String): Dataset[MmSample] = {
    import s.implicits._
    assets(s, d).select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition: codec/accelerator init would go here
        it.grouped(BatchSize).flatMap { batch =>
          // per-batch: a real pipeline submits `batch` to the device
          batch.iterator.map { case (id, bytes) =>
            val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
            val thumb = text.take(ThumbChars) // stub "resize"
            val frames = bytes.length.toLong / 1024 + 1
            MmSample(
              doc_id = id,
              out_chars = thumb.length.toLong,
              thumb_hash = Hashing.polyHashString(thumb),
              n_sampled = (frames + FrameStride - 1) / FrameStride)
          }
        }
      }
  }

  def mmPipelineStub(s: SparkSession, d: String): DataFrame =
    pipeline(s, d).toDF().orderBy("doc_id")

  val mmPipelineStubSql: String =
    s"""SELECT doc_id,
       |  length(substring(text, 1, $ThumbChars)) AS out_chars,
       |  list_reduce(list_transform(string_split(substring(text, 1, $ThumbChars), ''),
       |              ch -> ascii(ch)::BIGINT), (a, x) -> (a * 31 + x) % 1000000007) AS thumb_hash,
       |  (octet_length(encode(text)) // 1024 + 1 + ${FrameStride - 1}) // $FrameStride AS n_sampled
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---- REAL codec path (C12/C19 non-stub): javax.imageio PNG ---------
  //
  // The JDK ships a PNG codec, so the decode stage can be REAL with
  // zero new dependencies: per-document images are synthesized from
  // deterministic pixel arithmetic, PNG-encoded into the binary
  // `payload` column, and the decode stage round-trips them through
  // `ImageIO.read` — actual bytes through an actual image codec, in the
  // same per-partition batched shape a JNI/GPU decoder needs. PNG is
  // lossless RGB, so every decoded feature (dimensions, pixel
  // checksum, thumbnail) is exactly recomputable by the DuckDB oracle
  // from doc_id alone.

  private val Mod = 1000000007L

  /** Deterministic RGB pixel i (row-major) of doc `docId` — shared by
    * the synthesizer, and mirrored by the oracle SQL.
    */
  private[graft] def pixel(docId: Long, i: Long): Int = {
    val r = ((7 * docId + 3 * i) % 256).toInt
    val g = ((11 * docId + 5 * i) % 256).toInt
    val b = ((13 * docId + 7 * i) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  private def widthOf(id: Long): Int = 8 + (id % 9).toInt
  private def heightOf(id: Long): Int = 6 + (id % 5).toInt

  /** (doc_id, payload: REAL PNG bytes, meta) — the storage schema with
    * a genuine image codec behind it.
    */
  def imageAssets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val encoded = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = widthOf(id); val h = heightOf(id)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, pixel(id, i)); i += 1; x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }.toDF("doc_id", "payload")
    encoded.select(
      col("doc_id"), col("payload"),
      struct(
        lit("image/png").as("mime"),
        octet_length(col("payload")).cast("long").as("n_bytes")).as("meta"))
  }

  /** Decoded-image features. */
  final case class MmImage(doc_id: Long, width: Long, height: Long, px_checksum: Long)

  /** REAL decode: payload → `ImageIO.read` → dimensions + a rolling
    * checksum over the decoded pixels. One codec pass per partition
    * iterator (init cost amortized), rows independent — the exact
    * shape of a production image-pipeline decode stage.
    */
  def decodeImages(s: SparkSession, raw: DataFrame): Dataset[MmImage] = {
    import s.implicits._
    raw.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition: ImageIO plugin lookup happens once per JVM;
        // a JNI decoder would initialize here
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"doc $id payload is not a decodable image")
          val w = img.getWidth; val h = img.getHeight
          var acc = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { acc = (acc * 31 + (img.getRGB(x, y) & 0xFFFFFF)) % Mod; x += 1 }
            y += 1
          }
          MmImage(id, w.toLong, h.toLong, acc)
        }
      }
  }

  def mmDecode(s: SparkSession, d: String): DataFrame =
    decodeImages(s, imageAssets(s, d)).toDF().orderBy("doc_id")

  /** Oracle recomputes dimensions + checksum from doc_id: PNG is
    * lossless, so decoded pixels equal the synthesized arithmetic.
    * (list_reduce seeds with the first element; that equals a 0-seeded
    * fold since 0*31 + x1 = x1.)
    */
  val mmDecodeSql: String =
    """SELECT doc_id,
      |  8 + doc_id % 9 AS width,
      |  6 + doc_id % 5 AS height,
      |  list_reduce(
      |    list_transform(range(0, (8 + doc_id % 9) * (6 + doc_id % 5)),
      |      i -> ((7*doc_id + 3*i) % 256) * 65536
      |         + ((11*doc_id + 5*i) % 256) * 256
      |         + (13*doc_id + 7*i) % 256),
      |    (a, x) -> (a * 31 + x) % 1000000007) AS px_checksum
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Thumbnail features from the real pipeline. */
  final case class MmThumb(doc_id: Long, out_w: Long, out_h: Long, thumb_checksum: Long)

  private val ThumbW = 4
  private val ThumbH = 3

  /** C19 non-stub: decode → nearest-neighbor resize to 4×3 — REAL pixel
    * work on the REALLY-decoded image, batched (`grouped(64)`) the way
    * accelerator submission needs. Nearest-neighbor is chosen over
    * bilinear because it is exactly integer-reproducible, so the
    * pipeline stays oracle-checkable end to end.
    */
  def imagePipeline(s: SparkSession, d: String): Dataset[MmThumb] = {
    import s.implicits._
    imageAssets(s, d).select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          // a real pipeline submits `batch` to the device in one call
          batch.iterator.map { case (id, bytes) =>
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            val w = img.getWidth; val h = img.getHeight
            var acc = 0L
            var ty = 0
            while (ty < ThumbH) {
              var tx = 0
              while (tx < ThumbW) {
                val sx = tx * w / ThumbW
                val sy = ty * h / ThumbH
                acc = (acc * 31 + (img.getRGB(sx, sy) & 0xFFFFFF)) % Mod
                tx += 1
              }
              ty += 1
            }
            MmThumb(id, ThumbW.toLong, ThumbH.toLong, acc)
          }
        }
      }
  }

  def mmPipeline(s: SparkSession, d: String): DataFrame =
    imagePipeline(s, d).toDF().orderBy("doc_id")

  val mmPipelineSql: String =
    s"""SELECT doc_id, CAST($ThumbW AS BIGINT) AS out_w, CAST($ThumbH AS BIGINT) AS out_h,
       |  list_reduce(
       |    list_transform(range(0, ${ThumbW * ThumbH}), j ->
       |      ((7*doc_id + 3*(((j // $ThumbW) * (6 + doc_id % 5) // $ThumbH) * (8 + doc_id % 9)
       |                      + (j % $ThumbW) * (8 + doc_id % 9) // $ThumbW)) % 256) * 65536
       |    + ((11*doc_id + 5*(((j // $ThumbW) * (6 + doc_id % 5) // $ThumbH) * (8 + doc_id % 9)
       |                      + (j % $ThumbW) * (8 + doc_id % 9) // $ThumbW)) % 256) * 256
       |    +  (13*doc_id + 7*(((j // $ThumbW) * (6 + doc_id % 5) // $ThumbH) * (8 + doc_id % 9)
       |                      + (j % $ThumbW) * (8 + doc_id % 9) // $ThumbW)) % 256),
       |    (a, x) -> (a * 31 + x) % 1000000007) AS thumb_checksum
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---- C40 audio frame-sampling -------------------------------------

  /** Deterministic PCM16 sample i of doc `docId` — shared by the
    * synthesizer and mirrored by the oracle SQL (the arithmetic IS the
    * waveform, so the oracle can verify the full byte round-trip
    * without a codec of its own).
    */
  private[graft] def pcmSample(docId: Long, i: Long): Int =
    (((docId * 2654435761L + i * 2246822519L) % 65536L) - 32768L).toInt

  private val AudioSamples = 2048
  private val FrameLen = 256

  /** (doc_id, payload: little-endian PCM16 bytes, meta) — the audio
    * storage schema: an opaque binary column plus typed metadata, the
    * same shape a real ingest lands (payload would be FLAC/WAV there;
    * here it is genuine 2-byte-per-sample PCM the decode stage must
    * actually parse back).
    */
  def audioAssets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val bb = java.nio.ByteBuffer.allocate(AudioSamples * 2)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < AudioSamples) { bb.putShort(pcmSample(id, i).toShort); i += 1 }
          (id, bb.array())
        }
      }.toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit("audio/pcm16le").as("mime"),
          lit(16000L).as("sample_rate"),
          octet_length(col("payload")).cast("long").as("n_bytes")).as("meta"))
  }

  final case class MmFrame(doc_id: Long, frame_id: Long, n_samples: Long, energy: Long)

  /** REAL decode + frame-sample: payload bytes → int16 samples →
    * fixed 256-sample frames → per-frame energy (sum of squares,
    * exact integer arithmetic — zero fp-divergence risk). One
    * ByteBuffer pass per row inside a per-partition iterator, rows
    * independent — the production shape of an audio feature stage; a
    * JNI decoder (FLAC/opus) would initialize once per partition
    * where the ByteBuffer wrap happens.
    */
  def frameAudio(s: SparkSession, raw: DataFrame): Dataset[MmFrame] = {
    import s.implicits._
    raw.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = bytes.length / 2
        (0 until (n + FrameLen - 1) / FrameLen).map { f =>
          val start = f * FrameLen
          val end = math.min(start + FrameLen, n)
          var acc = 0L
          var i = start
          while (i < end) { val v = bb.getShort(i * 2).toLong; acc += v * v; i += 1 }
          MmFrame(id, f.toLong, (end - start).toLong, acc)
        }
      }
  }

  def mmAudioFrames(s: SparkSession, d: String): DataFrame =
    frameAudio(s, audioAssets(s, d)).toDF().orderBy("doc_id", "frame_id")

  /** Oracle recomputes every frame energy from the generator
    * arithmetic — equality proves the encode → binary column → decode
    * round-trip byte-exact.
    */
  val mmAudioFramesSql: String =
    """WITH f AS (SELECT doc_id, unnest(range(0, 8)) AS frame_id FROM documents),
      |s AS (SELECT doc_id, frame_id, unnest(range(0, 256)) AS j FROM f),
      |v AS (SELECT doc_id, frame_id,
      |  ((doc_id * 2654435761 + (frame_id * 256 + j) * 2246822519) % 65536) - 32768 AS x
      |  FROM s)
      |SELECT doc_id, frame_id, count(*) AS n_samples,
      |  CAST(sum(x * x) AS BIGINT) AS energy
      |FROM v GROUP BY doc_id, frame_id ORDER BY doc_id, frame_id""".stripMargin

  // ---- C50 video frame-sampling --------------------------------------

  /** Deterministic RGB byte i of doc `docId`'s video payload — the
    * synthesizer arithmetic, mirrored by the oracle SQL exactly like
    * [[pcmSample]] for audio.
    */
  private[graft] def videoByte(docId: Long, i: Long): Int =
    ((docId * 31L + i * 2654435761L) % 256L).toInt

  private val VidW = 16; private val VidH = 12; private val VidFrames = 24
  private val VidStride = 6
  private val FrameBytes = VidW * VidH * 3

  /** (doc_id, payload: packed RGB24 frames, meta) — the video storage
    * schema: one opaque binary column holding F fixed-size frames plus
    * typed metadata (mime, dims, frame count). A real ingest lands
    * H.264 here; the synthetic payload is genuinely byte-packed so the
    * sampling stage must parse real offsets.
    */
  def videoAssets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val bytes = new Array[Byte](VidFrames * FrameBytes)
          var i = 0
          while (i < bytes.length) { bytes(i) = videoByte(id, i.toLong).toByte; i += 1 }
          (id, bytes)
        }
      }.toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit("video/rgb24").as("mime"),
          lit(VidW.toLong).as("width"), lit(VidH.toLong).as("height"),
          lit(VidFrames.toLong).as("n_frames")).as("meta"))
  }

  final case class MmVideoFrame(doc_id: Long, frame_id: Long,
      n_bytes: Long, byte_sum: Long)

  /** REAL frame-sampling over the binary payload: every
    * [[VidStride]]-th frame is sliced out by OFFSET (start = f ×
    * frameBytes — the unsampled frames' bytes are never touched, which
    * is the entire point of stride sampling on video: at 100 TB the
    * stage reads 1/stride of the corpus bytes) and reduced to an exact
    * integer byte sum. One pass per row inside a per-partition
    * iterator; a JNI codec (ffmpeg keyframe extraction) would
    * initialize once per partition exactly here.
    */
  def sampleVideoFrames(s: SparkSession, raw: DataFrame): Dataset[MmVideoFrame] = {
    import s.implicits._
    raw.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = bytes.length / FrameBytes
        (0 until nFrames by VidStride).map { f =>
          val start = f * FrameBytes
          var acc = 0L
          var i = start
          while (i < start + FrameBytes) { acc += bytes(i) & 0xff; i += 1 }
          MmVideoFrame(id, f.toLong, FrameBytes.toLong, acc)
        }
      }
  }

  def mmVideoFrames(s: SparkSession, d: String): DataFrame =
    sampleVideoFrames(s, videoAssets(s, d)).toDF().orderBy("doc_id", "frame_id")

  /** Oracle recomputes every sampled frame's byte sum from the
    * generator arithmetic — equality proves the pack → binary column →
    * offset-sliced decode round-trip byte-exact, and that exactly the
    * strided frames were sampled.
    */
  val mmVideoFramesSql: String =
    s"""WITH f AS (SELECT doc_id, unnest(range(0, $VidFrames, $VidStride)) AS frame_id
       |           FROM documents),
       |b AS (SELECT doc_id, frame_id,
       |  frame_id * $FrameBytes + unnest(range(0, $FrameBytes)) AS i FROM f)
       |SELECT doc_id, frame_id, CAST($FrameBytes AS BIGINT) AS n_bytes,
       |  CAST(sum((doc_id * 31 + i * 2654435761) % 256) AS BIGINT) AS byte_sum
       |FROM b GROUP BY doc_id, frame_id ORDER BY doc_id, frame_id""".stripMargin

  // ---- C58 image perceptual-hash near-dup dedup ---------------------

  private val PhashPlantEvery = 10L
  private[graft] val PhashPlantOffset = 500000000L
  /** Hamming admission: planted re-encodes measure 0–3 flipped bits
    * (a perturbation only flips a dHash bit where the adjacent-pixel
    * gray difference is already near zero); unrelated noise images
    * concentrate at 32 ± 4 of 64, so 10 sits ≈ 5.5σ below the random
    * mass while never clipping a true variant.
    */
  private[graft] val PhashHammingMax = 10L
  private val PhashW = 16; private val PhashH = 12

  /** Deterministic NOISE pixel (hash-derived, unlike [[pixel]]'s
    * gradient): perceptual hashes of gradients are degenerate (every
    * image's adjacent-difference signs agree), so the dedup corpus
    * needs pixel content whose dHash bits are independent.
    */
  private def pixelRnd(docId: Long, i: Long): Int =
    ((Hashing.mix64(docId * -7046029254386353131L + i * 2246822519L) >>> 16) & 0xFFFFFF).toInt

  /** Image corpus with planted near-duplicates: every 10th document's
    * image also appears under `PhashPlantOffset + id` with a mild
    * re-encode-style perturbation (+8 blue on every 11th pixel) — the
    * "same photo, different compression" population an image dedup
    * pass exists to catch.
    */
  def phashAssets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          def png(perturb: Boolean): Array[Byte] = {
            val img = new java.awt.image.BufferedImage(
              PhashW, PhashH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var i = 0L; var y = 0
            while (y < PhashH) {
              var x = 0
              while (x < PhashW) {
                var p = pixelRnd(id, i)
                if (perturb && i % 11 == 0)
                  p = (p & 0xFFFF00) | math.min(255, (p & 0xFF) + 8)
                img.setRGB(x, y, p); i += 1; x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            bos.toByteArray
          }
          val base = Seq((id, png(false)))
          if (id % PhashPlantEvery == 0) base :+ ((PhashPlantOffset + id, png(true)))
          else base
        }
      }.toDF("doc_id", "payload")
  }

  final case class MmPhash(doc_id: Long, dhash: Long)

  /** dHash over the REALLY-decoded image: nearest-neighbor sample to a
    * 9×8 gray grid, bit = (right neighbor brighter) — the classic
    * 64-bit difference hash, integer-exact end to end.
    */
  def dhashImages(s: SparkSession, raw: DataFrame): Dataset[MmPhash] = {
    import s.implicits._
    raw.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"doc $id payload is not a decodable image")
          val w = img.getWidth; val h = img.getHeight
          val gray = Array.ofDim[Int](8, 9)
          var ty = 0
          while (ty < 8) {
            var tx = 0
            while (tx < 9) {
              val rgb = img.getRGB(tx * w / 9, ty * h / 8)
              gray(ty)(tx) = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
              tx += 1
            }
            ty += 1
          }
          var hash = 0L; var bit = 0
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              if (gray(y)(x + 1) > gray(y)(x)) hash |= 1L << bit
              bit += 1; x += 1
            }
            y += 1
          }
          MmPhash(id, hash)
        }
      }
  }

  /** C58 `mm_phash_dedup`: image near-duplicate detection — decode →
    * dHash → 8×8-bit Hamming bands → within-bucket pairs → Hamming ≤
    * [[PhashHammingMax]]. Same LSH scale shape as the text SimHash
    * pass (candidates are within-band, never all-pairs; a ≤ 3-bit
    * variant always shares ≥ 5 of 8 bands), but over a REAL image
    * codec. On the deterministic corpus the admitted pairs are exactly
    * the planted variants, so the oracle is the closed-form plant
    * list — the recall-1/precision-1 evidence at both gated SFs.
    */
  def mmPhashDedup(s: SparkSession, d: String): DataFrame =
    hammingPairs(dhashImages(s, phashAssets(s, d)).toDF(), "dhash")

  /** Shared 64-bit-sketch near-dup pipeline (C58 images / C59 audio):
    * 8×8-bit Hamming bands → within-bucket pairs → Hamming ≤
    * [[PhashHammingMax]]. Candidates are within-band only — the text
    * SimHash scale shape over media sketches.
    */
  private def hammingPairs(hashes: DataFrame, hashCol: String,
      maxHamming: Long = PhashHammingMax): DataFrame = {
    val banded = hashes.select(col("doc_id"), col(hashCol).as("h64"),
      posexplode(array((0 to 7).map(b =>
        shiftrightunsigned(col(hashCol), b * 8).bitwiseAND(lit(0xFFL))): _*))
        .as(Seq("band", "key")))
    banded.groupBy(col("band"), col("key"))
      .agg(collect_list(struct(col("doc_id"), col("h64"))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(explode(Dedup.bucketPairs(col("xs"))).as("p"))
      .select(col("p.doc_a.doc_id").as("doc_a"), col("p.doc_a.h64").as("ha"),
        col("p.doc_b.doc_id").as("doc_b"), col("p.doc_b.h64").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- C59 audio fingerprint near-dup dedup -------------------------

  private[graft] val AudioPlantOffset = 600000000L
  private val AfpFrame = 32

  /** Hash-mixed PCM for the dedup corpus (NOT [[pcmSample]]: that
    * generator is an additive per-doc shift in the 16-bit ring, so
    * every document's energy contour is a near-copy and a contour
    * fingerprint would degenerate — exactly like [[pixelRnd]] vs the
    * gradient [[pixel]]).
    */
  private def pcmRnd(docId: Long, i: Long): Int =
    ((Hashing.mix64(docId * 2654435761L + i * -8796714831421723037L) & 0xFFFFL) - 32768L).toInt

  /** Audio corpus with planted near-duplicates: every 10th document's
    * PCM also appears under `AudioPlantOffset + id` with mild
    * re-encode-style noise (+3 on every 17th sample) — the "same
    * recording, different lossy encode" population.
    */
  def afpAssets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          def pcm(perturb: Boolean): Array[Byte] = {
            val bb = java.nio.ByteBuffer.allocate(AudioSamples * 2)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            var i = 0
            while (i < AudioSamples) {
              var v = pcmRnd(id, i)
              if (perturb && i % 17 == 0) v = math.min(32767, v + 3)
              bb.putShort(v.toShort); i += 1
            }
            bb.array()
          }
          val base = Seq((id, pcm(false)))
          if (id % PhashPlantEvery == 0) base :+ ((AudioPlantOffset + id, pcm(true)))
          else base
        }
      }.toDF("doc_id", "payload")
  }

  final case class MmAfp(doc_id: Long, afp: Long)

  /** Energy-contour fingerprint over REALLY-decoded PCM: 64 frames of
    * 32 samples → integer energies → bit j = (frame j+1 louder than
    * frame j), the sign-of-difference family acoustic fingerprints use
    * (63 informative bits; integer-exact end to end). Energies are
    * sums of 32 squared int16s, so re-encode-level noise moves them by
    * ~10⁻⁵ of their spread and flips essentially no contour bit, while
    * unrelated noise audio concentrates at 31.5 ± 4 bits.
    */
  def fingerprintAudio(s: SparkSession, raw: DataFrame): Dataset[MmAfp] = {
    import s.implicits._
    raw.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = bytes.length / 2
          val nFrames = n / AfpFrame
          val energy = new Array[Long](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0L
            var i = f * AfpFrame
            val end = i + AfpFrame
            while (i < end) { val v = bb.getShort(i * 2).toLong; acc += v * v; i += 1 }
            energy(f) = acc; f += 1
          }
          var hash = 0L
          var j = 0
          while (j < math.min(63, nFrames - 1)) {
            if (energy(j + 1) > energy(j)) hash |= 1L << j
            j += 1
          }
          MmAfp(id, hash)
        }
      }
  }

  /** C59 `mm_audio_dedup`: acoustic near-duplicate detection — the
    * audio member of the media-dedup family (C58 images, C3 text):
    * decode → energy-contour fingerprint → shared banded-Hamming
    * pipeline. On the deterministic corpus the admitted pairs are
    * exactly the planted re-encodes; closed-form plant-list oracle.
    */
  def mmAudioDedup(s: SparkSession, d: String): DataFrame =
    hammingPairs(fingerprintAudio(s, afpAssets(s, d)).toDF(), "afp", AfpHammingMax)

  /** Tighter than the image gate: contour bits share a frame energy
    * with their neighbor (sign-chain correlation), so the unrelated-
    * pair Hamming tail is fatter than an independent-bit model — while
    * a re-encode-level perturbation moves frame energies by ~10⁻⁴ of
    * their spread and flips essentially nothing. 4 keeps recall 1 on
    * plants with the cross mass (31.5 ± 4 of 63) ≥ 6σ away.
    */
  private[graft] val AfpHammingMax = 4L

  val mmAudioDedupSql: String =
    s"""SELECT doc_id AS doc_a, doc_id + $AudioPlantOffset AS doc_b
       |FROM documents WHERE doc_id % $PhashPlantEvery = 0
       |ORDER BY doc_a, doc_b""".stripMargin

  val mmPhashDedupSql: String =
    s"""SELECT doc_id AS doc_a, doc_id + $PhashPlantOffset AS doc_b
       |FROM documents WHERE doc_id % $PhashPlantEvery = 0
       |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_phash_dedup"   -> (mmPhashDedup _),
    "mm_audio_dedup"   -> (mmAudioDedup _),
    "mm_video_frames"  -> (mmVideoFrames _),
    "mm_decode_stub"   -> (mmDecodeStub _),
    "mm_pipeline_stub" -> (mmPipelineStub _),
    "mm_decode"        -> (mmDecode _),
    "mm_pipeline"      -> (mmPipeline _),
    "mm_audio_frames"  -> (mmAudioFrames _))

  val oracles: Map[String, String] = Map(
    "mm_phash_dedup"   -> mmPhashDedupSql,
    "mm_audio_dedup"   -> mmAudioDedupSql,
    "mm_video_frames"  -> mmVideoFramesSql,
    "mm_decode_stub"   -> mmDecodeStubSql,
    "mm_pipeline_stub" -> mmPipelineStubSql,
    "mm_decode"        -> mmDecodeSql,
    "mm_pipeline"      -> mmPipelineSql,
    "mm_audio_frames"  -> mmAudioFramesSql)
}
