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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_stub"   -> (mmDecodeStub _),
    "mm_pipeline_stub" -> (mmPipelineStub _))

  val oracles: Map[String, String] = Map(
    "mm_decode_stub"   -> mmDecodeStubSql,
    "mm_pipeline_stub" -> mmPipelineStubSql)
}
