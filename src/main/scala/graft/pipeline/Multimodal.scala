package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads with typed metadata,
  * and partition-wise feature extraction.
  *
  * The decode step is a STUB — this container has no image/audio codecs, so
  * `decodeStub` derives deterministic fake features from the raw bytes. The
  * Spark-side plumbing is real: binary columns with typed metadata structs,
  * partition-batched extraction via typed mapPartitions (one decoder init
  * per partition, the pattern a JNI/FFI codec needs), and codegen-friendly
  * metadata-only paths that never touch the payload column (column pruning
  * keeps the binary out of the scan when only metadata is selected).
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, mime: String, content: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, mean_byte: Double)

  /** Lift documents into a media table: payload as a binary column plus a
    * metadata struct. In a real pipeline the binary is the raw image/audio
    * bytes; here it is the UTF-8 text (deterministic, schema-identical). */
  def binarize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** STUB decoder: deterministic pseudo-features from raw bytes. A real
    * implementation would hand `bytes` to an image/audio codec here; the
    * call shape (bytes => features, initialized once per partition) is what
    * the real thing needs. */
  private[pipeline] def decodeStub(id: Long, mime: String, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length
    val head = if (n > 0) bytes(0) & 0xff else 0
    var sum = 0L
    var i = 0
    while (i < n) { sum += (bytes(i) & 0xff); i += 1 }
    MediaFeatures(
      doc_id = id, mime = mime, n_bytes = n.toLong,
      width = 32 + head % 97,
      height = 32 + (n % 89),
      mean_byte = if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** Partition-batched feature extraction over the media table. The
    * iterator-in/iterator-out shape keeps one decoder instance per
    * partition and streams batches without materializing them. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("meta.mime").as("mime"), col("content"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec handles, buffers)
        it.map(r => decodeStub(r.doc_id, r.mime, r.content))
      }
  }

  /** Metadata-only projection — never reads the payload column; at scale
    * this is the difference between scanning terabytes of binary and
    * scanning a few megabytes of struct metadata. */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("meta.mime").as("mime"),
      col("meta.n_bytes").as("n_bytes"), col("meta.origin").as("origin"))

  /** "Resize" stand-in: deterministic 1-in-`factor` byte downsample of the
    * payload, binary in -> binary out (a real implementation decodes,
    * rescales, re-encodes here — same call shape, one codec init per
    * partition). Output keeps both sizes so downstream can audit the
    * reduction ratio without touching either payload. */
  def resample(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("meta.mime").as("mime"), col("content"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { r =>
          val n = r.content.length
          val out = new Array[Byte]((n + factor - 1) / factor)
          var i = 0
          while (i * factor < n) { out(i) = r.content(i * factor); i += 1 }
          (r.doc_id, n.toLong, out.length.toLong, out)
        }
      }.toDF("doc_id", "n_bytes_in", "n_bytes_out", "resized")
  }

  /** Video-shaped payload: the document chunked into fixed-size "frames"
    * as ARRAY<BINARY> (a real pipeline holds one encoded frame per
    * element; the chunking here is the deterministic stand-in). */
  def framize(docs: DataFrame, frameChars: Int): DataFrame =
    docs.select(col("doc_id"),
      expr(s"""IF(length(text) < 1, CAST(array() AS ARRAY<BINARY>),
            transform(sequence(0, CAST(ceil(length(text) / $frameChars.0) AS INT) - 1),
                      i -> encode(substring(text, i * $frameChars + 1, $frameChars), 'UTF-8')))""")
        .as("frames"))

  /** Frame sampling: keep every `every`-th frame with its index — the
    * posexplode never copies unsampled frames downstream, and the payload
    * per output row is one frame, not the whole video. */
  def frameSample(media: DataFrame, every: Int): DataFrame = {
    import graft.functions.GraftFunctions
    media.select(col("doc_id"), posexplode(col("frames")).as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % every === 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        octet_length(col("frame")).cast("long").as("n_bytes"),
        GraftFunctions.polyHash(decode(col("frame"), "UTF-8")).as("fp"))
  }
}
