package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Parity

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction / frame-sampling as per-partition
  * batch operators.
  *
  * [[BinaryDecoder.RealImageDecoder]] decodes real images through the
  * pure-JVM `javax.imageio` codecs (PNG/JPEG/BMP/GIF — no native
  * libraries); [[BinaryDecoder.DeterministicFake]] remains the oracle
  * path (the harness documents table carries text payloads, not image
  * bytes). At scale this is the mapPartitions shape you want: one codec
  * init per partition (not per row), batches flowing through an
  * iterator without materializing the partition.
  */
object Multimodal {

  /** One multimodal record: payload + typed metadata. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

  /** Extracted features: fixed-width vector + sampled frame offsets. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      n_frames: Long,
      features: Array[Double])

  /** Per-partition decoder. Implementations must be Serializable; they are
    * constructed once per partition, not per row.
    */
  trait BinaryDecoder extends Serializable {
    def decode(payload: Array[Byte]): Array[Double]
  }

  object BinaryDecoder {

    /** Real image decode via the JDK's own `javax.imageio` codecs
      * (PNG/JPEG/BMP/GIF — pure JVM, headless-safe, no native deps).
      * Features: width, height, band count, mean sample intensity —
      * deterministic for a given payload, so downstream dedup/similarity
      * over decoded features stays reproducible. A payload the codecs
      * cannot decode FAILS (ImageIO.read returns null → error): at 100 TB
      * a silent zero-vector would poison every downstream centroid;
      * callers quarantine undecodable rows with a filter beforehand (or
      * a try-wrapping decoder) rather than letting them alias as black
      * frames. Swap in a JNI/JavaCV decoder here for codecs the JDK
      * lacks (video, audio).
      */
    object RealImageDecoder extends BinaryDecoder {
      def decode(payload: Array[Byte]): Array[Double] = {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        require(img != null, s"payload (${payload.length} bytes) is not a decodable image")
        val raster = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
        var sum = 0.0
        var b = 0
        while (b < bands) {
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += raster.getSample(x, y, b); x += 1 }
            y += 1
          }
          b += 1
        }
        Array(w.toDouble, h.toDouble, bands.toDouble, sum / (w.toDouble * h * bands))
      }
    }

    /** Deterministic fake: 4 features from byte statistics. Used by tests
      * and the harness query so the plumbing is exercised end-to-end.
      */
    object DeterministicFake extends BinaryDecoder {
      def decode(payload: Array[Byte]): Array[Double] = {
        var sum = 0L
        var i = 0
        while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
        Array(
          payload.length.toDouble,
          sum.toDouble,
          if (payload.length > 0) (payload(0) & 0xff).toDouble else 0.0,
          if (payload.length > 0) sum.toDouble / payload.length else 0.0)
      }
    }
  }

  /** Wrap the documents table as a multimodal table: utf-8 payload bytes +
    * metadata columns. (Stand-in for reading real image/audio blobs; the
    * schema and everything downstream is what a real pipeline uses.)
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      octet_length(encode(col("text"), "utf-8")).cast("long").as("n_bytes"))

  /** Partition-batched decode + frame sampling (every `frameBytes` bytes
    * counts as one "frame"). The decoder is instantiated once per
    * partition; rows stream through the iterator.
    */
  def decodeFeatures(
      spark: SparkSession,
      media: DataFrame,
      decoder: BinaryDecoder,
      frameBytes: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init point (codec setup happens here, once)
      rows.map { r =>
        val feats = decoder.decode(r.payload)
        MediaFeatures(r.doc_id, r.n_bytes, r.n_bytes / frameBytes, feats)
      }
    }
  }

  /** Oracle-checkable projection of the multimodal pipeline: byte length,
    * frame count, and a content hash — pure column expressions, so the
    * DuckDB oracle can mirror them exactly (the mapPartitions path is
    * covered by unit tests instead; its fake-decoder features are not
    * SQL-expressible).
    */
  def featureSummary(docs: DataFrame, frameBytes: Int = 64): DataFrame =
    asMediaTable(docs)
      .withColumn("n_frames", (col("n_bytes") / frameBytes).cast("long"))
      .select(col("doc_id"), col("n_bytes"), col("n_frames"))
      .join(
        docs.select(col("doc_id"), Parity.charFold(col("text"), 31L, Parity.TokP).as("content_hash")),
        Seq("doc_id"))

  /** Frame sampling: the first `maxFrames` frame slots per media payload,
    * each with its byte offset and a content hash of the frame's bytes —
    * the video/audio frame-extraction shape (one row per sampled frame,
    * offsets computable without decoding). Pure narrow map: explode of a
    * bounded sequence, no shuffle. Payloads shorter than one frame
    * produce no rows.
    */
  def frameSample(docs: DataFrame, frameBytes: Int = 64, maxFrames: Int = 3): DataFrame =
    docs
      .select(col("doc_id"), col("text"))
      .withColumn("n_frames", (length(col("text")) / frameBytes).cast("long"))
      .filter(col("n_frames") > 0)
      .select(
        col("doc_id"),
        col("text"),
        explode(sequence(lit(0L), least(col("n_frames"), lit(maxFrames.toLong)) - 1L))
          .as("frame_idx"))
      .select(
        col("doc_id"),
        col("frame_idx"),
        (col("frame_idx") * frameBytes).as("offset"),
        Parity
          .charFold(
            col("text").substr((col("frame_idx") * frameBytes + 1L).cast("int"), lit(frameBytes)),
            31L,
            Parity.TokP)
          .as("frame_hash"))
}
