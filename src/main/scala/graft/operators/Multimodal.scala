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

  /** How many documents may share a frame hash before the hash is
    * treated as boilerplate (a title card / silence block / standard
    * intro) and dropped from candidate generation — the same
    * df-cap reasoning as `Dedup.MaxShingleDf` and [[PhashBucketCap]].
    */
  val FrameHashCap = 50L

  /** Frame-overlap near-duplicate detection — the video-dedup shape:
    * two media payloads are candidate duplicates when they share at
    * least `minShared` SAMPLED FRAME hashes ([[frameSample]]'s aligned
    * frame-slot content hashes). Sharing one frame is coincidence or
    * boilerplate; sharing most of the sampled frames is a re-upload,
    * re-container, or trim of the same content — the k-of-n frame
    * voting every large-scale video pipeline dedups on (full-payload
    * hashing misses any re-mux, pHash on one keyframe misses trims).
    *
    * Scale shape: the frame table is a narrow map of the corpus; the
    * candidate join buckets on the frame hash with hashes hotter than
    * [[FrameHashCap]] documents dropped (boilerplate does not
    * discriminate), so per-bucket work is ≤ cap²; the pair aggregate is
    * keyed by the pair. Never an all-pairs comparison.
    *
    * Output: `(a_id, b_id, n_shared)` with a < b, n_shared ≥ minShared.
    */
  def frameDedup(docs: DataFrame, minShared: Int = 2): DataFrame = {
    val fr = frameSample(docs).select(col("doc_id"), col("frame_hash")).distinct()
    val keptHashes = fr
      .groupBy(col("frame_hash"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") <= FrameHashCap)
      .select(col("frame_hash"))
    val kept = fr.join(keptHashes, Seq("frame_hash"))
    val a = kept.alias("a")
    val b = kept.alias("b")
    a.join(
        b,
        col("a.frame_hash") === col("b.frame_hash") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** [[frameDedup]] mirrored. */
  def frameDedupSql(minShared: Int = 2): String =
    s"""WITH fx AS (
       |  SELECT doc_id, text, CAST(length(text) // 64 AS BIGINT) AS n_frames
       |  FROM documents WHERE length(text) >= 64),
       |fr AS (
       |  SELECT DISTINCT doc_id,
       |    ${Parity.charFoldSql("substring(text, CAST(t.i * 64 + 1 AS INT), 64)", 31L, Parity.TokP)} AS h
       |  FROM fx CROSS JOIN range(0, 3) t(i) WHERE t.i < n_frames),
       |freq AS (SELECT h FROM fr GROUP BY h HAVING count(*) <= $FrameHashCap),
       |kept AS (SELECT fr.* FROM fr JOIN freq ON fr.h = freq.h)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(count(*) AS BIGINT) AS n_shared
       |FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= $minShared""".stripMargin

  /** The static frame-hash store the streaming gate probes: distinct
    * (frame_hash, s_id) rows of the corpus slice, hashes hotter than
    * [[FrameHashCap]] documents dropped (boilerplate), exactly the
    * batch detector's candidate-side discipline.
    */
  def frameStore(docs: DataFrame): DataFrame = {
    val fr = frameSample(docs).select(col("doc_id").as("s_id"), col("frame_hash")).distinct()
    val kept = fr
      .groupBy(col("frame_hash"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") <= FrameHashCap)
      .select(col("frame_hash"))
    fr.join(kept, Seq("frame_hash"))
  }

  /** Batch oracle for the streaming frame gate: arrivals (doc_id ≥
    * `firstNewId`) against the static slice's capped distinct store.
    * The arrival side is NOT deduplicated (the stream's frame map is
    * stateless), so a repeated identical frame slot counts per slot —
    * mirrored here by counting over the raw slot rows.
    */
  def frameGateSql(firstNewId: Long, minShared: Int = 2): String =
    s"""WITH fx AS (
       |  SELECT doc_id, text, CAST(length(text) // 64 AS BIGINT) AS n_frames
       |  FROM documents WHERE length(text) >= 64),
       |slots AS (
       |  SELECT doc_id,
       |    ${Parity.charFoldSql("substring(text, CAST(t.i * 64 + 1 AS INT), 64)", 31L, Parity.TokP)} AS h
       |  FROM fx CROSS JOIN range(0, 3) t(i) WHERE t.i < n_frames),
       |st AS (SELECT DISTINCT doc_id AS s_id, h FROM slots WHERE doc_id < $firstNewId),
       |keep AS (SELECT h FROM st GROUP BY h HAVING count(*) <= $FrameHashCap),
       |stk AS (SELECT st.* FROM st JOIN keep USING (h)),
       |arr AS (SELECT doc_id, h FROM slots WHERE doc_id >= $firstNewId)
       |SELECT a.doc_id, s.s_id, CAST(count(*) AS BIGINT) AS n_shared
       |FROM arr a JOIN stk s ON s.h = a.h
       |GROUP BY 1, 2 HAVING count(*) >= $minShared""".stripMargin

  /** Perceptual-hash constants: 64 "pixels" (the first 64 payload bytes),
    * signature split into 4×16-bit bands for the LSH bucket join; pairs
    * within full-signature Hamming ≤ [[PhashMaxHamming]] are near-dups.
    * Buckets larger than [[PhashBucketCap]] are boilerplate prefixes
    * (same reasoning as the dedup family's DF cap) and are dropped.
    */
  val PhashPixels = 64
  val PhashBands = 4
  val PhashBandBits = 16
  val PhashMaxHamming = 12
  val PhashBucketCap = 50L

  private val PhashPow2: Seq[Long] = (0 until PhashBandBits).map(1L << _)

  /** Per-media perceptual-hash bands: pixel i = byte i of the payload
    * (here: ascii of char i — the deterministic stand-in decode, see
    * [[asMediaTable]]), bit i = pixel·64 > Σpixels (the average-hash
    * test, integer-exact so it needs no float parity), packed into
    * [[PhashBands]]×[[PhashBandBits]]-bit band values. Payloads shorter
    * than [[PhashPixels]] bytes are excluded (the [[frameSample]] rule).
    * Pure narrow map — no shuffle.
    */
  def phashBands(docs: DataFrame): DataFrame = {
    val px = transform(
      filter(split(substring(col("text"), 1, PhashPixels), ""), c => c =!= ""),
      c => ascii(c).cast("long"))
    val pow2 = typedLit(PhashPow2)
    val withPx = docs
      .filter(length(col("text")) >= PhashPixels)
      .select(col("doc_id"), px.as("px"))
      .withColumn("s", aggregate(col("px"), lit(0L), (acc, x) => acc + x))
    val bands = (0 until PhashBands).map { j =>
      aggregate(
        zip_with(
          slice(col("px"), j * PhashBandBits + 1, PhashBandBits),
          pow2,
          (p, w) => when(p * PhashPixels > col("s"), w).otherwise(lit(0L))),
        lit(0L),
        (acc, x) => acc + x).as(s"b$j")
    }
    withPx.select(col("doc_id") +: bands: _*)
  }

  /** Perceptual-hash near-duplicate detection over the binary media
    * column — the image/video counterpart of MinHash-LSH text dedup:
    * candidates share ANY 16-bit band (bucket-keyed join, never
    * all-pairs; oversized buckets dropped as boilerplate), verified by
    * exact 64-bit Hamming distance (`Σ_j bit_count(a_j XOR b_j)`) ≤
    * [[PhashMaxHamming]]. Output: (a_id, b_id, hamming) with a < b.
    */
  def phashDedup(docs: DataFrame): DataFrame =
    phashCandidatePairs(docs)
      .filter(col("hamming") <= PhashMaxHamming)
      .distinct()

  /** Within-bucket Hamming-distance HISTOGRAM over the distinct pHash
    * candidate pairs — the tuning table behind [[PhashMaxHamming]]: a
    * bimodal histogram (near-dup mass at low distance, background mass
    * near 32) says the threshold separates cleanly; a filled valley
    * says the bands are recalling noise. Same bucket-capped candidate
    * generation as [[phashDedup]], no verify filter — so the cost
    * bound is identical and the table shows EVERYTHING the index would
    * ever surface.
    *
    * Output: `(hamming, n_pairs)`.
    */
  def phashHammingHist(docs: DataFrame): DataFrame =
    phashCandidatePairs(docs)
      .distinct()
      .groupBy(col("hamming"))
      .agg(count(lit(1)).as("n_pairs"))

  /** [[phashHammingHist]] mirrored. */
  def phashHammingHistSql: String =
    s"""WITH $phashCoreCtes,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |         CAST(${phashHammingSql("a", "b")} AS BIGINT) AS hamming
       |  FROM keep a JOIN keep b
       |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       |   AND a.doc_id < b.doc_id)
       |SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs
       |FROM pairs GROUP BY hamming""".stripMargin

  /** The bucket-capped candidate pair table both [[phashDedup]] and
    * [[phashHammingHist]] consume: (a_id, b_id, hamming), NOT
    * deduplicated across shared bands. */
  private def phashCandidatePairs(docs: DataFrame): DataFrame = {
    val sigs = phashBands(docs)
    val bandCols = (0 until PhashBands).map(j => col(s"b$j"))
    // materialized + hash-laid-out on the bucket key: the signature
    // subtree (interpreted per-char array lambdas) feeds the hot-bucket
    // aggregate AND both self-join sides — one evaluation, and the
    // bucket-keyed self-join plans with no exchange on either side
    val exploded = Phys.materializedHashedBy(
      sigs.select(
        col("doc_id") +: bandCols :+
          posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")): _*),
      Seq("band_idx", "band_val"))
    val hotBuckets = exploded
      .groupBy(col("band_idx"), col("band_val"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > PhashBucketCap)
      .select(col("band_idx"), col("band_val"))
    val buckets = exploded.join(broadcast(hotBuckets), Seq("band_idx", "band_val"), "left_anti")
    val a = buckets.alias("a")
    val b = buckets.alias("b")
    val hamming = (0 until PhashBands)
      .map(j => bit_count(col(s"a.b$j").bitwiseXOR(col(s"b.b$j"))).cast("long"))
      .reduce(_ + _)
    a.join(
      b,
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("a_id"),
        col("b.doc_id").as("b_id"),
        hamming.as("hamming"))
  }

  /** DuckDB oracle for the STREAMING pHash gate
    * ([[graft.streaming.StreamOps.docPhashGateOverParquet]]): arrivals
    * (doc_id ≥ `firstNewId`) matched against the static band store
    * (doc_id < `firstNewId`, cap computed on static buckets only); per
    * flagged arrival, the lexicographically best (hamming, static id).
    */
  /** Shared DuckDB CTE prefix (`p`/`ps`/`sig`/`bands`): the corpus's
    * pHash signatures exploded to (band_idx, band_val) rows — the SQL
    * mirror of [[phashBands]] + the band explode. */
  private def phashBandsCteSql: String = {
    val pxSql = "list_transform(list_filter(string_split(substring(text, 1, " +
      s"$PhashPixels), ''), c -> c <> ''), c -> CAST(ascii(c) AS BIGINT))"
    val powList = PhashPow2.mkString("[", ", ", "]")
    val bandExprs = (0 until PhashBands)
      .map { j =>
        s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          s"[CASE WHEN px[i] * $PhashPixels > s THEN $powList[((i - 1) % $PhashBandBits) + 1] " +
          s"ELSE CAST(0 AS BIGINT) END " +
          s"FOR i IN range(${j * PhashBandBits + 1}, ${(j + 1) * PhashBandBits + 1})]), " +
          s"(acc, x) -> acc + x) AS b$j"
      }
      .mkString(",\n       ")
    s"""p AS (
       |  SELECT doc_id, $pxSql AS px
       |  FROM documents WHERE length(text) >= $PhashPixels),
       |ps AS (
       |  SELECT doc_id, px,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT), px), (acc, x) -> acc + x) AS s
       |  FROM p),
       |sig AS (
       |  SELECT doc_id,
       |       $bandExprs
       |  FROM ps),
       |bands AS (
       |  SELECT doc_id, b0, b1, b2, b3, t.i AS band_idx,
       |         CASE t.i WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS band_val
       |  FROM sig CROSS JOIN range(0, $PhashBands) t(i))""".stripMargin
  }

  /** DuckDB oracle for the STREAMING pHash index upsert
    * ([[graft.streaming.StreamOps.phashUpsertOverParquet]]): arrival
    * band rows annotated with the CAPPED static store's bucket
    * occupancy (hot buckets were retired at index-build time → 0). */
  def phashUpsertSql(firstNewId: Long): String =
    s"""WITH $phashBandsCteSql,
       |sbands AS (SELECT * FROM bands WHERE doc_id < $firstNewId),
       |hot AS (
       |  SELECT band_idx, band_val FROM sbands
       |  GROUP BY 1, 2 HAVING count(*) > $PhashBucketCap),
       |store AS (
       |  SELECT k.* FROM sbands k
       |  WHERE NOT EXISTS (SELECT 1 FROM hot h
       |                    WHERE h.band_idx = k.band_idx AND h.band_val = k.band_val)),
       |cnt AS (
       |  SELECT band_idx, band_val, CAST(count(*) AS BIGINT) AS n_store_hits
       |  FROM store GROUP BY 1, 2)
       |SELECT a.doc_id, CAST(a.band_idx AS INTEGER) AS band_idx, a.band_val,
       |       coalesce(c.n_store_hits, 0) AS n_store_hits
       |FROM (SELECT * FROM bands WHERE doc_id >= $firstNewId) a
       |LEFT JOIN cnt c ON c.band_idx = a.band_idx AND c.band_val = a.band_val
       |ORDER BY a.doc_id, a.band_idx""".stripMargin

  def phashGateSql(firstNewId: Long): String = {
    val hammingSql = (0 until PhashBands)
      .map(j => s"bit_count(xor(a.b$j, st.b$j))")
      .mkString(" + ")
    s"""WITH $phashBandsCteSql,
       |sbands AS (SELECT * FROM bands WHERE doc_id < $firstNewId),
       |hot AS (
       |  SELECT band_idx, band_val FROM sbands
       |  GROUP BY 1, 2 HAVING count(*) > $PhashBucketCap),
       |store AS (
       |  SELECT k.* FROM sbands k
       |  WHERE NOT EXISTS (SELECT 1 FROM hot h
       |                    WHERE h.band_idx = k.band_idx AND h.band_val = k.band_val)),
       |abands AS (SELECT * FROM bands WHERE doc_id >= $firstNewId),
       |pairs AS (
       |  SELECT a.doc_id, st.doc_id AS s_id,
       |         CAST($hammingSql AS BIGINT) AS hamming
       |  FROM abands a JOIN store st
       |    ON a.band_idx = st.band_idx AND a.band_val = st.band_val
       |  WHERE $hammingSql <= $PhashMaxHamming),
       |rk AS (
       |  SELECT doc_id, hamming, s_id,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY hamming, s_id) AS rn
       |  FROM pairs)
       |SELECT doc_id, hamming AS best_hamming, s_id AS best_match
       |FROM rk WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  /** The banded pHash STORE of a corpus: signatures exploded to
    * (band_idx, band_val) bucket rows with the full signature carried
    * (sb0..sb3), hot buckets capped as boilerplate. This is the index
    * half of media near-dup: built once over the static corpus, probed
    * by every batch or stream of arrivals.
    */
  def phashBandStore(docs: DataFrame): DataFrame = {
    val bandCols = (0 until PhashBands).map(j => col(s"b$j"))
    val exploded = phashBands(docs).select(
      col("doc_id") +: bandCols :+
        posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")): _*)
    val hot = exploded
      .groupBy(col("band_idx"), col("band_val"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > PhashBucketCap)
      .select(col("band_idx"), col("band_val"))
    exploded
      .join(hot, Seq("band_idx", "band_val"), "left_anti")
      .select(
        col("doc_id").as("s_id") +: col("band_idx") +: col("band_val") +:
          (0 until PhashBands).map(j => col(s"b$j").as(s"sb$j")): _*)
  }

  /** Persist [[phashBandStore]] as a parquet artifact — index-once /
    * probe-many for the media column. */
  def writePhashIndex(docs: DataFrame): String = {
    val dir = graft.sources.Staging.freshDir("phash-index")
    phashBandStore(docs).write.mode("overwrite").parquet(dir)
    dir
  }

  /** Probe a batch of payloads against the STORED band index: arrival
    * signatures (narrow map), bucket-keyed join against the artifact,
    * exact Hamming ≤ [[PhashMaxHamming]] verify, best (hamming, id)
    * per flagged arrival. The plan reads the index artifact and the
    * probe batch — signature/cap stages of the indexed corpus appear
    * nowhere (they ran at index time).
    */
  def phashStoredProbe(
      spark: org.apache.spark.sql.SparkSession,
      probeDocs: DataFrame,
      indexDir: String): DataFrame = {
    val store = broadcast(spark.read.parquet(indexDir))
    val bandCols = (0 until PhashBands).map(j => col(s"b$j"))
    val arrivals = phashBands(probeDocs).select(
      col("doc_id") +: bandCols :+
        posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")): _*)
    val hamming = (0 until PhashBands)
      .map(j => bit_count(col(s"b$j").bitwiseXOR(col(s"sb$j"))).cast("long"))
      .reduce(_ + _)
    arrivals
      .join(store, Seq("band_idx", "band_val"))
      .select(col("doc_id"), col("s_id"), hamming.as("hamming"))
      .filter(col("hamming") <= PhashMaxHamming)
      .groupBy(col("doc_id"))
      .agg(min(struct(col("hamming").as("h"), col("s_id").as("sid"))).as("sel"))
      .select(
        col("doc_id"),
        col("sel.h").as("best_hamming"),
        col("sel.sid").as("best_match"))
  }

  /** Shared oracle CTE chain: pixels → signature → bands → cap-filtered
    * `keep` (bucket rows eligible for the pair join). */
  private def phashCoreCtes: String = {
    val pxSql = "list_transform(list_filter(string_split(substring(text, 1, " +
      s"$PhashPixels), ''), c -> c <> ''), c -> CAST(ascii(c) AS BIGINT))"
    val powList = PhashPow2.mkString("[", ", ", "]")
    val bandExprs = (0 until PhashBands)
      .map { j =>
        s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          s"[CASE WHEN px[i] * $PhashPixels > s THEN $powList[((i - 1) % $PhashBandBits) + 1] " +
          s"ELSE CAST(0 AS BIGINT) END " +
          s"FOR i IN range(${j * PhashBandBits + 1}, ${(j + 1) * PhashBandBits + 1})]), " +
          s"(acc, x) -> acc + x) AS b$j"
      }
      .mkString(",\n       ")
    s"""p AS (
       |  SELECT doc_id, $pxSql AS px
       |  FROM documents WHERE length(text) >= $PhashPixels),
       |ps AS (
       |  SELECT doc_id, px,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT), px), (acc, x) -> acc + x) AS s
       |  FROM p),
       |sig AS (
       |  SELECT doc_id,
       |       $bandExprs
       |  FROM ps),
       |bands AS (
       |  SELECT doc_id, b0, b1, b2, b3, t.i AS band_idx,
       |         CASE t.i WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS band_val
       |  FROM sig CROSS JOIN range(0, $PhashBands) t(i)),
       |hot AS (
       |  SELECT band_idx, band_val FROM bands
       |  GROUP BY 1, 2 HAVING count(*) > $PhashBucketCap),
       |keep AS (
       |  SELECT k.* FROM bands k
       |  WHERE NOT EXISTS (SELECT 1 FROM hot h
       |                    WHERE h.band_idx = k.band_idx AND h.band_val = k.band_val))""".stripMargin
  }

  private def phashHammingSql(a: String, b: String): String =
    (0 until PhashBands).map(j => s"bit_count(xor($a.b$j, $b.b$j))").mkString(" + ")

  /** The HIGHER-id side of every [[phashDedup]] pair as a standalone
    * SELECT (own WITH chain — nestable as a CTE body without name
    * collisions): the media detector's per-document dup flag for the
    * cross-modality ensemble verdict.
    */
  def phashDupDocIdsSql: String =
    s"""WITH $phashCoreCtes
       |SELECT DISTINCT b.doc_id
       |FROM keep a JOIN keep b
       |  ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       | AND a.doc_id < b.doc_id
       |WHERE ${phashHammingSql("a", "b")} <= $PhashMaxHamming""".stripMargin

  /** DuckDB oracle for [[phashDedup]] — same pixels, bits, bands,
    * bucket cap, and Hamming verification.
    */
  def phashDedupSql: String = {
    val hammingSql = phashHammingSql("a", "b")
    s"""WITH $phashCoreCtes
       |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |       CAST($hammingSql AS BIGINT) AS hamming
       |FROM keep a JOIN keep b
       |  ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       | AND a.doc_id < b.doc_id
       |WHERE $hammingSql <= $PhashMaxHamming
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** DuckDB oracle for the pHash CLUSTER step
    * ([[graft.operators.Dedup.clusters]] over [[phashDedup]] pairs):
    * transitive closure by recursive min-label reach, singletons kept.
    */
  def phashClustersSql: String = {
    val hammingSql = phashHammingSql("a", "b")
    s"""WITH RECURSIVE $phashCoreCtes,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM keep a JOIN keep b
       |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       |   AND a.doc_id < b.doc_id
       |  WHERE $hammingSql <= $PhashMaxHamming),
       |und AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |        UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(id, lab) AS (
       |  SELECT DISTINCT src AS id, src AS lab FROM und
       |  UNION
       |  SELECT u.dst, r.lab FROM reach r JOIN und u ON u.src = r.id
       |),
       |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id)
       |SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster,
       |       coalesce(c.component, d.doc_id) = d.doc_id AS is_canonical
       |FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
       |ORDER BY doc_id""".stripMargin
  }

  /** Samples per frame for [[audioEnergy]] (8-bit PCM stand-in). */
  val AudioFrameLen = 256

  /** Per-frame quiet threshold: mean squared deviation < 1024
    * (|amplitude − 128| < 32 on average) marks a frame quiet. */
  val AudioQuietEnergy: Long = AudioFrameLen.toLong * 1024L

  /** Short-time ENERGY profile of the payload read as unsigned 8-bit
    * PCM — the audio member of the multimodal family: frame the clip
    * ([[AudioFrameLen]] samples, tail partial frame included), report
    * per-doc frame count, total and peak energy, the peak's frame
    * index (where in the clip the activity is), and the quiet-frame
    * count — the voice-activity / silence-trim pre-filter an audio
    * curation pipeline runs before any transcription. The byte→sample
    * read is the documented decode stand-in
    * ([[graft.functions.FrameEnergies]] marks the codec swap point);
    * framing and windowed integer energy are the real pipeline shape.
    *
    * Scale shape: ONE codegen'd pass per row where the payload lives
    * (no sample explode, no shuffle); everything downstream reads the
    * ~payload/256-element frame vector.
    *
    * Output: `(doc_id, n_frames, total_energy, peak_energy,
    * peak_frame, n_quiet)` — peak_* NULL/0 for an empty payload.
    */
  def audioEnergy(docs: DataFrame): DataFrame = {
    val fe = graft.functions.FrameEnergies(
      encode(coalesce(col("text"), lit("")), "utf-8"),
      AudioFrameLen)
    docs
      .select(col("doc_id"), fe.as("fe"))
      .select(
        col("doc_id"),
        size(col("fe")).cast("long").as("n_frames"),
        aggregate(col("fe"), lit(0L), (acc, x) => acc + x).as("total_energy"),
        array_max(col("fe")).as("peak_energy"),
        coalesce(array_position(col("fe"), array_max(col("fe"))), lit(0L)).as("peak_frame"),
        size(filter(col("fe"), e => e < lit(AudioQuietEnergy))).cast("long").as("n_quiet"))
  }

  /** [[audioEnergy]] mirrored: hex dump → nibble pairs → the same
    * integer frame fold. */
  def audioEnergySql(): String =
    s"""WITH b AS (
       |  SELECT doc_id, upper(hex(encode(coalesce(text, '')))) AS h FROM documents),
       |s AS (
       |  SELECT doc_id, list_transform(range(0, length(h) // 2), j ->
       |           (strpos('0123456789ABCDEF', substr(h, 2*j+1, 1)) - 1) * 16 +
       |           (strpos('0123456789ABCDEF', substr(h, 2*j+2, 1)) - 1)) AS bytes
       |  FROM b),
       |f AS (
       |  SELECT doc_id,
       |         list_transform(range(0, (len(bytes) + $AudioFrameLen - 1) // $AudioFrameLen),
       |           k -> CAST(list_sum(list_transform(
       |                  list_slice(bytes, k*$AudioFrameLen + 1,
       |                             least((k+1)*$AudioFrameLen, len(bytes))),
       |                  v -> CAST((v-128)*(v-128) AS BIGINT))) AS BIGINT)) AS fe
       |  FROM s)
       |SELECT doc_id, CAST(len(fe) AS BIGINT) AS n_frames,
       |       CAST(coalesce(list_sum(fe), 0) AS BIGINT) AS total_energy,
       |       list_max(fe) AS peak_energy,
       |       CAST(coalesce(list_position(fe, list_max(fe)), 0) AS BIGINT) AS peak_frame,
       |       CAST(len(list_filter(fe, e -> e < $AudioQuietEnergy)) AS BIGINT) AS n_quiet
       |FROM f""".stripMargin

  /** Voice-activity SEGMENTS over [[audioEnergy]]'s frames: maximal
    * runs of loud frames (energy ≥ [[AudioQuietEnergy]]) as
    * `(start_frame, end_frame)` intervals with run length and total
    * energy — the segmentation an ASR pipeline cuts clips on (quiet
    * gaps separate utterances; segments are what get transcribed).
    * The run grouping is the gaps-and-islands identity
    * `island = idx − row_number()` over each doc's loud frames.
    *
    * Scale shape: the explode is ~payload/[[AudioFrameLen]] frame rows
    * (never samples); the island window partitions per doc — no
    * global sort, no shuffle wider than the frame table.
    *
    * Output: one row per segment `(doc_id, start_frame, end_frame,
    * n_frames, energy)`; silent docs contribute no rows.
    */
  def audioSegments(docs: DataFrame): DataFrame = {
    val fe = graft.functions.FrameEnergies(
      encode(coalesce(col("text"), lit("")), "utf-8"),
      AudioFrameLen)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("idx"))
    docs
      .select(col("doc_id"), posexplode(fe).as(Seq("idx", "e")))
      .filter(col("e") >= AudioQuietEnergy)
      .withColumn("island", col("idx") - row_number().over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(
        min(col("idx")).cast("long").as("start_frame"),
        max(col("idx")).cast("long").as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("e")).as("energy"))
      .drop("island")
  }

  /** [[audioSegments]] mirrored (zipped unnest for the frame index,
    * same islands identity). */
  def audioSegmentsSql(): String =
    s"""WITH b AS (
       |  SELECT doc_id, upper(hex(encode(coalesce(text, '')))) AS h FROM documents),
       |s0 AS (
       |  SELECT doc_id, list_transform(range(0, length(h) // 2), j ->
       |           (strpos('0123456789ABCDEF', substr(h, 2*j+1, 1)) - 1) * 16 +
       |           (strpos('0123456789ABCDEF', substr(h, 2*j+2, 1)) - 1)) AS bytes
       |  FROM b),
       |f AS (
       |  SELECT doc_id,
       |         list_transform(range(0, (len(bytes) + $AudioFrameLen - 1) // $AudioFrameLen),
       |           k -> CAST(list_sum(list_transform(
       |                  list_slice(bytes, k*$AudioFrameLen + 1,
       |                             least((k+1)*$AudioFrameLen, len(bytes))),
       |                  v -> CAST((v-128)*(v-128) AS BIGINT))) AS BIGINT)) AS fe
       |  FROM s0),
       |frames AS (
       |  SELECT doc_id, unnest(fe) AS e, unnest(range(0, len(fe))) AS idx FROM f),
       |loud AS (
       |  SELECT doc_id, idx, e,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS rn
       |  FROM frames WHERE e >= $AudioQuietEnergy)
       |SELECT doc_id, CAST(min(idx) AS BIGINT) AS start_frame,
       |       CAST(max(idx) AS BIGINT) AS end_frame,
       |       CAST(count(*) AS BIGINT) AS n_frames,
       |       CAST(sum(e) AS BIGINT) AS energy
       |FROM loud GROUP BY doc_id, idx - rn""".stripMargin

  /** Uniform-nibble entropy threshold for [[payloadEntropy]]'s flag:
    * 0.9 · ln 16 — a payload above it is nibble-uniform enough to be
    * compressed/encrypted/corrupt rather than structured media.
    */
  val EntropySuspicious = 2.495338

  /** Payload byte-entropy screen — the corrupt/encrypted-blob detector
    * a media-ingest pipeline runs before any decode attempt (encrypted
    * or already-compressed payloads are near byte-uniform; structured
    * media is not). Computed at NIBBLE granularity over the payload's
    * hex form so the whole histogram is 16 fixed `replace` counts in
    * one narrow map — no per-byte explode, no shuffle; the Shannon sum
    * folds the 16 terms in fixed textual order on the 9 dp ln grid.
    *
    * Output: `(doc_id, n_nibbles, entropy, suspicious)` (entropy in
    * nats; uniform = ln 16 ≈ 2.7726).
    */
  def payloadEntropy(docs: DataFrame): DataFrame = {
    val h = upper(hex(encode(col("text"), "utf-8")))
    val len = length(h).cast("double")
    val terms = "0123456789ABCDEF".map { c =>
      val cnt = (length(h) - length(regexp_replace(h, c.toString, ""))).cast("double")
      when(
        cnt > 0,
        -(cnt / len) * round(log(cnt / len), 9)).otherwise(lit(0.0d))
    }
    val entropy = terms.reduce(_ + _)
    docs
      .select(
        col("doc_id"),
        length(h).cast("long").as("n_nibbles"),
        round(entropy, 6).as("entropy"))
      .select(
        col("doc_id"),
        col("n_nibbles"),
        col("entropy"),
        (col("entropy") >= EntropySuspicious).as("suspicious"))
  }

  /** [[payloadEntropy]] mirrored (DuckDB hexes the utf-8 blob the same
    * way; replace-count histogram, same fold order).
    */
  def payloadEntropySql(): String = {
    val h = "upper(hex(encode(text)))"
    val terms = "0123456789ABCDEF"
      .map { c =>
        val cnt = s"CAST(length($h) - length(replace($h, '$c', '')) AS DOUBLE)"
        s"(CASE WHEN $cnt > 0 THEN -($cnt / CAST(length($h) AS DOUBLE)) * " +
          s"round(ln($cnt / CAST(length($h) AS DOUBLE)), 9) ELSE 0.0 END)"
      }
      .mkString("(", " + ", ")")
    s"""SELECT doc_id, CAST(length($h) AS BIGINT) AS n_nibbles,
       |       round($terms, 6) AS entropy,
       |       (round($terms, 6) >= $EntropySuspicious) AS suspicious
       |FROM documents""".stripMargin
  }

  // ---- audio landmark fingerprinting ---------------------------------------

  /** Samples per fingerprint frame — finer than [[AudioFrameLen]] so
    * short clips still yield a usable peak constellation. */
  val FpFrameLen = 16

  /** Quiet threshold at the fingerprint frame length (same per-sample
    * criterion as [[AudioQuietEnergy]]). */
  val FpQuietEnergy: Long = FpFrameLen.toLong * 1024L

  /** Max anchor→target frame distance in a landmark pair. */
  val FpFanout = 8

  /** Hot-bucket cap for the match join: a landmark hash shared by more
    * of the corpus than this no longer discriminates and is dropped
    * (the [[PhashBucketCap]] discipline). */
  val FpBucketCap = 50L

  /** Minimum aligned landmark votes for a reported match. */
  val FpMinVotes = 3L

  /** Landmark fingerprints of the payload's energy track — the
    * constellation-hashing idea of Wang 2003 ("An Industrial-Strength
    * Audio Search Algorithm") adapted to the 1-D short-time-energy
    * stand-in: peaks (strict local maxima above [[FpQuietEnergy]]) form
    * the constellation, and each anchor peak pairs with its ≤
    * [[FpFanout]] following peaks into a quantized hash
    * `(e_a mod 64)·4096 + (e_t mod 64)·64 + Δt` stamped with the
    * anchor's frame time. (Real audio hashes pair spectral-peak
    * FREQUENCIES; the energy track is the documented decode stand-in —
    * the landmark/hash/offset machinery is the real pipeline shape.)
    *
    * Scale shape: one codegen'd energy pass per row, a per-doc window
    * for peaks, and a fanout-bounded self-join (≤ [[FpFanout]] pairs
    * per peak) — fingerprint volume is linear in total audio length.
    *
    * Output: `(doc_id, hash, t)`.
    */
  def audioFingerprints(docs: DataFrame): DataFrame = {
    val fe = graft.functions.FrameEnergies(
      encode(coalesce(col("text"), lit("")), "utf-8"),
      FpFrameLen)
    // the whole constellation is per-clip local, so peaks AND landmark
    // pairs stay array-valued inside ONE narrow projection — no window,
    // no self-join, and (being stateless) the same expression serves
    // the streaming ingest gate unchanged
    val withPeaks = docs
      .select(col("doc_id"), fe.as("fe"))
      .select(
        col("doc_id"),
        filter(
          transform(col("fe"), (e, i) => struct(i.cast("long").as("t"), e.as("e"))),
          p =>
            p("e") >= lit(FpQuietEnergy) &&
              p("e") > when(p("t") === 0L, lit(-1L))
                .otherwise(try_element_at(col("fe"), p("t").cast("int"))) &&
              p("e") > coalesce(try_element_at(col("fe"), p("t").cast("int") + 2), lit(-1L)))
          .as("pk"))
    withPeaks
      .select(
        col("doc_id"),
        explode(
          flatten(transform(
            col("pk"),
            a =>
              transform(
                filter(col("pk"), b => b("t") - a("t") >= 1L && b("t") - a("t") <= FpFanout.toLong),
                b =>
                  struct(
                    (pmod(a("e"), lit(64L)) * 4096L + pmod(b("e"), lit(64L)) * 64L +
                      (b("t") - a("t"))).as("hash"),
                    a("t").as("t")))))).as("lm"))
      .select(col("doc_id"), col("lm.hash").as("hash"), col("lm.t").as("t"))
  }

  /** Cross-document matches over [[audioFingerprints]] — Wang 2003's
    * offset-histogram vote: two clips match when ≥ `minVotes` landmark
    * hashes agree AND their anchor-time differences are CONSISTENT
    * (the constant offset is the relative alignment of the two clips,
    * so a clip embedded mid-stream still matches, at a nonzero
    * offset — the property pHash framing loses on shifted content).
    *
    * Scale shape: the fingerprint table is materialized once; the
    * match join is hash-bucketed with hot buckets dropped at
    * [[FpBucketCap]] (audited work ≤ cap² per bucket, never corpus
    * all-pairs); the vote is one (doc_a, doc_b, offset) aggregate.
    *
    * Output: `(doc_a, doc_b, off, votes)`, doc_a < doc_b.
    */
  def audioMatches(docs: DataFrame, minVotes: Long = FpMinVotes): DataFrame = {
    val fp = Phys.materialized(audioFingerprints(docs))
    val ok = fp
      .groupBy(col("hash"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") <= FpBucketCap)
      .select(col("hash"))
    val x = fp.join(ok, Seq("hash")).alias("x")
    val y = fp.alias("y")
    x.join(y, col("x.hash") === col("y.hash") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(
        col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"),
        (col("x.t") - col("y.t")).as("off"))
      .agg(count(lit(1)).as("votes"))
      .filter(col("votes") >= minVotes)
  }

  /** [[audioMatches]] mirrored: hex-dump byte fold → frame energies →
    * peak constellation → landmark hashes → capped hash join → offset
    * vote.
    */
  def audioMatchesSql(minVotes: Long = FpMinVotes): String =
    s"""WITH b AS (SELECT doc_id, upper(hex(encode(coalesce(text, '')))) AS h FROM documents),
       |s AS (SELECT doc_id, list_transform(range(0, length(h) // 2), j ->
       |        (strpos('0123456789ABCDEF', substr(h, 2*j+1, 1)) - 1) * 16 +
       |        (strpos('0123456789ABCDEF', substr(h, 2*j+2, 1)) - 1)) AS bytes FROM b),
       |f AS (SELECT doc_id,
       |        list_transform(range(0, (len(bytes) + $FpFrameLen - 1) // $FpFrameLen),
       |          k -> CAST(list_sum(list_transform(
       |                 list_slice(bytes, k*$FpFrameLen + 1, least((k+1)*$FpFrameLen, len(bytes))),
       |                 v -> CAST((v-128)*(v-128) AS BIGINT))) AS BIGINT)) AS fe FROM s),
       |fr AS (SELECT doc_id, CAST(pos AS BIGINT) - 1 AS t, fe[CAST(pos AS INT)] AS e
       |       FROM (SELECT doc_id, fe, unnest(range(1, len(fe) + 1)) AS pos FROM f)),
       |pk AS (SELECT doc_id, t, e FROM (
       |         SELECT doc_id, t, e,
       |                lag(e, 1, -1) OVER (PARTITION BY doc_id ORDER BY t) AS pe,
       |                lead(e, 1, -1) OVER (PARTITION BY doc_id ORDER BY t) AS ne
       |         FROM fr)
       |       WHERE e >= $FpQuietEnergy AND e > pe AND e > ne),
       |fp AS (SELECT a.doc_id, (a.e % 64) * 4096 + (b.e % 64) * 64 + (b.t - a.t) AS hash, a.t
       |       FROM pk a JOIN pk b ON a.doc_id = b.doc_id AND b.t - a.t BETWEEN 1 AND $FpFanout),
       |ok AS (SELECT hash FROM fp GROUP BY hash HAVING count(*) <= $FpBucketCap)
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.t - y.t AS off,
       |       CAST(count(*) AS BIGINT) AS votes
       |FROM fp x JOIN ok ON ok.hash = x.hash
       |JOIN fp y ON y.hash = x.hash AND x.doc_id < y.doc_id
       |GROUP BY 1, 2, 3 HAVING count(*) >= $minVotes""".stripMargin

  /** Batch replay of the streaming audio-landmark gate
    * ([[graft.streaming.StreamOps.docAudioMatchGateOverParquet]]): the
    * same fingerprint chain split at `firstNewId`, store-side hot
    * buckets dropped, offset vote per (arrival, static) pair.
    */
  def audioMatchGateSql(firstNewId: Long, minVotes: Long = FpMinVotes): String =
    s"""WITH b AS (SELECT doc_id, upper(hex(encode(coalesce(text, '')))) AS h FROM documents),
       |s AS (SELECT doc_id, list_transform(range(0, length(h) // 2), j ->
       |        (strpos('0123456789ABCDEF', substr(h, 2*j+1, 1)) - 1) * 16 +
       |        (strpos('0123456789ABCDEF', substr(h, 2*j+2, 1)) - 1)) AS bytes FROM b),
       |f AS (SELECT doc_id,
       |        list_transform(range(0, (len(bytes) + $FpFrameLen - 1) // $FpFrameLen),
       |          k -> CAST(list_sum(list_transform(
       |                 list_slice(bytes, k*$FpFrameLen + 1, least((k+1)*$FpFrameLen, len(bytes))),
       |                 v -> CAST((v-128)*(v-128) AS BIGINT))) AS BIGINT)) AS fe FROM s),
       |fr AS (SELECT doc_id, CAST(pos AS BIGINT) - 1 AS t, fe[CAST(pos AS INT)] AS e
       |       FROM (SELECT doc_id, fe, unnest(range(1, len(fe) + 1)) AS pos FROM f)),
       |pk AS (SELECT doc_id, t, e FROM (
       |         SELECT doc_id, t, e,
       |                lag(e, 1, -1) OVER (PARTITION BY doc_id ORDER BY t) AS pe,
       |                lead(e, 1, -1) OVER (PARTITION BY doc_id ORDER BY t) AS ne
       |         FROM fr)
       |       WHERE e >= $FpQuietEnergy AND e > pe AND e > ne),
       |fp AS (SELECT a.doc_id, (a.e % 64) * 4096 + (b.e % 64) * 64 + (b.t - a.t) AS hash, a.t
       |       FROM pk a JOIN pk b ON a.doc_id = b.doc_id AND b.t - a.t BETWEEN 1 AND $FpFanout),
       |st AS (SELECT * FROM fp WHERE doc_id < $firstNewId),
       |ok AS (SELECT hash FROM st GROUP BY hash HAVING count(*) <= $FpBucketCap),
       |arr AS (SELECT * FROM fp WHERE doc_id >= $firstNewId)
       |SELECT a.doc_id, st.doc_id AS s_id, a.t - st.t AS off,
       |       CAST(count(*) AS BIGINT) AS votes
       |FROM arr a JOIN ok ON ok.hash = a.hash
       |JOIN st ON st.hash = a.hash
       |GROUP BY 1, 2, 3 HAVING count(*) >= $minVotes""".stripMargin
}
