package graft.ops

import graft.functions.{BinFingerprint, ByteHistogram, FrameSample}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multimodal (image/audio/video) columns as opaque binary + typed metadata.
 * The IMAGE branch is REAL: `imageMeta`/`imageResize`/`imageLumaHist` ride
 * the JDK's built-in `javax.imageio` codecs (PNG/JPEG/BMP/GIF) — header
 * parse, bilinear resize, pixel-luminance features, all null-tolerant for
 * the truncated files a web corpus is full of. Audio/video decode remains
 * a deterministic byte-level stand-in (no JDK codecs exist for them);
 * their pipeline shape — schema, narrow transforms, frame batching — is
 * real and tested, so swapping in an external codec touches one function.
 */
object Multimodal {
  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnShim.column(e)
  private def ex(col: Column) = ColumnShim.expression(col)

  // ---- REAL image branch (JDK javax.imageio) ----
  def imageMeta(payload: Column): Column = graft.functions.mx.imageMeta(payload)
  def imageResize(payload: Column, w: Int, h: Int): Column =
    graft.functions.mx.imageResize(payload, lit(w), lit(h))
  def imageLumaHist(payload: Column, bins: Int): Column =
    graft.functions.mx.imageLumaHist(payload, lit(bins))

  // ---- REAL audio branch (JDK javax.sound.sampled: WAV/AU/AIFF) ----
  def audioMeta(payload: Column): Column = graft.functions.mx.audioMeta(payload)
  def audioRmsEnvelope(payload: Column, bins: Int): Column =
    graft.functions.mx.audioRmsEnvelope(payload, lit(bins))

  def byteHistogram(payload: Column, bins: Int): Column =
    c(ByteHistogram(ex(payload), ex(lit(bins))))
  def fingerprint(payload: Column): Column = c(BinFingerprint(ex(payload)))
  def frameSample(payload: Column, n: Int): Column =
    c(FrameSample(ex(payload), ex(lit(n))))

  /** STUB decode: deterministic (width, height, n_bytes) pseudo-metadata
    * from the payload content — stands in for an image header parse. */
  def decodeMeta(payload: Column): Column = struct(
    (pmod(crc32(payload), lit(1792)) + 128).cast("int").as("width"),
    (pmod(crc32(reverse(payload)), lit(952)) + 128).cast("int").as("height"),
    length(payload).cast("long").as("n_bytes"))

  /** Media table derived from a documents frame: opaque payload bytes +
    * media_type + decoded metadata (pure projection, no shuffle). */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .withColumn("meta", decodeMeta(col("payload")))

  /** Per-media feature extraction: fingerprint + folded byte histogram
    * (narrow, codegen'd — the shape a real embedding UDF would take). */
  def features(media: DataFrame, bins: Int = 16): DataFrame =
    media.select(
      col("doc_id"), col("media_type"), col("meta"),
      fingerprint(col("payload")).as("fp"),
      byteHistogram(col("payload"), bins).as("hist"))

  /**
   * Image near-duplicate pairs: REAL decoded luminance histograms as the
   * feature vector, then the SAME multiprobe-LSH bucket join + exact
   * cosine refine as [[Similarity.nearDupPairs]] — media dedup rides the
   * text pipeline's scale machinery (bucket-keyed candidates, never
   * all-pairs). Undecodable payloads drop out (null feature). Cosine over
   * histograms is scale-invariant, so a resized copy of an image still
   * matches its original.
   */
  def imageNearDupPairs(media: DataFrame, payloadName: String, idName: String,
                        bins: Int = 32, threshold: Double = 0.97,
                        bits: Int = 10, nprobe: Int = 3): DataFrame = {
    val feats = media.select(col(idName),
        imageLumaHist(col(payloadName), bins).cast("array<float>").as("__v"))
      .filter(col("__v").isNotNull)
    Similarity.nearDupPairs(feats, "__v", idName, threshold, bits, nprobe)
  }

  /** Audio near-duplicate pairs over decoded RMS-envelope vectors — same
    * shape as [[imageNearDupPairs]] (envelope = loudness-over-time
    * signature; cosine is invariant to overall gain). */
  def audioNearDupPairs(media: DataFrame, payloadName: String, idName: String,
                        bins: Int = 32, threshold: Double = 0.97,
                        bits: Int = 10, nprobe: Int = 3): DataFrame = {
    val feats = media.select(col(idName),
        audioRmsEnvelope(col(payloadName), bins).cast("array<float>").as("__v"))
      .filter(col("__v").isNotNull)
    Similarity.nearDupPairs(feats, "__v", idName, threshold, bits, nprobe)
  }

  /** Frame sampling for video rows: one output row per frame slice, with
    * per-frame feature columns (explode = the distributed batch shape). */
  def frames(media: DataFrame, n: Int): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("doc_id"), posexplode(frameSample(col("payload"), n)).as(Seq("frame_idx", "frame")))
      .withColumn("frame_fp", fingerprint(col("frame")))
      .withColumn("frame_bytes", length(col("frame")).cast("long"))
}
