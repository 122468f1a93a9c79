package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY payloads
  * with typed metadata, and a partition-wise feature-extraction stage.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB (`decodeStub`): it "decodes" the payload
  * into a 16-bin byte histogram. Everything around it — binary schema,
  * per-partition batch iteration, feature array output shape, partitioning
  * preservation — is the real Spark plumbing a libjpeg/ffmpeg-backed
  * implementation would drop into.
  *
  * Scale notes: mapPartitions keeps the decode batched per task with no
  * shuffle; payloads never leave their input partition. Feature arrays are
  * fixed-width, so downstream similarity joins shuffle 16·4 bytes per row,
  * not megabyte payloads.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeature(doc_id: Long, media_type: String, n_bytes: Int,
                                feature: Array[Float])

  /** Wrap a text table as a binary media table (payload = UTF-8 bytes — the
    * deterministic stand-in for real image/audio blobs in this container).
    */
  def asMediaTable(df: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      // deterministic fake modality tag from the id
      when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decode: real implementations replace this with the codec call
    * (e.g. JPEG decode → pixels, PCM frames, video frame-sample). The stub is
    * deterministic: normalized 16-bin histogram of payload bytes.
    */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < payload.length) { bins((payload(i) & 0xff) >> 4) += 1f; i += 1 }
    val n = math.max(payload.length, 1).toFloat
    var b = 0
    while (b < 16) { bins(b) /= n; b += 1 }
    bins
  }

  /** THE stage function, as a stable instance: the wire registry
    * (substrait.Stages) binds the stage name to this exact object, so a
    * different mapPartitions closure — even one defined in this file — can
    * never silently encode as graft.media_features_v1.
    */
  val mediaFeaturesFn: Iterator[MediaRow] => Iterator[MediaFeature] =
    rows =>
      // per-task init hook (real codecs allocate decoder state here, once)
      rows.map { r =>
        MediaFeature(r.doc_id, r.media_type, r.payload.length,
          decodeStub(r.payload))
      }

  /** Partition-wise feature extraction over the binary payloads. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions(mediaFeaturesFn)
  }

  /** Flattened, oracle-friendly projection: id, modality, byte count and the
    * first histogram bin (deterministic scalar from the stub decode).
    */
  def mediaFeatureSummary(spark: SparkSession, df: DataFrame): DataFrame = {
    val feats = extractFeatures(spark, asMediaTable(df))
    feats.toDF().select(
      col("doc_id"), col("media_type"), col("n_bytes"),
      round(element_at(col("feature"), 1).cast("double"), 6).as("bin0"))
  }

  /** Frame sampling: fixed-length binary frames cut at a fixed stride —
    * the video-ingestion plumbing (a real implementation swaps the byte
    * slice for an ffmpeg keyframe grab; the explode shape, per-frame rows
    * and downstream partitioning are identical). Frames of a payload stay
    * in its partition; no shuffle. The payload is lambda-bound (array
    * wrap) so octet_length and the slices evaluate against a value, not a
    * re-inlined expression.
    */
  def frameSample(media: DataFrame, frameLen: Int, stride: Int): DataFrame = {
    require(frameLen > 0 && stride > 0, "frameLen and stride must be positive")
    media.select(col("doc_id"), col("media_type"),
      posexplode(expr(
        s"""element_at(transform(array(payload), p ->
           |  CASE WHEN octet_length(p) = 0 THEN array(p)
           |  ELSE transform(
           |    sequence(0, greatest(cast(ceil(octet_length(p)
           |      / CAST($stride AS DOUBLE)) AS INT), 1) - 1),
           |    k -> substring(p, k * $stride + 1, $frameLen)) END), 1)""".stripMargin))
        .as(Seq("frame_idx", "frame")))
  }

  /** Resize stub: deterministic strided byte downsample to ≤ targetBytes —
    * the image-resize slot (a real implementation decodes, resamples pixels,
    * re-encodes; this preserves the contract: bounded-size deterministic
    * output, no shuffle, payload never leaves its partition).
    */
  def resized(media: DataFrame, targetBytes: Int,
              outCol: String = "payload_resized"): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    media.withColumn(outCol, expr(
      s"""element_at(transform(array(payload), p ->
         |  CASE WHEN octet_length(p) <= $targetBytes THEN p
         |  ELSE element_at(transform(
         |    array(cast(ceil(octet_length(p) / CAST($targetBytes AS DOUBLE)) AS INT)),
         |    st -> aggregate(sequence(0, $targetBytes - 1), unhex(''),
         |            (acc, k) -> concat(acc, substring(p, k * st + 1, 1)))), 1)
         |  END), 1)""".stripMargin))
  }
}
