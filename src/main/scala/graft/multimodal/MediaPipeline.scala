package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.I — multimodal column plumbing for a training-data
  * pipeline: media as opaque `binary` columns plus typed metadata, with
  * decode / feature-extract / resize / frame-sample stages.
  *
  * STUB BOUNDARY: this container ships no image/audio codecs, so
  * `decodeFeatures` is a clearly-marked deterministic fake (a 16-bin byte
  * histogram standing in for "decode then embed"). Everything around it —
  * the schema, the batch shape, partitioning, and the UDF signature
  * (binary -> float[]) — is the real plumbing a codec drop-in would use.
  * On a cluster the UDF body would call the codec (or a Pandas/Arrow UDF
  * batch in PySpark); the plan shape does not change.
  *
  * 100 TB notes: binary payloads dominate I/O — keep them in their own
  * parquet column chunk (automatic), filter on metadata columns first so
  * pushdown prunes row groups before bytes are read, and repartition by
  * size (`bytes` ranges) before the decode stage so the expensive UDF is
  * load-balanced rather than file-order-balanced.
  */
object MediaPipeline {

  /** A media table derived deterministically from the documents fixture:
    * content = utf-8 bytes of text, kind alternates image/audio, metadata
    * is typed columns (never packed inside the blob).
    */
  def mediaFrame(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents").select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      octet_length(col("text")).cast("bigint").as("bytes"),
      col("lang").as("meta_lang"),
      col("source").as("meta_source"))

  /** STUB decode: binary -> 16-bin byte histogram as Array[Float].
    * Deterministic; replace the body with a real codec to productionize.
    */
  val decodeFeatures = udf((bytes: Array[Byte]) => {
    val bins = new Array[Float](16)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { bins((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
      val n = math.max(1, bytes.length).toFloat
      var b = 0
      while (b < 16) { bins(b) /= n; b += 1 }
    }
    bins
  })

  /** Feature extraction stage: repartitions by size bucket so the decode
    * UDF is load-balanced, then appends the feature vector.
    */
  def withFeatures(df: DataFrame): DataFrame =
    df.repartition(col("bytes") / 100)
      .withColumn("features", decodeFeatures(col("content")))

  /** "Resize": re-bin a 16-dim histogram to 4 dims (sum of each 4-run) —
    * the stub analog of image downscaling, done with codegen'd built-ins.
    */
  def resize(df: DataFrame): DataFrame =
    df.withColumn("features_small",
      expr("transform(sequence(0, 3), i -> " +
        "aggregate(slice(features, i * 4 + 1, 4), CAST(0.0 AS FLOAT), (a, x) -> a + x))"))

  /** "Frame sample": every k-th byte of the payload (video frame-sampling
    * analog) as a short binary.
    */
  def frameSample(df: DataFrame, k: Int): DataFrame =
    df.withColumn("frames",
      expr(s"transform(sequence(1, CAST(octet_length(content) AS INT), $k), " +
        s"i -> substr(hex(content), (i - 1) * 2 + 1, 2))"))

  /** Full pipeline: decode -> resize -> sample -> per-kind feature stats. */
  def pipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val staged = frameSample(resize(withFeatures(mediaFrame(spark, sfDir))), 16)
    staged.groupBy("kind").agg(
      count(lit(1)).as("n_media"),
      sum(col("bytes")).as("total_bytes"),
      round(avg(expr("aggregate(features_small, CAST(0.0 AS FLOAT), (a, x) -> a + x)")), 3).as("avg_mass"),
      max(size(col("frames"))).as("max_frames"))
      .orderBy("kind")
  }
}
