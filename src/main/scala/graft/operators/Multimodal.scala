package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star; BASELINE.json north_star).
  *
  * Media (image/audio/video) are opaque `binary` columns plus a typed
  * metadata struct. The Spark-side plumbing — schema, partitioning, batch
  * shape, feature layout — is real and tested; the actual codec step is a
  * STUB (this container has no image/audio libraries): `decodeStub`
  * produces deterministic fake features derived from the bytes, clearly
  * marked, with the exact signature a real decoder (e.g. an
  * `mapInPandas`/`mapInArrow` Python worker or a JNI codec) would slot
  * into.
  *
  * Scale design: assets are processed partition-parallel; features are
  * fixed-width `array<float>` so downstream similarity/dedup operators
  * (Similarity, Dedup.embeddingNearDup) apply unchanged; metadata-only
  * queries never deserialize the binary payload (Parquet column pruning).
  */
object Multimodal {

  /** Canonical asset schema. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  /** Build an asset table from any source with an id and a binary-able
    * column (used in tests to fabricate assets from document text). */
  def fromBinary(df: DataFrame, idCol: String, binCol: Column,
      mediaType: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("asset_id"),
      lit(mediaType).as("media_type"),
      binCol.cast(BinaryType).as("payload"),
      struct(
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms"),
        lit("stub").as("codec")).as("meta"))

  /** Ingest a directory of real media files via Spark's `binaryFile`
    * source: one asset row per file, payload = file bytes, asset_id = a
    * stable 63-bit hash of the path. This is the production ingestion
    * edge for the multimodal plane — the source is distributed, prunes
    * `content` when only metadata columns are selected, and respects
    * `pathGlobFilter` for media-type routing. */
  def fromBinaryFiles(spark: SparkSession, dir: String,
      mediaType: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).bitwiseAND(lit(Long.MaxValue))
          .as("asset_id"),
        lit(mediaType).as("media_type"),
        col("content").as("payload"),
        struct(
          lit(null).cast(IntegerType).as("width"),
          lit(null).cast(IntegerType).as("height"),
          lit(null).cast(LongType).as("duration_ms"),
          lit("file").as("codec")).as("meta"),
        col("path"),
        col("length"))

  /** Metadata/size pass — never touches payload bytes beyond length, so
    * Parquet reads only the projected columns. */
  def describe(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"),
      col("media_type"),
      octet_length(col("payload")).as("payload_bytes"),
      md5(col("payload")).as("payload_md5"),
      col("meta.codec").as("codec"))

  // ---------------------------------------------------------------------
  // STUB decode path. A real deployment replaces `decodeStub` with a
  // codec (libjpeg/ffmpeg behind mapInArrow or a JVM decoder); everything
  // around it — partitioning, schema, feature width — is production shape.
  // ---------------------------------------------------------------------

  /** STUB "decode + feature extract": deterministic fake `featureDim`
    * floats derived from payload bytes (byte histogram moments), stands in
    * for a real embedding/decoded-frame featurizer. Pure built-ins, so the
    * plumbing is still codegen'd and engine-checkable. */
  def decodeStub(assets: DataFrame, featureDim: Int): DataFrame = {
    // fake features: f_i = ((md5 of payload ⊕ i) first 8 hex as uint) / 2^32
    val feats = (0 until featureDim).map { i =>
      (conv(substring(md5(concat(hex(col("payload")), lit(i.toString))), 1, 8),
        16, 10).cast("double") / lit(4294967296.0)).cast("float")
    }
    assets.select(col("asset_id"), col("media_type"),
      array(feats: _*).as("features"))
  }

  /** STUB frame sampling plumbing: emit `n` (asset_id, frame_no) rows per
    * video asset — the row-explosion shape of real frame extraction. */
  def sampleFrames(assets: DataFrame, n: Int): DataFrame =
    assets.filter(col("media_type") === "video")
      .select(col("asset_id"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_no"))
      .withColumn("frame_key",
        concat_ws("#", col("asset_id"), col("frame_no")))
}
