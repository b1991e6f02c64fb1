package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in partition-sized batches.
  *
  * The decode kernels themselves are STUBS (this container has no image/
  * audio codecs): `decodeRgbStub` derives deterministic fake pixels from
  * the payload bytes. Everything around the stub — the schema, the
  * batched `mapPartitions` shape (one buffer reuse per partition, the
  * same shape a JNI/FFI decoder needs), partition sizing, and the
  * frame-sampling offset math — is real and tested.
  *
  * Scale notes: payloads never pass through a shuffle here; feature
  * extraction is map-side, and the output is narrow (features only).
  * At 100 TB you'd repartitionByRange on doc_id only for sink sizing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false))), nullable = false)))

  /** Deterministic synthetic media table derived from `documents`: the
    * payload is the utf-8 text (stand-in for encoded bytes), metadata is
    * derived arithmetically — a stable fixture for the pipeline shape. */
  def synthesizeMedia(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "img").when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("format"),
        (col("n_chars") % 64 + 16).cast("int").as("width"),
        (col("n_chars") % 48 + 16).cast("int").as("height"),
        (col("doc_id") % 30 + 1).cast("int").as("n_frames")).as("meta"))

  /** STUB decode kernel: real implementation would call an image codec on
    * the payload; here the "pixels" are a deterministic function of the
    * bytes so the batch plumbing is testable end-to-end. */
  private def decodeRgbStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.min(w * h, 256))
    var i = 0
    while (i < out.length) {
      out(i) = (if (payload.isEmpty) 0 else payload(i % payload.length) ^ (i & 0x7F)).toByte
      i += 1
    }
    out
  }

  /** Typed input batch row for the decode kernel (public: Catalyst's
    * generated deserializer must construct it). */
  case class MediaIn(doc_id: Long, payload: Array[Byte], format: String,
                     width: Int, height: Int, n_frames: Int)
  /** Narrow numeric feature row the decoder emits. */
  case class MediaFeatureRow(doc_id: Long, format: String, payload_bytes: Long,
                             mean_pixel: Double, n_sampled_frames: Int)

  /** Batched feature extraction over binary payloads — a typed
    * `Dataset.mapPartitions` so a real decoder could amortize codec/
    * context setup per partition (the Scala analog of a pandas-UDF
    * batch). Stays inside the Dataset plan (Deserialize → MapPartitions →
    * Serialize, no RDD/createDataFrame hop), so Catalyst still prunes the
    * scan to exactly the six input columns and the downstream plan
    * re-enters whole-stage codegen. */
  def extractFeatures(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.n_frames").as("n_frames"))
      .as[MediaIn]
      .mapPartitions { rows =>
        // per-partition setup happens once (decoder init would go here)
        rows.map { m =>
          val payload = Option(m.payload).getOrElse(Array.emptyByteArray)
          val pixels = decodeRgbStub(payload, m.width, m.height)
          val mean =
            if (pixels.isEmpty) 0.0
            else pixels.map(b => (b & 0xFF).toLong).sum.toDouble / pixels.length
          MediaFeatureRow(m.doc_id, m.format, payload.length.toLong, mean,
            frameOffsets(m.n_frames, 5).length)
        }
      }
      .toDF()
  }

  /** Frame sampling: offsets of `k` evenly spaced frames out of n. */
  def frameOffsets(nFrames: Int, k: Int): Array[Int] =
    if (nFrames <= 0) Array.empty
    else if (nFrames <= k) Array.range(0, nFrames)
    else Array.tabulate(k)(i => i * nFrames / k)

  /** End-to-end stub pipeline over documents: synthesize → decode →
    * features, ordered for the rows-only check. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(synthesizeMedia(spark, dir)).orderBy("doc_id")
}
