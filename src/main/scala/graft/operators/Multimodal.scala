package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal-column pipeline: image/audio/video as opaque `binary`
  * payloads with typed metadata, decoded in partition-sized batches.
  *
  * The decode kernels are REAL, codec-free byte arithmetic over three
  * self-describing formats (this container has no codec libraries, so the
  * formats are ones whose spec is pure header + raw samples):
  *
  *   - BMP: 14-byte file header + 40-byte BITMAPINFOHEADER, 24-bpp,
  *     bottom-up rows padded to 4-byte boundaries, BGR byte order. The
  *     decoder parses the header fields (offset, dims, planes, bpp,
  *     compression), un-pads each row, flips the vertical order and
  *     un-swizzles BGR back to the logical top-down RGB stream.
  *   - WAV: RIFF container walked chunk-by-chunk (word-aligned), `fmt `
  *     validated as PCM mono 16-bit, `data` parsed as little-endian
  *     signed samples.
  *   - Video: a concatenated stream of binary PPM (P6) frames (the
  *     image2pipe layout) — each frame's ASCII header is parsed, frame
  *     count is discovered from the stream itself, and 5 evenly spaced
  *     frames are sampled via [[frameOffsets]].
  *
  * Payloads are synthesized from a deterministic integer formula of
  * `doc_id` (encode side), so a DuckDB oracle can recompute the decoded
  * features in closed form — the q36 hash gate checks the full
  * encode → real parse → feature roundtrip. The order-weighted `checksum`
  * feature makes the gate sensitive to row flips, BGR swizzle, row
  * padding and frame-sampling mistakes that order-invariant aggregates
  * (sum/min/max) would miss.
  *
  * Analog in the reference: the typed-record parse discipline of
  * StreamingJob.scala:112–138 (parse → validate → typed fields) applied
  * to binary records.
  *
  * Scale notes: synthesis and decode are both map-side (no shuffle
  * touches a payload); output is a narrow numeric feature row. At 100 TB
  * you'd repartitionByRange on doc_id only for sink file sizing.
  */
object Multimodal {

  // deterministic payload-content formulas, shared verbatim by the
  // encoder, the spec's golden values, and the q36 DuckDB oracle
  private[graft] val SeedMul  = 131L
  private[graft] val IdxMul   = 7919L
  private[graft] val FrameMul = 104729L
  private[graft] def imgW(docId: Long): Int      = (docId % 24 + 8).toInt
  private[graft] def imgH(docId: Long): Int      = (docId % 16 + 8).toInt
  private[graft] def vidFrames(docId: Long): Int = (docId % 30 + 1).toInt
  private[graft] def wavSamples(docId: Long): Int = (docId % 2000 + 500).toInt
  /** Image pixel byte at logical top-down RGB flat index `i`. */
  private[graft] def imgVal(docId: Long, i: Int): Int =
    ((docId * SeedMul + i * IdxMul) % 256).toInt
  /** Video pixel byte in frame `f` at flat index `i`. */
  private[graft] def vidVal(docId: Long, f: Int, i: Int): Int =
    ((docId * SeedMul + f * FrameMul + i * IdxMul) % 256).toInt
  /** Signed 16-bit PCM sample `i`. */
  private[graft] def wavVal(docId: Long, i: Int): Short =
    ((docId * SeedMul + i * IdxMul) % 65536 - 32768).toShort

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false))), nullable = false)))

  /** Typed media record (public: Catalyst's generated serializer must
    * construct it). */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], format: String,
                         width: Int, height: Int, n_frames: Int)

  /** Deterministic synthetic media table derived from `documents`:
    * doc_id % 3 picks the modality (0 = BMP image, 1 = WAV audio,
    * 2 = PPM-stream video) and the payload is a REAL encoding in that
    * format of formula-generated pixels/samples. Map-side only; the
    * documents scan is pruned to the single `doc_id` column. */
  def synthesizeMedia(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          (id % 3).toInt match {
            case 0 =>
              val (w, h) = (imgW(id), imgH(id))
              MediaRecord(id, MediaCodecs.encodeBmp(w, h, imgVal(id, _)), "bmp", w, h, 1)
            case 1 =>
              val n = wavSamples(id)
              MediaRecord(id, MediaCodecs.encodeWav(Array.tabulate(n)(wavVal(id, _))), "wav", 0, 0, 1)
            case _ =>
              val (w, h, nf) = (imgW(id), imgH(id), vidFrames(id))
              MediaRecord(id, MediaCodecs.encodePpmStream(w, h, nf, vidVal(id, _, _)), "vid", w, h, nf)
          }
        }
      }
      .select(col("doc_id"), col("payload"),
        struct(col("format"), col("width"), col("height"), col("n_frames")).as("meta"))
  }

  /** Typed input batch row for the decode kernel. Only doc_id + payload:
    * the kernel sniffs the format and parses ALL geometry from the bytes
    * themselves — metadata is never trusted for decode. */
  case class MediaIn(doc_id: Long, payload: Array[Byte])
  /** Narrow numeric feature row the decoder emits. `checksum` is the
    * order-weighted sum Σ (i+1)·value(i) over the logical value stream. */
  case class MediaFeatureRow(doc_id: Long, format: String, payload_bytes: Long,
                             n_values: Long, sum_values: Long, min_value: Long,
                             max_value: Long, checksum: Long, n_sampled_frames: Long)

  /** Batched feature extraction over binary payloads — a typed
    * `Dataset.mapPartitions` so a real codec could amortize context setup
    * per partition. Stays inside the Dataset plan (Deserialize →
    * MapPartitions → Serialize, no RDD/createDataFrame hop), so Catalyst
    * still prunes the scan and the downstream plan re-enters whole-stage
    * codegen. */
  def extractFeatures(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions { rows =>
        // per-partition setup happens once (decoder buffers would go here)
        rows.map { m =>
          val payload = Option(m.payload).getOrElse(Array.emptyByteArray)
          decodeToFeatures(m.doc_id, payload)
        }
      }
      .toDF()
  }

  /** Sniff the container from magic bytes, parse it, and fold the decoded
    * value stream into the feature row in one pass. */
  private[graft] def decodeToFeatures(docId: Long, payload: Array[Byte]): MediaFeatureRow = {
    var n = 0L; var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue; var cks = 0L
    @inline def acc(v: Long): Unit = {
      n += 1; sum += v; if (v < mn) mn = v; if (v > mx) mx = v; cks += n * v
    }
    MediaCodecs.sniff(payload) match {
      case "bmp" =>
        MediaCodecs.decodeBmp(payload)(v => acc(v.toLong))
        MediaFeatureRow(docId, "bmp", payload.length.toLong, n, sum, mn, mx, cks, 1L)
      case "wav" =>
        MediaCodecs.decodeWav(payload)(s => acc(s.toLong))
        MediaFeatureRow(docId, "wav", payload.length.toLong, n, sum, mn, mx, cks, 1L)
      case "vid" =>
        val sampled = MediaCodecs.decodePpmStreamSampled(payload, 5)(v => acc(v.toLong))
        MediaFeatureRow(docId, "vid", payload.length.toLong, n, sum, mn, mx, cks, sampled.toLong)
      case other =>
        throw new IllegalArgumentException(s"doc $docId: unknown media container '$other'")
    }
  }

  /** Frame sampling: offsets of `k` evenly spaced frames out of n. */
  def frameOffsets(nFrames: Int, k: Int): Array[Int] =
    if (nFrames <= 0) Array.empty
    else if (nFrames <= k) Array.range(0, nFrames)
    else Array.tabulate(k)(i => i * nFrames / k)

  /** Thumbnail edge for [[mediaThumbnails]] (8×8 grayscale). */
  val ThumbEdge = 8

  /** Typed output row of the resize kernel. `thumb_checksum` is the
    * order-weighted Σ (t+1)·gray(t) over the ThumbEdge² grid, the q36
    * gate pattern. */
  case class ThumbRow(doc_id: Long, src_w: Long, src_h: Long, thumb_mean: Long,
                      thumb_min: Long, thumb_max: Long, thumb_checksum: Long)

  /** Nearest-neighbor grayscale resize of one decoded BMP to
    * [[ThumbEdge]]² — source pixel for thumb cell (ty, tx) is
    * (ty·H div E, tx·W div E), the [[frameOffsets]] mapping in 2-D;
    * gray = (R+G+B) div 3, all integer. */
  private[graft] def resizeBmpGray(docId: Long, payload: Array[Byte]): ThumbRow = {
    val (w, h, g) = grayGrid(payload)
    val e = ThumbEdge
    var t = 0; var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue; var cks = 0L
    while (t < e * e) {
      val gray = g(t)
      sum += gray; if (gray < mn) mn = gray; if (gray > mx) mx = gray
      cks += (t + 1) * gray
      t += 1
    }
    ThumbRow(docId, w.toLong, h.toLong, sum / (e * e), mn, mx, cks)
  }

  /** Decode one BMP and nearest-neighbor-resize it to the [[ThumbEdge]]²
    * grayscale grid (row-major) — the shared first stage of the q96
    * thumbnail summary and the q128 perceptual hash. */
  private[graft] def grayGrid(payload: Array[Byte]): (Int, Int, Array[Long]) = {
    val (w, h) = MediaCodecs.bmpDims(payload)
    val vals = new Array[Int](w * h * 3)
    var i = 0
    MediaCodecs.decodeBmp(payload) { v => vals(i) = v; i += 1 }
    (w, h, grayGridOf(vals, w, h))
  }

  /** Nearest-neighbor [[ThumbEdge]]² grayscale resize of one decoded RGB
    * frame buffer — shared by the BMP path ([[grayGrid]]) and the
    * per-frame video path ([[videoSignature]]). */
  private[graft] def grayGridOf(vals: Array[Int], w: Int, h: Int): Array[Long] = {
    val e = ThumbEdge
    val g = new Array[Long](e * e)
    var t = 0
    while (t < e * e) {
      val ty = t / e; val tx = t % e
      val sy = ty * h / e; val sx = tx * w / e
      val p = (sy * w + sx) * 3
      g(t) = (vals(p) + vals(p + 1) + vals(p + 2)) / 3L
      t += 1
    }
    g
  }

  /** q96 — media RESIZE: every BMP document decoded and downsampled to a
    * fixed [[ThumbEdge]]² grayscale thumbnail inside the same typed
    * `mapPartitions` batch-kernel shape as [[extractFeatures]] — the
    * image-normalization step (fixed input geometry) a multimodal
    * training pipeline runs between decode and feature extraction. The
    * nearest-neighbor map is [[frameOffsets]]'s integer sampling in 2-D,
    * so resize and frame-sampling share one portability argument; the
    * DuckDB oracle re-derives the sampled grid from the synthetic pixel
    * generator exactly (integer div everywhere, no float filtering).
    *
    * Scale shape: per-row kernel work bounded by source geometry, output
    * a constant ThumbEdge²-fold summary per image; plan stays
    * scan → typed MapPartitions → sort, no shuffle before the gate. */
  def mediaThumbnails(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .where(col("meta.format") === "bmp")
      .select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions { rows =>
        rows.map(m => resizeBmpGray(m.doc_id, Option(m.payload).getOrElse(Array.emptyByteArray)))
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Persisted media table — the encode pass runs ONCE per corpus
    * content-fingerprint and lands as parquet; q36/q96 then decode
    * payloads READ from storage, which is both the real 100 TB shape
    * (media arrives as stored bytes, nobody re-synthesizes it per query)
    * and half the fixed CPU of the old synthesize-then-decode-per-run
    * plan. Same single-writer check-then-write contract as the span
    * digests ([[graft.sources.Artifacts]]); the q36 oracle re-derives
    * the expected features from the doc_id formulas in closed form every
    * verify run, so corrupted or stale stored payloads fail the hash
    * gate loudly — the artifact is re-gated, never trusted. */
  private[graft] def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Artifacts.Warehouse + "/media_" + dir.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 3)
    if (!graft.sources.Artifacts.isBuilt(spark, path))
      synthesizeMedia(spark, dir).write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** End-to-end media pipeline over documents: real-format payloads
    * (encoded once, [[mediaTable]]) → parse → features, ordered for the
    * hash gate (q36). */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir)).orderBy("doc_id")

  /** Max bit-Hamming distance for [[imageNearDup]] verdicts (of 64). */
  val ImgHammingMax = 6

  /** Typed aHash row: the 64-bit perceptual hash split into two
    * non-negative 32-bit halves so every downstream band/XOR/popcount —
    * on BOTH engines — runs on values with no sign bit to disagree
    * about (DuckDB range-checks BIGINT shifts; Spark wraps). `lo` holds
    * thumb cells 0–31 (bit t = cell t), `hi` cells 32–63. */
  case class AHashRow(doc_id: Long, hi: Long, lo: Long)

  /** Average-hash of one thumbnail grid: bit t set iff cell t is at or
    * above the grid mean — compared as `64·gray(t) >= Σ gray` so the
    * mean never rounds (the exact-integer analog of gray >= mean). */
  private[graft] def aHashOf(g: Array[Long]): (Long, Long) = {
    var sum = 0L; var t = 0
    while (t < g.length) { sum += g(t); t += 1 }
    var hi = 0L; var lo = 0L
    t = 0
    while (t < 64) {
      if (64L * g(t) >= sum) {
        if (t < 32) lo |= 1L << t else hi |= 1L << (t - 32)
      }
      t += 1
    }
    (hi, lo)
  }

  /** Per-image perceptual hashes: decode → 8×8 gray grid ([[grayGrid]],
    * q96's kernel) → [[aHashOf]], in the same typed mapPartitions batch
    * shape as [[extractFeatures]]. Map-side only. */
  private[graft] def imageAHashes(spark: SparkSession, dir: String): DataFrame =
    imageAHashesOf(mediaTable(spark, dir).where(col("meta.format") === "bmp"))

  /** The hash kernel over an arbitrary (doc_id, payload) frame — shared
    * by the corpus path, the q137 batch probe, and the streaming ingest
    * twin. */
  private[graft] def imageAHashesOf(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media
      .select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions { rows =>
        rows.map { m =>
          val (_, _, g) = grayGrid(Option(m.payload).getOrElse(Array.emptyByteArray))
          val (hi, lo) = aHashOf(g)
          AHashRow(m.doc_id, hi, lo)
        }
      }
      .toDF()
  }

  /** Persisted corpus image-hash INDEX: one (hi, lo) → min doc_id row
    * per distinct perceptual hash over the corpus split's BMPs (batch
    * residue doc_id%10=9 held out, the q68 split) — the durable state
    * the incremental image dedup probes. Same build-once fingerprint
    * contract as the LSH/IVF/span artifacts; at 100 TB you'd bucket it
    * by (hi, lo) for a shuffle-free probe join. */
  private[graft] def imageHashIndex(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Artifacts.Warehouse + "/img_ahash_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 5)
    if (!graft.sources.Artifacts.isBuilt(spark, path))
      imageAHashesOf(mediaTable(spark, dir)
        .where(col("meta.format") === "bmp" && pmod(col("doc_id"), lit(10)) =!= 9))
        .groupBy("hi", "lo").agg(min("doc_id").as("dup_of"))
        .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** q137 — INCREMENTAL image dedup: the crawl-increment batch
    * (doc_id%10=9, the q68 split at image level) hashed and probed
    * against the persisted corpus hash index — an arriving image whose
    * perceptual hash the corpus already holds is a dup of the earliest
    * such image, everything else is new. Exact-hash probing (Hamming-0)
    * is the image twin of q68's content-md5 probe; near-miss batches
    * escalate to q128's banded machinery offline. Batch docs never
    * index each other (q72's contract), which is exactly what makes the
    * streaming twin ([[graft.streaming.StreamingAnalytics
    * .imageDupVerdictsPerBatch]]) reproduce this table under ANY
    * micro-batching.
    *
    * Scale shape: hashing is map-side; the probe is one equi-join of
    * the batch against a hash-keyed index (bucketed at 100 TB →
    * shuffle-free); verdicts are one row per batch image. */
  def imageIncrementalDedup(spark: SparkSession, dir: String): DataFrame =
    imageIncrementalDedupOf(spark, dir,
      mediaTable(spark, dir)
        .where(col("meta.format") === "bmp" && pmod(col("doc_id"), lit(10)) === 9))

  /** [[imageIncrementalDedup]] over an arbitrary batch frame — the
    * per-micro-batch core of the streaming twin. */
  private[graft] def imageIncrementalDedupOf(spark: SparkSession, dir: String,
      batch: DataFrame): DataFrame =
    imageAHashesOf(batch)
      .join(imageHashIndex(spark, dir), Seq("hi", "lo"), "left")
      .select(col("doc_id"), col("hi"), col("lo"),
        when(col("dup_of").isNull, "new").otherwise("dup").as("status"),
        col("dup_of"))
      .orderBy("doc_id")

  /** q128 — PERCEPTUAL image near-dup: every BMP document is reduced to
    * a 64-bit aHash over its q96 thumbnail (decode → 8×8 gray grid →
    * mean-threshold bits), then the q31 banded-Hamming machinery finds
    * near-identical images: 4 bands of 16 bits, candidates share a band
    * (pigeonhole guarantees recall for distance ≤ 3; beyond that it is
    * LSH-style candidate generation, same contract as q31), buckets
    * capped at [[Dedup.MaxBucket]] smallest doc_ids with the overflow
    * observed, verified by exact XOR-popcount Hamming ≤
    * [[ImgHammingMax]]. This is image-level dedup for a multimodal
    * training corpus — re-encoded or re-scaled copies of one picture
    * collapse to the same hash even when their byte payloads differ
    * (the corpus's identical-content classes land at distance 0; the
    * spec drives few-bit-flip fixtures through the band recall).
    *
    * The DuckDB oracle re-derives the hash from the synthetic pixel
    * generator in closed form (the q96 pattern) and replays the same
    * banding, cap, and popcount — the gate covers decode → resize →
    * hash → band → verify end-to-end.
    *
    * Scale shape: hashing is map-side; the only data-sized shuffle is
    * the band groupBy (4 rows/image, the q31 bound); pair expansion is
    * O(MaxBucket²) per bucket; verify runs BEFORE the cross-band
    * distinct so only surviving near-pairs pay that shuffle. Never
    * all-pairs. */
  def imageNearDup(spark: SparkSession, dir: String): DataFrame =
    imageNearDupUnordered(spark, dir).orderBy("d1", "d2")

  /** [[imageNearDup]] without the presentation sort — the form
    * [[imageDupClusters]] composes (its first move is a re-shuffle, the
    * q30/q31 composition argument). */
  private def imageNearDupUnordered(spark: SparkSession, dir: String): DataFrame = {
    Diagnostics.install(spark)
    val banded = imageAHashes(spark, dir).select(
      col("doc_id"), col("hi"), col("lo"),
      posexplode(array(
        expr("hi div 65536"), expr("hi % 65536"),
        expr("lo div 65536"), expr("lo % 65536"))).as(Seq("band_idx", "band_val")))
    val buckets = banded
      .groupBy(col("band_idx"), col("band_val"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("hi"), col("lo")))).as("all_members"))
      .where(size(col("all_members")) >= 2)
      .withColumn("members", slice(col("all_members"), 1, Dedup.MaxBucket))
      .observe("q128_image_buckets",
        sum(greatest(size(col("all_members")) - Dedup.MaxBucket, lit(0))).as("overflow_members_dropped"))
    buckets
      .select(explode(expr(
        """flatten(transform(members, (x, i) ->
          |  transform(slice(members, i + 2, size(members)), y ->
          |    named_struct('d1', x.doc_id, 'hi1', x.hi, 'lo1', x.lo,
          |                 'd2', y.doc_id, 'hi2', y.hi, 'lo2', y.lo))))""".stripMargin)).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"),
        expr("CAST(bit_count(p.hi1 ^ p.hi2) + bit_count(p.lo1 ^ p.lo2) AS BIGINT)").as("hamming"))
      // verify + threshold BEFORE the cross-band dedup (a duplicate
      // candidate's hamming is identical in every band), q31's trick
      .where(col("hamming") <= ImgHammingMax)
      .distinct()
  }

  /** q133 — image DUP CLUSTERS + survivor selection: q128's verified
    * near-pairs folded into connected components (the q61 large-star/
    * small-star contraction, O(log n) rounds) and reduced to the
    * actionable keep-list — per image cluster, the canonical survivor
    * under the policy an image corpus actually wants: keep the
    * HIGHEST-RESOLUTION copy (largest pixel area from the stored
    * metadata catalog; ties → smallest doc_id), with member count and
    * the pixel mass the dedup removes. The text side's q61/q120 story
    * completed for the multimodal column.
    *
    * Scale shape: pair generation is q128's banded plan; contraction is
    * O(log n) bounded rounds over the (sparse) pair set; the area join
    * is doc-keyed against a metadata projection of the media table (no
    * payload bytes move); the argmax is ONE comp-keyed max(struct)
    * aggregate, output bounded by cluster count. */
  /** Low-motion threshold for [[videoSignatures]]: mean consecutive
    * sampled-frame Hamming (×100) below this flags a static video. */
  val LowMotionX100 = 800L

  /** Typed per-video signature row. ham_* are None for single-sampled-
    * frame streams (no transitions to measure). */
  case class VideoSigRow(doc_id: Long, n_frames: Long, n_sampled: Long,
                         cks_hi: Long, cks_lo: Long,
                         ham_min: Option[Long], ham_max: Option[Long],
                         ham_mean_x100: Option[Long], low_motion: Boolean)

  /** Shared decode for the video kernels: total frame count + one aHash
    * per sampled frame, in temporal order (real PPM byte parsing via
    * [[MediaCodecs.decodePpmStreamSampled]], the q36 sampling). */
  private def videoFrameHashSeq(payload: Array[Byte]): (Long, Array[(Long, Long)]) =
    videoFrameHashSeq(payload, 5)

  /** [[videoFrameHashSeq]] at sampling width `k` — `Int.MaxValue` hashes
    * EVERY frame (the q147 dense representation; a 100 TB deployment
    * samples at a stride instead). */
  private def videoFrameHashSeq(payload: Array[Byte], k: Int): (Long, Array[(Long, Long)]) = {
    val (w, h) = MediaCodecs.ppmDims(payload)
    val frameBytes = w * h * 3
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    var cur: Array[Int] = null
    var idx = 0
    // frame count from the SAME validated header walk as the pixel pass
    // (size arithmetic broke on fps-tagged fixture streams, whose
    // headers are non-uniform; a second ppmFrameCount walk was the r17
    // redundant-scan advisory)
    val (_, nFrames) = MediaCodecs.decodePpmStreamSampledCounted(payload, k) { v =>
      if (idx % frameBytes == 0) { cur = new Array[Int](frameBytes); frames += cur }
      cur(idx % frameBytes) = v
      idx += 1
    }
    (nFrames.toLong, frames.map(vals => aHashOf(grayGridOf(vals, w, h))).toArray)
  }

  /** Decode a PPM stream's sampled frames (real byte parsing), resize
    * each to the [[ThumbEdge]]² gray grid, aHash per frame, and fold
    * into the temporal signature: order-weighted hash checksums plus
    * consecutive-frame Hamming statistics. */
  private[graft] def videoSignature(docId: Long, payload: Array[Byte]): VideoSigRow = {
    val (nFrames, hashes) = videoFrameHashSeq(payload)
    var cksHi = 0L; var cksLo = 0L
    hashes.zipWithIndex.foreach { case ((hi, lo), i) =>
      cksHi += (i + 1) * hi; cksLo += (i + 1) * lo
    }
    val hams = hashes.sliding(2).collect { case Array((h1, l1), (h2, l2)) =>
      (java.lang.Long.bitCount(h1 ^ h2) + java.lang.Long.bitCount(l1 ^ l2)).toLong
    }.toArray
    val (mn, mx, meanX100) =
      if (hams.isEmpty) (Option.empty[Long], Option.empty[Long], Option.empty[Long])
      else (Some(hams.min), Some(hams.max), Some(100L * hams.sum / hams.length))
    VideoSigRow(docId, nFrames, hashes.length.toLong, cksHi, cksLo,
      mn, mx, meanX100, meanX100.map(_ < LowMotionX100).getOrElse(true))
  }

  /** q134 — video TEMPORAL-ACTIVITY signatures: every video document's
    * sampled frames ([[frameOffsets]], the q36 sampling) are each
    * reduced to the q128 perceptual aHash, then folded into a per-video
    * signature — order-weighted hash checksums (the q36 gate pattern,
    * so frame order and content are both pinned) and consecutive-frame
    * Hamming statistics. Mean inter-frame Hamming is the cheap temporal
    * ACTIVITY score a video curation pipeline cuts on: a near-zero mean
    * is a static/slideshow stream (low training value per byte), and a
    * single-frame stream is static by definition (`low_motion`, with
    * NULL Hamming stats — nothing to measure). The DuckDB oracle
    * re-derives every sampled frame's hash from the pixel generator in
    * closed form.
    *
    * Scale shape: one typed mapPartitions decode kernel (map-side, the
    * q36 shape); output is one narrow row per video; no shuffle before
    * the contract sort. */
  def videoSignatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .where(col("meta.format") === "vid")
      .select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions { rows =>
        rows.map(m => videoSignature(m.doc_id, Option(m.payload).getOrElse(Array.emptyByteArray)))
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Typed per-sampled-frame hash row — the video near-dup path's unit
    * of comparison (`si` = sampled-frame position, `ns` = sampled count). */
  case class VideoFrameRow(doc_id: Long, n_frames: Long, ns: Long, si: Int,
                           hi: Long, lo: Long)

  /** One row per (video, sampled frame) with the frame's q128 aHash —
    * the decode kernel [[videoSignatures]] uses, exploded instead of
    * folded (map-side, ≤ 5 rows per video). */
  private[graft] def videoFrameTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .where(col("meta.format") === "vid")
      .select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions { rows =>
        rows.flatMap { m =>
          val (nf, hs) = videoFrameHashSeq(Option(m.payload).getOrElse(Array.emptyByteArray))
          hs.iterator.zipWithIndex.map { case ((hi, lo), i) =>
            VideoFrameRow(m.doc_id, nf, hs.length.toLong, i, hi, lo)
          }
        }
      }
      .toDF()
  }

  /** q139 — VIDEO near-dup verdicts: the q128→q133 story completed for
    * the temporal modality. Candidate generation bands each SAMPLED
    * FRAME's aHash exactly like q128 (4 × 16-bit bands), but keyed by
    * (frame position, band): two videos become candidates when they
    * agree on a 16-bit band AT THE SAME TEMPORAL POSITION — pigeonhole
    * gives full recall for any aligned frame within 3 flipped bits, and
    * a re-encoded copy of a whole video collides on every band of every
    * frame. Buckets are capped at [[Dedup.MaxBucket]] smallest doc_ids
    * with overflow observed (`q139_video_buckets`), the q29/q128 cap
    * contract. Verification is the aligned ENVELOPE distance: both
    * videos must carry the same sampled-frame count, every position must
    * align, and every aligned frame pair must sit within
    * [[ImgHammingMax]] bits (the per-frame max is the binding cut — a
    * mean-only cut would let one ruined frame hide inside an otherwise
    * identical stream). Emits per-pair totals a curation pass ranks on.
    *
    * The corpus's generator-periodic exact classes (Δ doc_id = 3840:
    * same dims + frame count + pixel stream) exist only above the gate
    * SFs, so gated output is empty there and real pairs appear at
    * sf0.1/8× — the spec drives crafted re-encode/bit-flip fixtures
    * through [[videoNearDupOf]] instead (the q128 fixture pattern).
    *
    * Scale shape: hashing is map-side; the only data-sized shuffle is
    * the (si, band) groupBy (≤ 20 rows/video); pair expansion is capped
    * per bucket; the verify join touches only candidate pairs' frame
    * rows (≤ 5 per side). Never all-pairs. */
  def videoNearDup(spark: SparkSession, dir: String): DataFrame =
    videoNearDupUnordered(spark, dir).orderBy("d1", "d2")

  private def videoNearDupUnordered(spark: SparkSession, dir: String): DataFrame = {
    Diagnostics.install(spark)
    videoNearDupOf(videoFrameTable(spark, dir))
  }

  /** [[videoNearDup]] over an arbitrary frame-hash table — the unit the
    * spec drives crafted fixtures through. */
  private[graft] def videoNearDupOf(fh: DataFrame): DataFrame = {
    val banded = fh.select(
      col("doc_id"), col("si"),
      posexplode(array(
        expr("hi div 65536"), expr("hi % 65536"),
        expr("lo div 65536"), expr("lo % 65536"))).as(Seq("band_idx", "band_val")))
    val buckets = banded
      .groupBy(col("si"), col("band_idx"), col("band_val"))
      .agg(array_sort(collect_list(col("doc_id"))).as("all_members"))
      .where(size(col("all_members")) >= 2)
      .withColumn("members", slice(col("all_members"), 1, Dedup.MaxBucket))
      .observe("q139_video_buckets",
        sum(greatest(size(col("all_members")) - Dedup.MaxBucket, lit(0))).as("overflow_members_dropped"))
    val cand = buckets
      .select(explode(expr(
        """flatten(transform(members, (x, i) ->
          |  transform(slice(members, i + 2, size(members)), y ->
          |    named_struct('d1', x, 'd2', y))))""".stripMargin)).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()
    val a = fh.select(col("doc_id").as("d1"), col("ns").as("ns1"),
      col("si"), col("hi").as("hi1"), col("lo").as("lo1"))
    val b = fh.select(col("doc_id").as("d2"), col("ns").as("ns2"),
      col("si"), col("hi").as("hi2"), col("lo").as("lo2"))
    cand.join(a, Seq("d1")).join(b, Seq("d2", "si"))
      .select(col("d1"), col("d2"), col("ns1"), col("ns2"),
        expr("CAST(bit_count(hi1 ^ hi2) + bit_count(lo1 ^ lo2) AS BIGINT)").as("ham"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_aligned"), max("ns1").as("ns1"), max("ns2").as("ns2"),
        sum(col("ham")).as("ham_total"), max(col("ham")).as("ham_max"))
      .where(col("ns1") === col("ns2") && col("n_aligned") === col("ns1")
        && col("ham_max") <= lit(ImgHammingMax))
      .select(col("d1"), col("d2"), col("n_aligned").as("n_frames_aligned"),
        col("ham_total"), col("ham_max"))
  }

  /** One row per (video, frame) with EVERY frame's aHash — the q147
    * dense frame representation ([[videoFrameTable]] with the sampling
    * opened to stride 1; a 100 TB deployment strides instead, trading
    * clip-boundary resolution for decode cost). */
  private[graft] def videoAllFrameTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .where(col("meta.format") === "vid")
      .select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions { rows =>
        rows.flatMap { m =>
          val (nf, hs) = videoFrameHashSeq(
            Option(m.payload).getOrElse(Array.emptyByteArray), Int.MaxValue)
          hs.iterator.zipWithIndex.map { case ((hi, lo), i) =>
            VideoFrameRow(m.doc_id, nf, hs.length.toLong, i, hi, lo)
          }
        }
      }
      .toDF()
  }

  /** q147 — video PREFIX CONTAINMENT: the q135 asymmetric-containment
    * idea at frame level — detects a TRUNCATED or clipped re-encode
    * (one video is a frame-prefix of another), which q139's
    * equal-sampled-count alignment cut rejects BY DESIGN (and evenly
    * spaced sampling of two different lengths lands on different source
    * frames, so no sampled representation can align them). Over the
    * dense per-frame hash table: candidates share a 16-bit band of
    * their FIRST frame's aHash (a prefix copy shares frame 0 exactly,
    * so pigeonhole gives full recall to 3 flipped first-frame bits;
    * buckets capped at [[Dedup.MaxBucket]] with overflow observed);
    * verification aligns the overlapping prefix frame-by-frame and
    * requires every aligned pair within [[ImgHammingMax]] bits (q139's
    * per-frame max cut). Verdict: `d1_in_d2` / `d2_in_d1` by which side
    * is shorter, `mutual` when equal-length (q139's exact class, seen
    * here at Hamming tolerance).
    *
    * The corpus's Δ doc_id = 768 video classes (same dims + pixel
    * formula, DIFFERENT frame counts — frames don't depend on nf) are
    * true prefix copies, so sf0.1 carries real directional verdicts;
    * gate-SF output is empty (ids span no 768 class) and the spec
    * drives a crafted truncation fixture from q139-reject to a
    * direction verdict.
    *
    * Scale shape: decode is map-side; banding shuffles 4 rows per video
    * (frame 0 only); pair expansion capped per bucket; the verify join
    * touches only candidate pairs' frame rows, bounded by the SHORTER
    * side's length. Never all-pairs. */
  def videoPrefixContainment(spark: SparkSession, dir: String): DataFrame = {
    Diagnostics.install(spark)
    videoPrefixContainmentOf(videoDenseFrames(spark, dir))
  }

  /** Persisted dense per-frame hash table — decode-once for the whole
    * corpus (the media-table pattern one stage later: stored media is
    * decoded to frame hashes once per fingerprint, and every dense
    * consumer — q147's pair chain, q148's index build — reads the
    * parquet). At 100 TB this is exactly the frame-hash table a
    * deployment maintains alongside the media store, bucketed by
    * doc_id. The oracles re-derive the hashes from pixels every verify
    * run, so the artifact is re-gated, never trusted. */
  private[graft] def videoDenseFrames(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Artifacts.Warehouse + "/vid_frames_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 147)
    if (!graft.sources.Artifacts.isBuilt(spark, path))
      videoAllFrameTable(spark, dir).write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** [[videoPrefixContainment]] over an arbitrary dense frame-hash
    * table — the unit the spec drives crafted fixtures through. */
  private[graft] def videoPrefixContainmentOf(fh: DataFrame): DataFrame = {
    val banded = fh.where(col("si") === 0).select(
      col("doc_id"),
      posexplode(array(
        expr("hi div 65536"), expr("hi % 65536"),
        expr("lo div 65536"), expr("lo % 65536"))).as(Seq("band_idx", "band_val")))
    val buckets = banded
      .groupBy(col("band_idx"), col("band_val"))
      .agg(array_sort(collect_list(col("doc_id"))).as("all_members"))
      .where(size(col("all_members")) >= 2)
      .withColumn("members", slice(col("all_members"), 1, Dedup.MaxBucket))
      .observe("q147_prefix_buckets",
        sum(greatest(size(col("all_members")) - Dedup.MaxBucket, lit(0))).as("overflow_members_dropped"))
    val cand = buckets
      .select(explode(expr(
        """flatten(transform(members, (x, i) ->
          |  transform(slice(members, i + 2, size(members)), y ->
          |    named_struct('d1', x, 'd2', y))))""".stripMargin)).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()
    videoPrefixVerify(cand, fh, fh)
  }

  /** The shared q147/q148/q179 verify ([[audioPrefixVerify]]'s video
    * twin, factored r18): join the overlapping frame prefix of every
    * candidate pair, cut at per-frame [[ImgHammingMax]], emit the
    * direction verdict. The aligned-count check is an invariant (dense
    * 0..ns-1 indices), not a cut. */
  private def videoPrefixVerify(cand: DataFrame, side1: DataFrame,
      side2: DataFrame): DataFrame = {
    val a = side1.select(col("doc_id").as("d1"), col("ns").as("ns1"),
      col("si"), col("hi").as("hi1"), col("lo").as("lo1"))
    val b = side2.select(col("doc_id").as("d2"), col("ns").as("ns2"),
      col("si"), col("hi").as("hi2"), col("lo").as("lo2"))
    cand.join(a, Seq("d1")).join(b, Seq("d2", "si"))
      .select(col("d1"), col("d2"), col("ns1"), col("ns2"),
        expr("CAST(bit_count(hi1 ^ hi2) + bit_count(lo1 ^ lo2) AS BIGINT)").as("ham"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_frames_aligned"), max("ns1").as("n_frames_1"),
        max("ns2").as("n_frames_2"),
        sum(col("ham")).as("ham_total"), max(col("ham")).as("ham_max"))
      .where(col("n_frames_aligned") === least(col("n_frames_1"), col("n_frames_2"))
        && col("ham_max") <= lit(ImgHammingMax))
      .select(col("d1"), col("d2"), col("n_frames_1"), col("n_frames_2"),
        col("n_frames_aligned"), col("ham_total"), col("ham_max"),
        when(col("n_frames_1") === col("n_frames_2"), "mutual")
          .when(col("n_frames_1") < col("n_frames_2"), "d1_in_d2")
          .otherwise("d2_in_d1").as("relation"))
      .orderBy("d1", "d2")
  }

  /** Frozen video prefix-containment INDEX (the q143 three-table
    * pattern at video level), built once per corpus fingerprint:
    *  - `bands`: the corpus split's frame-0 aHash bands, capped at
    *    [[Dedup.MaxBucket]] smallest doc_ids per (band_idx, band_val)
    *    with the drop frozen at build time (the q143 frozen-df-cut
    *    contract — a batch never re-prices corpus band occupancy);
    *  - `frames`: the corpus split's dense per-frame hashes — the
    *    persisted frame-hash table a 100 TB deployment buckets by
    *    doc_id for a shuffle-free verify join.
    * `isBuilt` probes the bands path, written LAST, so its _SUCCESS
    * certifies both tables. */
  private[graft] def videoPrefixIndexPaths(dir: String): (String, String) = {
    val base = graft.sources.Artifacts.Warehouse + "/vid_prefix_idx_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 148)
    (base + "/bands", base + "/frames")
  }

  private[graft] def videoPrefixIndex(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val (bPath, fPath) = videoPrefixIndexPaths(dir)
    if (!graft.sources.Artifacts.isBuilt(spark, bPath)) {
      val corpus = videoDenseFrames(spark, dir)
        .where(pmod(col("doc_id"), lit(VideoBatchMod)) =!= VideoBatchResidue)
      corpus.write.mode("overwrite").parquet(fPath)
      corpus.where(col("si") === 0).select(
          col("doc_id"),
          posexplode(array(
            expr("hi div 65536"), expr("hi % 65536"),
            expr("lo div 65536"), expr("lo % 65536"))).as(Seq("band_idx", "band_val")))
        .groupBy(col("band_idx"), col("band_val"))
        .agg(array_sort(collect_list(col("doc_id"))).as("all_members"))
        .withColumn("members", slice(col("all_members"), 1, Dedup.MaxBucket))
        .observe("q148_index_bands",
          sum(greatest(size(col("all_members")) - Dedup.MaxBucket, lit(0))).as("overflow_members_dropped"))
        .select(col("band_idx"), col("band_val"), explode(col("members")).as("doc_id"))
        .write.mode("overwrite").parquet(bPath)
    }
    (spark.read.parquet(bPath), spark.read.parquet(fPath))
  }

  /** q148 — INCREMENTAL video prefix containment: q147's
    * truncated-copy verdicts for a crawl increment WITHOUT re-pairing
    * the corpus — the q143 incremental-containment story at frame
    * level, completing the incremental family (exact q68/q137/q144,
    * near-dup q72, span q106, containment q143). Each batch video
    * (doc_id % [[VideoBatchMod]] = [[VideoBatchResidue]], the q144
    * split) is densely frame-hashed map-side; its frame-0 bands probe
    * the FROZEN corpus band index for candidates, and the verify joins
    * only the candidates' corpus frame rows — q147's per-frame max cut
    * and direction verdict verbatim, `d1` the batch video, `d2` its
    * corpus relative. Batch videos never pair each other (q72's
    * contract), so the streaming twin
    * ([[graft.streaming.StreamingAnalytics.videoContainmentPerBatch]])
    * reproduces this table under ANY micro-batching.
    *
    * Scale shape: batch-proportional — only the batch is decoded; the
    * corpus touches are two equi-joins against persisted tables
    * ((band_idx, band_val)-keyed candidates, doc-keyed frame rows);
    * no corpus re-decode, no re-banding, no batch self-pairs. */
  def videoPrefixIncremental(spark: SparkSession, dir: String): DataFrame =
    videoPrefixIncrementalOf(spark, dir,
      mediaTable(spark, dir)
        .where(col("meta.format") === "vid" &&
          pmod(col("doc_id"), lit(VideoBatchMod)) === VideoBatchResidue))

  /** [[videoPrefixIncremental]] over an arbitrary (doc_id, payload)
    * batch — the per-micro-batch core of the streaming twin. */
  private[graft] def videoPrefixIncrementalOf(spark: SparkSession, dir: String,
      batch: DataFrame): DataFrame = {
    import spark.implicits._
    val (bands, frames) = videoPrefixIndex(spark, dir)
    val bfh = batch.select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions { rows =>
        rows.flatMap { m =>
          val (nf, hs) = videoFrameHashSeq(
            Option(m.payload).getOrElse(Array.emptyByteArray), Int.MaxValue)
          hs.iterator.zipWithIndex.map { case ((hi, lo), i) =>
            VideoFrameRow(m.doc_id, nf, hs.length.toLong, i, hi, lo)
          }
        }
      }
      .toDF()
      // pinned: bfh feeds BOTH the frame-0 candidate probe and the
      // verify side — without the pin the video-decode mapPartitions
      // re-executed (the audio twin's r15 advisory applies here too).
      .localCheckpoint(true)
    val cand = bfh.where(col("si") === 0).select(
        col("doc_id").as("d1"),
        posexplode(array(
          expr("hi div 65536"), expr("hi % 65536"),
          expr("lo div 65536"), expr("lo % 65536"))).as(Seq("band_idx", "band_val")))
      .join(bands, Seq("band_idx", "band_val"))
      .select(col("d1"), col("doc_id").as("d2"))
      .distinct()
    videoPrefixVerify(cand, bfh, frames)
  }

  // --- audio prefix containment (q173/q174, r15 verdict task 5) ---------

  /** Samples per FIXED-DURATION audio prefix window: 64 cells ×
    * 4 samples, hashed with the one threshold-signature kernel
    * ([[aHashOf]], shared with images/video/q141). Fixed duration, not
    * equal-mass: q141's equal-mass envelope is resample-invariant but
    * WHOLE-TRACK — a clipped copy renormalizes every window boundary and
    * becomes invisible to it. Fixed windows keep the shared prefix of a
    * clip and its source aligned window-for-window (q147's frame-prefix
    * idea at sample level). The trade is explicit: this catches
    * same-rate clips/truncations; a clip that was ALSO resampled needs a
    * resample-normalization stage first — out of scope here. Only FULL
    * windows are signed (the trailing partial window carries different
    * mass for clip and source and would poison the last comparison). */
  val AudioPrefixWindowSamples = 256

  /** Typed per-window audio prefix row: `nw` = full windows in the
    * track, `wi` = this window's index, hi/lo the window's 64-bit
    * threshold signature. */
  case class AudioWinRow(doc_id: Long, n_samples: Long, nw: Long, wi: Long,
                         hi: Long, lo: Long)

  /** Decode one WAV through the real RIFF kernel and sign each full
    * [[AudioPrefixWindowSamples]]-sample window: 64 cell energies, bit t
    * set iff 64·e(t) ≥ window total (the [[aHashOf]] rule). */
  private[graft] def audioPrefixWindowsOf(docId: Long, payload: Array[Byte])
      : Iterator[AudioWinRow] = {
    val samples = scala.collection.mutable.ArrayBuffer.empty[Int]
    MediaCodecs.decodeWav(payload)(s => samples += math.abs(s.toInt))
    val n = samples.length
    val nw = n / AudioPrefixWindowSamples
    signPrefixWindows(samples).map { case (w, hi, lo) =>
      AudioWinRow(docId, n.toLong, nw.toLong, w.toLong, hi, lo)
    }
  }

  /** Sign every full [[AudioPrefixWindowSamples]]-sample window of an
    * |PCM| sequence — the q173 kernel body, shared with the q176
    * rate-normalized variant. */
  private def signPrefixWindows(samples: scala.collection.IndexedSeq[Int])
      : Iterator[(Int, Long, Long)] = {
    val nw = samples.length / AudioPrefixWindowSamples
    val cell = AudioPrefixWindowSamples / AudioWindows
    (0 until nw).iterator.map { w =>
      val e = new Array[Long](AudioWindows)
      var i = 0
      while (i < AudioPrefixWindowSamples) {
        e(i / cell) += samples(w * AudioPrefixWindowSamples + i).toLong
        i += 1
      }
      val (hi, lo) = aHashOf(e)
      (w, hi, lo)
    }
  }

  /** Dense window-signature table for an arbitrary (doc_id, payload)
    * set — typed mapPartitions decode, map-side, one row per full
    * window. */
  private[graft] def audioWindowTableOf(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions(rows => rows.flatMap(m =>
        audioPrefixWindowsOf(m.doc_id, Option(m.payload).getOrElse(Array.emptyByteArray))))
      .toDF()
  }

  /** Persisted dense per-window signature table — decode-once for the
    * corpus (the [[videoDenseFrames]] pattern for audio); every prefix
    * consumer (q173 pair chain, q174 index build) reads the parquet.
    * Oracles re-derive the signatures from the PCM generator each
    * verify run, so the artifact is re-gated, never trusted. */
  private[graft] def audioDenseWindows(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Artifacts.Warehouse + "/aud_windows_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 173)
    if (!graft.sources.Artifacts.isBuilt(spark, path))
      audioWindowTableOf(mediaTable(spark, dir).where(col("meta.format") === "wav"))
        .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** q173 — AUDIO PREFIX CONTAINMENT: catches the clipped/truncated
    * audio copy q141 cannot see (its whole-track equal-mass envelope
    * renormalizes under clipping). Candidates share a 16-bit band of
    * window 0's signature (capped buckets, overflow observed); the
    * verify joins the overlapping window prefix and demands every
    * aligned window within [[ImgHammingMax]]; direction verdict at
    * window resolution (shorter side contained in longer; equal counts
    * → mutual).
    *
    * Scale shape: the dense window table is persisted (decode-once);
    * banding shuffles 4 rows per track; the verify is an equi-join on
    * (doc, window index) over candidates only — no quadratic pass. */
  def audioPrefixContainment(spark: SparkSession, dir: String): DataFrame = {
    Diagnostics.install(spark)
    audioPrefixContainmentOf(audioDenseWindows(spark, dir))
  }

  /** [[audioPrefixContainment]] over an arbitrary window table — the
    * unit the spec drives crafted clip fixtures through. */
  private[graft] def audioPrefixContainmentOf(wt: DataFrame): DataFrame = {
    val banded = wt.where(col("wi") === 0).select(
      col("doc_id"),
      posexplode(array(
        expr("hi div 65536"), expr("hi % 65536"),
        expr("lo div 65536"), expr("lo % 65536"))).as(Seq("band_idx", "band_val")))
    val buckets = banded
      .groupBy(col("band_idx"), col("band_val"))
      .agg(array_sort(collect_list(col("doc_id"))).as("all_members"))
      .where(size(col("all_members")) >= 2)
      .withColumn("members", slice(col("all_members"), 1, Dedup.MaxBucket))
      .observe("q173_prefix_buckets",
        sum(greatest(size(col("all_members")) - Dedup.MaxBucket, lit(0))).as("overflow_members_dropped"))
    val cand = buckets
      .select(explode(expr(
        """flatten(transform(members, (x, i) ->
          |  transform(slice(members, i + 2, size(members)), y ->
          |    named_struct('d1', x, 'd2', y))))""".stripMargin)).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()
    audioPrefixVerify(cand, wt, wt)
  }

  /** The shared q173/q174 verify: join the overlapping window prefix of
    * every candidate pair, cut at per-window [[ImgHammingMax]], emit the
    * direction verdict. The aligned-count check is an invariant (dense
    * 0..nw-1 indices), not a cut. */
  private def audioPrefixVerify(cand: DataFrame, side1: DataFrame,
      side2: DataFrame): DataFrame = {
    val a = side1.select(col("doc_id").as("d1"), col("nw").as("nw1"),
      col("wi"), col("hi").as("hi1"), col("lo").as("lo1"))
    val b = side2.select(col("doc_id").as("d2"), col("nw").as("nw2"),
      col("wi"), col("hi").as("hi2"), col("lo").as("lo2"))
    cand.join(a, Seq("d1")).join(b, Seq("d2", "wi"))
      .select(col("d1"), col("d2"), col("nw1"), col("nw2"),
        expr("CAST(bit_count(hi1 ^ hi2) + bit_count(lo1 ^ lo2) AS BIGINT)").as("ham"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_windows_aligned"), max("nw1").as("n_windows_1"),
        max("nw2").as("n_windows_2"),
        sum(col("ham")).as("ham_total"), max(col("ham")).as("ham_max"))
      .where(col("n_windows_aligned") === least(col("n_windows_1"), col("n_windows_2"))
        && col("ham_max") <= lit(ImgHammingMax))
      .select(col("d1"), col("d2"), col("n_windows_1"), col("n_windows_2"),
        col("n_windows_aligned"), col("ham_total"), col("ham_max"),
        when(col("n_windows_1") === col("n_windows_2"), "mutual")
          .when(col("n_windows_1") < col("n_windows_2"), "d1_in_d2")
          .otherwise("d2_in_d1").as("relation"))
      .orderBy("d1", "d2")
  }

  /** Frozen audio prefix-containment INDEX (the q148 two-table pattern
    * for audio): `bands` = the corpus split's window-0 signature bands
    * capped at [[Dedup.MaxBucket]] smallest doc_ids (drop frozen at
    * build — a batch never re-prices corpus band occupancy); `windows`
    * = the corpus split's dense window signatures. `isBuilt` probes the
    * bands path, written LAST, so its _SUCCESS certifies both. Corpus
    * split is q68's doc_id % 10 ≠ 9 — the q145 audio-family
    * convention. */
  private[graft] def audioPrefixIndexPaths(dir: String): (String, String) = {
    val base = graft.sources.Artifacts.Warehouse + "/aud_prefix_idx_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 174)
    (base + "/bands", base + "/windows")
  }

  private[graft] def audioPrefixIndex(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val (bPath, wPath) = audioPrefixIndexPaths(dir)
    if (!graft.sources.Artifacts.isBuilt(spark, bPath)) {
      val corpus = audioDenseWindows(spark, dir)
        .where(pmod(col("doc_id"), lit(10)) =!= 9)
      corpus.write.mode("overwrite").parquet(wPath)
      corpus.where(col("wi") === 0).select(
          col("doc_id"),
          posexplode(array(
            expr("hi div 65536"), expr("hi % 65536"),
            expr("lo div 65536"), expr("lo % 65536"))).as(Seq("band_idx", "band_val")))
        .groupBy(col("band_idx"), col("band_val"))
        .agg(array_sort(collect_list(col("doc_id"))).as("all_members"))
        .withColumn("members", slice(col("all_members"), 1, Dedup.MaxBucket))
        .observe("q174_index_bands",
          sum(greatest(size(col("all_members")) - Dedup.MaxBucket, lit(0))).as("overflow_members_dropped"))
        .select(col("band_idx"), col("band_val"), explode(col("members")).as("doc_id"))
        .write.mode("overwrite").parquet(bPath)
    }
    (spark.read.parquet(bPath), spark.read.parquet(wPath))
  }

  /** q174 — INCREMENTAL audio prefix containment: q173's clip verdicts
    * for a crawl increment WITHOUT re-pairing the corpus — the q148
    * frozen-index story for audio, closing the prefix family
    * (video q147/q148, audio q173/here). Each batch track
    * (doc_id % 10 = 9, the q145 split) is decoded and window-signed
    * map-side; its window-0 bands probe the FROZEN corpus band index
    * for candidates; the verify joins only the candidates' corpus
    * window rows — q173's per-window cut and direction verdict
    * verbatim, `d1` the batch track, `d2` its corpus relative. Batch
    * tracks never pair each other (q72's contract).
    *
    * Scale shape: batch-proportional decode + sign; candidate discovery
    * is an equi-join of ≤4 band rows per batch track against the capped
    * index; the window verify touches only candidate corpus rows. */
  def audioPrefixIncremental(spark: SparkSession, dir: String): DataFrame =
    audioPrefixIncrementalOf(spark, dir,
      mediaTable(spark, dir)
        .where(col("meta.format") === "wav" && pmod(col("doc_id"), lit(10)) === 9))

  /** [[audioPrefixIncremental]] over an arbitrary (doc_id, payload)
    * batch. */
  private[graft] def audioPrefixIncrementalOf(spark: SparkSession, dir: String,
      batch: DataFrame): DataFrame = {
    val (bands, windows) = audioPrefixIndex(spark, dir)
    // pinned: bwt feeds BOTH the window-0 candidate probe and the verify
    // side, so without the pin the WAV-decode mapPartitions re-executed
    // (r15, advisory). Batch-proportional by contract — a cheap pin.
    val bwt = audioWindowTableOf(batch).localCheckpoint(true)
    val cand = bwt.where(col("wi") === 0).select(
        col("doc_id").as("d1"),
        posexplode(array(
          expr("hi div 65536"), expr("hi % 65536"),
          expr("lo div 65536"), expr("lo % 65536"))).as(Seq("band_idx", "band_val")))
      .join(bands, Seq("band_idx", "band_val"))
      .select(col("d1"), col("doc_id").as("d2"))
      .distinct()
    audioPrefixVerify(cand, bwt, windows)
  }

  // --- rate-normalized audio prefix containment (q176, r16 task 6) ------

  /** Canonical sample rate the normalization stage maps every track to
    * — the generator's encode rate. */
  val AudioCanonicalRate = 8000

  /** [[AudioWinRow]] plus the track's parsed header rate; `n_samples`
    * and window indices count POST-normalization samples. */
  case class AudioWinNormRow(doc_id: Long, sample_rate: Int, n_samples: Long,
                             nw: Long, wi: Long, hi: Long, lo: Long)

  /** The q176 kernel: decode, read the header rate ([[MediaCodecs
    * .wavSampleRate]]), NEAREST-NEIGHBOR resample to
    * [[AudioCanonicalRate]] (out(i) = in(⌊i·rate/canon⌋), length
    * ⌊n·canon/rate⌋), then window-sign with the q173 kernel. This
    * closes the q173 trade documented at [[AudioPrefixWindowSamples]]:
    * a copy that is BOTH resampled and clipped evades q141 (the clip
    * breaks the whole-track equal-mass envelope) and q173 (the rate
    * breaks sample-index window alignment); mapping every track to the
    * canonical rate first restores the alignment, so the clip lands
    * back on its source's windows (spec-proven flip through a real
    * 16 kHz WAV fixture). At the canonical rate the map is the identity
    * (⌊i·8000/8000⌋ = i), so on the generator corpus this table equals
    * [[audioPrefixWindowsOf]]'s — the closed form the q176 oracle
    * replays. NN instead of a polyphase filter keeps the stage
    * integer-exact (oracle-replayable); the CONTRACT — header-driven
    * canonical-rate mapping before window signing — is what a
    * production resampler slots into, map-side either way. */
  private[graft] def audioPrefixWindowsNormalizedOf(docId: Long, payload: Array[Byte])
      : Iterator[AudioWinNormRow] = {
    val raw = scala.collection.mutable.ArrayBuffer.empty[Int]
    MediaCodecs.decodeWav(payload)(s => raw += math.abs(s.toInt))
    val rate = MediaCodecs.wavSampleRate(payload)
    val samples: scala.collection.IndexedSeq[Int] =
      if (rate == AudioCanonicalRate) raw
      else {
        val m = (raw.length.toLong * AudioCanonicalRate / rate).toInt
        (0 until m).map(i => raw((i.toLong * rate / AudioCanonicalRate).toInt))
      }
    val n = samples.length
    val nw = n / AudioPrefixWindowSamples
    signPrefixWindows(samples).map { case (w, hi, lo) =>
      AudioWinNormRow(docId, rate, n.toLong, nw.toLong, w.toLong, hi, lo)
    }
  }

  /** Rate-normalized window-signature table for an arbitrary
    * (doc_id, payload) set — map-side decode + normalize + sign. */
  private[graft] def audioNormWindowTableOf(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions(rows => rows.flatMap(m =>
        audioPrefixWindowsNormalizedOf(m.doc_id,
          Option(m.payload).getOrElse(Array.emptyByteArray))))
      .toDF()
  }

  /** Persisted rate-normalized window table (decode-once, the
    * [[audioDenseWindows]] pattern; fingerprint key 176). On the
    * all-canonical generator corpus its signatures are provably
    * identical to the raw table's — the artifact still runs the REAL
    * normalization kernel (header parse + rate branch) so the gated
    * query prices the production path, and the oracle re-derives the
    * windows from the PCM generator each verify run. */
  private[graft] def audioNormWindows(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Artifacts.Warehouse + "/aud_norm_windows_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 176)
    if (!graft.sources.Artifacts.isBuilt(spark, path))
      audioNormWindowTableOf(mediaTable(spark, dir).where(col("meta.format") === "wav"))
        .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** q176 — RATE-NORMALIZED audio prefix containment: q173's pair
    * machinery over the normalized window table, plus both sides'
    * parsed header rates for provenance. Catches the
    * resampled-AND-clipped copy that was out of scope by design in r15
    * (the q173 Scaladoc records the trade; the r15 verdict asked for
    * exactly this stage).
    *
    * Scale shape: q173's — persisted decode-once table, 4 band rows per
    * track, candidate-only window verify — plus two equi-joins of the
    * pair-bounded verdicts against a one-row-per-track rate projection. */
  def audioPrefixContainmentNormalized(spark: SparkSession, dir: String): DataFrame = {
    Diagnostics.install(spark)
    val wt = audioNormWindows(spark, dir)
    // one row per signed track: the rate is constant within a track, so
    // its window-0 row IS the rate projection — no corpus-wide groupBy
    // (r17 advisory; a track with zero full windows has no rows at all,
    // and no verdicts either, so the inner join loses nothing)
    val rates = wt.where(col("wi") === 0).select(col("doc_id"), col("sample_rate").as("sr"))
    audioPrefixContainmentOf(wt)
      .join(rates.select(col("doc_id").as("d1"), col("sr").as("sample_rate_1")), Seq("d1"))
      .join(rates.select(col("doc_id").as("d2"), col("sr").as("sample_rate_2")), Seq("d2"))
      .select(col("d1"), col("d2"), col("sample_rate_1"), col("sample_rate_2"),
        col("n_windows_1"), col("n_windows_2"), col("n_windows_aligned"),
        col("ham_total"), col("ham_max"), col("relation"))
      .orderBy("d1", "d2")
  }

  // --- rate-normalized INCREMENTAL audio prefix containment (q177,
  //     r17 verdict task 2) ------------------------------------------

  /** Frozen RATE-NORMALIZED audio prefix index (the q174 two-table
    * pattern over [[audioNormWindows]]): `bands` = the corpus split's
    * normalized window-0 signature bands capped at [[Dedup.MaxBucket]]
    * smallest doc_ids (drop frozen at build); `windows` = the corpus
    * split's normalized window signatures WITH parsed header rates.
    * This closes the r16 gap the q174 raw index left open: a
    * resampled+clipped copy ARRIVING AS AN INCREMENT evaded ingest
    * (the raw index signs at the raw rate) and was only caught by the
    * next full q176 audit. Corpus split is q68's doc_id % 10 ≠ 9 —
    * the audio-family convention. `isBuilt` probes the bands path,
    * written LAST, so its _SUCCESS certifies both. */
  private[graft] def audioPrefixNormIndexPaths(dir: String): (String, String) = {
    val base = graft.sources.Artifacts.Warehouse + "/aud_norm_prefix_idx_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 177)
    (base + "/bands", base + "/windows")
  }

  private[graft] def audioPrefixNormIndex(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val (bPath, wPath) = audioPrefixNormIndexPaths(dir)
    if (!graft.sources.Artifacts.isBuilt(spark, bPath)) {
      val corpus = audioNormWindows(spark, dir)
        .where(pmod(col("doc_id"), lit(10)) =!= 9)
      corpus.write.mode("overwrite").parquet(wPath)
      corpus.where(col("wi") === 0).select(
          col("doc_id"),
          posexplode(array(
            expr("hi div 65536"), expr("hi % 65536"),
            expr("lo div 65536"), expr("lo % 65536"))).as(Seq("band_idx", "band_val")))
        .groupBy(col("band_idx"), col("band_val"))
        .agg(array_sort(collect_list(col("doc_id"))).as("all_members"))
        .withColumn("members", slice(col("all_members"), 1, Dedup.MaxBucket))
        .observe("q177_index_bands",
          sum(greatest(size(col("all_members")) - Dedup.MaxBucket, lit(0))).as("overflow_members_dropped"))
        .select(col("band_idx"), col("band_val"), explode(col("members")).as("doc_id"))
        .write.mode("overwrite").parquet(bPath)
    }
    (spark.read.parquet(bPath), spark.read.parquet(wPath))
  }

  /** q177 — rate-normalized INCREMENTAL audio prefix containment:
    * q176's resample-proof verdicts for a crawl increment WITHOUT
    * re-pairing the corpus. Each batch track (doc_id % 10 = 9) is
    * decoded, header-rate-NORMALIZED ([[audioPrefixWindowsNormalizedOf]])
    * and window-signed map-side; its normalized window-0 bands probe
    * the FROZEN normalized corpus index; the verify is q173's
    * per-window cut and direction verdict over normalized windows, plus
    * both sides' parsed header rates for provenance. Batch tracks never
    * pair each other (q72's contract), so the streaming twin
    * ([[graft.streaming.StreamingAnalytics.audioContainmentNormalizedPerBatch]])
    * reproduces this table under ANY micro-batching.
    *
    * Scale shape: q174's — batch-proportional decode+normalize+sign
    * (the resample is map-side, O(batch samples)); candidate discovery
    * is ≤4 band rows per batch track against the capped frozen index;
    * the window verify touches only candidate corpus rows; the rate
    * projections are pair-bounded equi-joins. */
  def audioPrefixIncrementalNormalized(spark: SparkSession, dir: String): DataFrame =
    audioPrefixIncrementalNormalizedOf(spark, dir,
      mediaTable(spark, dir)
        .where(col("meta.format") === "wav" && pmod(col("doc_id"), lit(10)) === 9))

  /** [[audioPrefixIncrementalNormalized]] over an arbitrary
    * (doc_id, payload) batch — the per-micro-batch core of the
    * streaming twin and the unit the spec drives the resampled-clip
    * fixture through. */
  private[graft] def audioPrefixIncrementalNormalizedOf(spark: SparkSession, dir: String,
      batch: DataFrame): DataFrame = {
    val (bands, windows) = audioPrefixNormIndex(spark, dir)
    // pinned: bwt feeds the candidate probe, the verify side AND the
    // batch-rate projection (the q174 r15 advisory, one consumer more)
    val bwt = audioNormWindowTableOf(batch).localCheckpoint(true)
    val cand = bwt.where(col("wi") === 0).select(
        col("doc_id").as("d1"),
        posexplode(array(
          expr("hi div 65536"), expr("hi % 65536"),
          expr("lo div 65536"), expr("lo % 65536"))).as(Seq("band_idx", "band_val")))
      .join(bands, Seq("band_idx", "band_val"))
      .select(col("d1"), col("doc_id").as("d2"))
      .distinct()
    // window-0 rows as the rate projections (rate constant per track;
    // r17 advisory — the old corpus-wide groupBy re-aggregated the whole
    // windows table per batch/micro-batch)
    val r1 = bwt.where(col("wi") === 0).select(col("doc_id"), col("sample_rate").as("sr"))
    val r2 = windows.where(col("wi") === 0).select(col("doc_id"), col("sample_rate").as("sr"))
    audioPrefixVerify(cand, bwt, windows)
      .join(r1.select(col("doc_id").as("d1"), col("sr").as("sample_rate_1")), Seq("d1"))
      .join(r2.select(col("doc_id").as("d2"), col("sr").as("sample_rate_2")), Seq("d2"))
      .select(col("d1"), col("d2"), col("sample_rate_1"), col("sample_rate_2"),
        col("n_windows_1"), col("n_windows_2"), col("n_windows_aligned"),
        col("ham_total"), col("ham_max"), col("relation"))
      .orderBy("d1", "d2")
  }

  // --- time-normalized video prefix containment (q178, r17 verdict
  //     task 3) ------------------------------------------------------

  /** Canonical video frame rate the time-normalization stage maps every
    * stream to — the generator's (untagged) encode rate. */
  val VideoCanonicalFps = 24

  /** [[VideoFrameRow]] plus the stream's parsed time-base tag; `ns`
    * and `si` count POST-normalization frames. */
  case class VideoNormFrameRow(doc_id: Long, fps: Int, n_frames: Long, ns: Long,
                               si: Int, hi: Long, lo: Long)

  /** The q178 kernel: decode every frame's aHash, read the header
    * time-base ([[MediaCodecs.ppmFrameRate]]), NEAREST-NEIGHBOR
    * re-time to [[VideoCanonicalFps]] (out(t) = in(⌊t·fps/canon⌋),
    * length ⌊n·canon/fps⌋) — sampling at canonical TIMESTAMPS instead
    * of integer frame positions. This closes the video analog of the
    * q173 audio trade (r16 verdict): a re-timed re-encode (frame-rate
    * changed) shifts every integer-position-sampled frame and evaded
    * BOTH q139's aligned-envelope verify and q147's prefix containment;
    * mapping every stream to the canonical time base first lands the
    * copy back on its source's frames (spec-proven flip through the
    * real PPM kernel with a 48 fps frame-doubled fixture). At the
    * canonical rate the map is the identity (⌊t·24/24⌋ = t), so on the
    * untagged generator corpus this table equals the dense raw
    * table's — the closed form the q178 oracle replays. NN re-timing
    * keeps the stage integer-exact (oracle-replayable); the CONTRACT —
    * header-driven canonical-time-base sampling before frame hashing —
    * is what a production frame-interpolating retimer slots into,
    * map-side either way.
    *
    * A tagged stream whose canonical duration rounds below one frame
    * (fps > n·[[VideoCanonicalFps]], reachable only via crafted
    * payloads under the [[MediaCodecs.MaxPpmFps]] bound) emits ZERO
    * rows — the explicit decision (r17 advisory): sub-one-frame
    * canonical content has nothing to sign, exactly like an audio
    * track shorter than one full [[AudioPrefixWindowSamples]] window
    * (zero rows from [[audioPrefixWindowsNormalizedOf]]); the stream
    * then has no verdicts and no rate-projection row, consistently. */
  private[graft] def videoFrameHashSeqNormalized(docId: Long, payload: Array[Byte])
      : Iterator[VideoNormFrameRow] = {
    val (nf, hs) = videoFrameHashSeq(payload, Int.MaxValue)
    val fps = MediaCodecs.ppmFrameRate(payload, VideoCanonicalFps)
    val norm: Array[(Long, Long)] =
      if (fps == VideoCanonicalFps) hs
      else {
        val m = (hs.length.toLong * VideoCanonicalFps / fps).toInt
        Array.tabulate(m)(t => hs((t.toLong * fps / VideoCanonicalFps).toInt))
      }
    norm.iterator.zipWithIndex.map { case ((hi, lo), i) =>
      VideoNormFrameRow(docId, fps, nf, norm.length.toLong, i, hi, lo)
    }
  }

  /** Time-normalized dense frame-hash table for an arbitrary
    * (doc_id, payload) set — map-side decode + re-time + hash. */
  private[graft] def videoNormFrameTableOf(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions(rows => rows.flatMap(m =>
        videoFrameHashSeqNormalized(m.doc_id,
          Option(m.payload).getOrElse(Array.emptyByteArray))))
      .toDF()
  }

  /** Persisted time-normalized dense frame table (decode-once, the
    * [[videoDenseFrames]] pattern; fingerprint key 178). On the
    * all-untagged generator corpus its hashes are provably identical
    * to the raw dense table's — the artifact still runs the REAL
    * normalization kernel (header tag parse + re-time branch) so the
    * gated query prices the production path, and the oracle re-derives
    * every frame hash from the pixel generator each verify run. */
  private[graft] def videoNormFrames(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Artifacts.Warehouse + "/vid_norm_frames_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 178)
    if (!graft.sources.Artifacts.isBuilt(spark, path))
      videoNormFrameTableOf(mediaTable(spark, dir).where(col("meta.format") === "vid"))
        .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** q178 — TIME-NORMALIZED video prefix containment: q147's pair
    * machinery over the time-normalized frame table, plus both sides'
    * parsed time-base tags for provenance — the q176 rate-normalization
    * story at video level, closing the r16 verdict's "no video
    * time-base normalization" gap.
    *
    * Scale shape: q147's — persisted decode-once table, 4 band rows per
    * video, candidate-only frame verify — plus two pair-bounded
    * equi-joins against a one-row-per-video time-base projection. */
  def videoPrefixContainmentTimeNormalized(spark: SparkSession, dir: String): DataFrame = {
    Diagnostics.install(spark)
    val ft = videoNormFrames(spark, dir)
    // frame-0 rows as the time-base projection (fps constant per
    // stream; r17 advisory — no corpus-wide groupBy)
    val rates = ft.where(col("si") === 0).select(col("doc_id"), col("fps").as("f"))
    videoPrefixContainmentOf(ft)
      .join(rates.select(col("doc_id").as("d1"), col("f").as("fps_1")), Seq("d1"))
      .join(rates.select(col("doc_id").as("d2"), col("f").as("fps_2")), Seq("d2"))
      .select(col("d1"), col("d2"), col("fps_1"), col("fps_2"),
        col("n_frames_1"), col("n_frames_2"), col("n_frames_aligned"),
        col("ham_total"), col("ham_max"), col("relation"))
      .orderBy("d1", "d2")
  }

  // --- time-normalized INCREMENTAL video prefix containment (q179,
  //     r18 verdict task 2) ------------------------------------------

  /** Frozen TIME-NORMALIZED video prefix index (the q177 two-table
    * pattern at video level, over [[videoNormFrames]]): `bands` = the
    * corpus split's normalized frame-0 aHash bands capped at
    * [[Dedup.MaxBucket]] smallest doc_ids (drop frozen at build);
    * `frames` = the corpus split's normalized dense frame hashes WITH
    * parsed time-base tags. This closes the r17 verdict's remaining
    * ingest gap: q148 probes the RAW frame index, so a re-timed
    * re-encode ARRIVING AS AN INCREMENT evaded ingest and was only
    * caught by the next full q178 batch audit — exactly the audio gap
    * q177 closed, transposed to video. Corpus split is q144's
    * doc_id % [[VideoBatchMod]] ≠ [[VideoBatchResidue]] — the
    * video-family convention. `isBuilt` probes the bands path, written
    * LAST, so its _SUCCESS certifies both tables. */
  private[graft] def videoPrefixNormIndexPaths(dir: String): (String, String) = {
    val base = graft.sources.Artifacts.Warehouse + "/vid_norm_prefix_idx_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 179)
    (base + "/bands", base + "/frames")
  }

  private[graft] def videoPrefixNormIndex(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val (bPath, fPath) = videoPrefixNormIndexPaths(dir)
    if (!graft.sources.Artifacts.isBuilt(spark, bPath)) {
      val corpus = videoNormFrames(spark, dir)
        .where(pmod(col("doc_id"), lit(VideoBatchMod)) =!= VideoBatchResidue)
      corpus.write.mode("overwrite").parquet(fPath)
      corpus.where(col("si") === 0).select(
          col("doc_id"),
          posexplode(array(
            expr("hi div 65536"), expr("hi % 65536"),
            expr("lo div 65536"), expr("lo % 65536"))).as(Seq("band_idx", "band_val")))
        .groupBy(col("band_idx"), col("band_val"))
        .agg(array_sort(collect_list(col("doc_id"))).as("all_members"))
        .withColumn("members", slice(col("all_members"), 1, Dedup.MaxBucket))
        .observe("q179_index_bands",
          sum(greatest(size(col("all_members")) - Dedup.MaxBucket, lit(0))).as("overflow_members_dropped"))
        .select(col("band_idx"), col("band_val"), explode(col("members")).as("doc_id"))
        .write.mode("overwrite").parquet(bPath)
    }
    (spark.read.parquet(bPath), spark.read.parquet(fPath))
  }

  /** q179 — time-normalized INCREMENTAL video prefix containment:
    * q178's re-time-proof verdicts for a crawl increment WITHOUT
    * re-pairing the corpus — the q177 story at video level. Each batch
    * video (doc_id % [[VideoBatchMod]] = [[VideoBatchResidue]], the
    * q144 split) is decoded, header-time-base-NORMALIZED
    * ([[videoFrameHashSeqNormalized]]) and densely frame-hashed
    * map-side; its normalized frame-0 bands probe the FROZEN normalized
    * corpus index; the verify is q147's per-frame cut and direction
    * verdict over normalized frames, plus both sides' parsed time-base
    * tags for provenance. Batch videos never pair each other (q72's
    * contract), so the streaming twin
    * ([[graft.streaming.StreamingAnalytics.videoContainmentNormalizedPerBatch]])
    * reproduces this table under ANY micro-batching.
    *
    * Scale shape: q148's — batch-proportional decode+re-time+hash (the
    * re-timing is map-side integer arithmetic, O(batch frames));
    * candidate discovery is ≤4 band rows per batch video against the
    * capped frozen index; the frame verify touches only candidate
    * corpus rows; the time-base projections are one-row-per-video
    * frame-0 slices joined pair-bounded. */
  def videoPrefixIncrementalTimeNormalized(spark: SparkSession, dir: String): DataFrame =
    videoPrefixIncrementalTimeNormalizedOf(spark, dir,
      mediaTable(spark, dir)
        .where(col("meta.format") === "vid" &&
          pmod(col("doc_id"), lit(VideoBatchMod)) === VideoBatchResidue))

  /** [[videoPrefixIncrementalTimeNormalized]] over an arbitrary
    * (doc_id, payload) batch — the per-micro-batch core of the
    * streaming twin and the unit the spec drives the re-timed-increment
    * fixture through. */
  private[graft] def videoPrefixIncrementalTimeNormalizedOf(spark: SparkSession, dir: String,
      batch: DataFrame): DataFrame = {
    val (bands, frames) = videoPrefixNormIndex(spark, dir)
    // pinned: bft feeds the candidate probe, the verify side AND the
    // batch time-base projection (the q148 r15 decode-re-execution
    // advisory, one consumer more)
    val bft = videoNormFrameTableOf(batch).localCheckpoint(true)
    val cand = bft.where(col("si") === 0).select(
        col("doc_id").as("d1"),
        posexplode(array(
          expr("hi div 65536"), expr("hi % 65536"),
          expr("lo div 65536"), expr("lo % 65536"))).as(Seq("band_idx", "band_val")))
      .join(bands, Seq("band_idx", "band_val"))
      .select(col("d1"), col("doc_id").as("d2"))
      .distinct()
    // frame-0 rows as the time-base projections (fps constant per
    // stream — the q177 r17-advisory shape from day one)
    val r1 = bft.where(col("si") === 0).select(col("doc_id"), col("fps").as("f"))
    val r2 = frames.where(col("si") === 0).select(col("doc_id"), col("fps").as("f"))
    videoPrefixVerify(cand, bft, frames)
      .join(r1.select(col("doc_id").as("d1"), col("f").as("fps_1")), Seq("d1"))
      .join(r2.select(col("doc_id").as("d2"), col("f").as("fps_2")), Seq("d2"))
      .select(col("d1"), col("d2"), col("fps_1"), col("fps_2"),
        col("n_frames_1"), col("n_frames_2"), col("n_frames_aligned"),
        col("ham_total"), col("ham_max"), col("relation"))
      .orderBy("d1", "d2")
  }

  /** Typed per-video signature-key row for the incremental path. */
  case class VideoKeyRow(doc_id: Long, sig_key: String)

  /** Per-video EXACT perceptual key: the ordered sampled-frame aHash
    * sequence (plus its length) rendered canonically as
    * `"<ns>|<hi>:<lo>|<hi>:<lo>|…"`. Two videos share the key iff every
    * sampled frame's perceptual hash matches at the same temporal
    * position — the Hamming-0 point of q139's aligned-envelope verify,
    * and the video twin of q137's exact (hi, lo) image probe. String
    * form so the DuckDB oracle reproduces it with one ordered
    * string_agg. */
  private[graft] def videoSigKeysOf(fh: DataFrame): DataFrame =
    fh.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("si"), col("hi"), col("lo"))).as("fr"))
      .select(col("doc_id"),
        expr("""concat_ws('|', cast(size(fr) AS STRING),
                |  concat_ws('|', transform(array_sort(fr),
                |    x -> concat(cast(x.hi AS STRING), ':', cast(x.lo AS STRING)))))""".stripMargin)
          .as("sig_key"))

  /** Crawl-increment split residue for the VIDEO incremental path.
    * q68's convention (`doc_id % 10 = 9`) would be vacuous here: the
    * generator's only video exact classes sit at Δ doc_id = 3840 ≡ 0
    * (mod 10), so batch and corpus copies of one video always land on
    * the SAME side of a mod-10 split and the probe could never observe
    * a dup at any SF. Mod 7 (3840 ≡ 4) puts real cross-split copies in
    * the sf0.1 corpus — a split you can actually watch work. */
  val VideoBatchMod = 7
  val VideoBatchResidue = 1

  /** Persisted corpus video signature-key INDEX: sig_key → min doc_id
    * over the corpus split's videos — the durable state the incremental
    * video dedup probes (q137's index contract at video level). */
  private[graft] def videoSigIndex(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Artifacts.Warehouse + "/vid_sig_idx_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 144)
    if (!graft.sources.Artifacts.isBuilt(spark, path))
      videoSigKeysOf(videoFrameTable(spark, dir)
          .where(pmod(col("doc_id"), lit(VideoBatchMod)) =!= VideoBatchResidue))
        .groupBy("sig_key").agg(min("doc_id").as("dup_of"))
        .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** q144 — INCREMENTAL video dedup: the crawl-increment batch's videos
    * are decoded, per-sampled-frame hashed, folded to their exact
    * perceptual signature key ([[videoSigKeysOf]]) and probed against
    * the persisted corpus key index — an arriving video whose full
    * sampled-frame hash sequence the corpus already holds is a dup of
    * the earliest such video, everything else is new. Completes the
    * q137 (image) / q143 (text containment) incremental story for the
    * temporal modality; near-miss batches escalate to q139's banded
    * machinery offline. Batch videos never index each other (q72's
    * contract), so the streaming twin
    * ([[graft.streaming.StreamingAnalytics.videoDupVerdictsPerBatch]])
    * reproduces this table under ANY micro-batching.
    *
    * Scale shape: decode + hash + key fold are map-side per video; the
    * probe is one equi-join of the batch against a key-keyed index
    * (bucketed at 100 TB → shuffle-free); one verdict row per batch
    * video. */
  def videoIncrementalDedup(spark: SparkSession, dir: String): DataFrame =
    videoIncrementalDedupOf(spark, dir,
      mediaTable(spark, dir)
        .where(col("meta.format") === "vid" &&
          pmod(col("doc_id"), lit(VideoBatchMod)) === VideoBatchResidue))

  /** [[videoIncrementalDedup]] over an arbitrary (doc_id, payload)
    * batch — the per-micro-batch core of the streaming twin. */
  private[graft] def videoIncrementalDedupOf(spark: SparkSession, dir: String,
      batch: DataFrame): DataFrame = {
    import spark.implicits._
    val fh = batch.select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions { rows =>
        rows.flatMap { m =>
          val (nf, hs) = videoFrameHashSeq(Option(m.payload).getOrElse(Array.emptyByteArray))
          hs.iterator.zipWithIndex.map { case ((hi, lo), i) =>
            VideoFrameRow(m.doc_id, nf, hs.length.toLong, i, hi, lo)
          }
        }
      }
      .toDF()
    videoSigKeysOf(fh)
      .join(videoSigIndex(spark, dir), Seq("sig_key"), "left")
      .select(col("doc_id"), col("sig_key"),
        when(col("dup_of").isNull, "new").otherwise("dup").as("status"),
        col("dup_of"))
      .orderBy("doc_id")
  }

  /** Persisted corpus audio envelope-hash INDEX: (sig_hi, sig_lo) → min
    * doc_id over the corpus split's tracks (q68's doc_id % 10 = 9 batch
    * held out) — the durable state the incremental audio dedup probes.
    * The key is q138's 64-window equal-mass envelope hash, so the probe
    * is RESAMPLE-INVARIANT: a re-encoded or upsampled copy of one
    * recording lands on the identical key even though its byte payload
    * and sample count differ (the case q68's content digest can never
    * catch — spec-pinned through the real WAV kernel). */
  private[graft] def audioSigIndex(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Artifacts.Warehouse + "/aud_sig_idx_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 145)
    if (!graft.sources.Artifacts.isBuilt(spark, path))
      audioSigTableOf(mediaTable(spark, dir)
          .where(col("meta.format") === "wav" && pmod(col("doc_id"), lit(10)) =!= 9))
        .groupBy("sig_hi", "sig_lo").agg(min("doc_id").as("dup_of"))
        .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** q145 — INCREMENTAL audio dedup: the crawl-increment batch's tracks
    * (doc_id % 10 = 9, the q68 split) decoded, envelope-hashed and
    * probed against the persisted corpus envelope index — exact-key
    * probing at the Hamming-0 point of q141's banded verify, the audio
    * member of the q137/q143/q144 incremental family. Near-miss batches
    * escalate to q141's banded machinery offline. Batch tracks never
    * index each other (q72's contract) — the streaming twin
    * ([[graft.streaming.StreamingAnalytics.audioDupVerdictsPerBatch]])
    * reproduces this table under ANY micro-batching.
    *
    * Scale shape: decode + envelope fold are map-side; one equi-join of
    * the batch against the hash-keyed index; one verdict row per batch
    * track. */
  def audioIncrementalDedup(spark: SparkSession, dir: String): DataFrame =
    audioIncrementalDedupOf(spark, dir,
      mediaTable(spark, dir)
        .where(col("meta.format") === "wav" && pmod(col("doc_id"), lit(10)) === 9))

  /** [[audioIncrementalDedup]] over an arbitrary (doc_id, payload)
    * batch — the per-micro-batch core of the streaming twin. */
  private[graft] def audioIncrementalDedupOf(spark: SparkSession, dir: String,
      batch: DataFrame): DataFrame =
    audioSigTableOf(batch)
      .select(col("doc_id"), col("sig_hi"), col("sig_lo"))
      .join(audioSigIndex(spark, dir), Seq("sig_hi", "sig_lo"), "left")
      .select(col("doc_id"), col("sig_hi"), col("sig_lo"),
        when(col("dup_of").isNull, "new").otherwise("dup").as("status"),
        col("dup_of"))
      .orderBy("doc_id")

  /** q140 — video DUP CLUSTERS + survivor selection: q139's verified
    * near-pairs folded into connected components (the q61 large-star/
    * small-star contraction) and reduced to the keep-list under the
    * policy a video corpus wants: keep the LONGEST copy (most total
    * frames — the least-truncated capture; ties → smallest doc_id),
    * with member count and the frame mass the dedup removes. Mirrors
    * q133 shape-for-shape (pair plan + O(log n) contraction + one
    * metadata-keyed join + one comp-keyed argmax). Pairs come from the
    * persisted artifact ([[videoPairsTable]], r14), which carries both
    * sides' parsed frame counts — the cluster pass touches no payload
    * bytes. */
  def videoDupClusters(spark: SparkSession, dir: String): DataFrame = {
    val p = videoPairsTable(spark, dir)
    val lengths = p.select(col("d1").as("doc_id"), col("nf1").as("nf"))
      .union(p.select(col("d2").as("doc_id"), col("nf2").as("nf")))
      .groupBy("doc_id").agg(max("nf").as("nf"))
    videoClusterReport(
      pairLabelsTable(spark, dir, "vid", 140)(p.select(col("d1"), col("d2"))), lengths)
  }

  /** [[videoDupClusters]] over an arbitrary frame-hash table — the unit
    * the spec drives crafted fixtures through. */
  private[graft] def videoDupClustersOf(fh: DataFrame): DataFrame =
    videoClusterReport(
      liveLabels(videoNearDupOf(fh).select(col("d1"), col("d2"))),
      fh.groupBy(col("doc_id")).agg(max(col("n_frames")).as("nf")))

  /** The q140 cluster fold: longest-copy survivor argmax over the
    * cluster labels, per-cluster frame-mass bookkeeping. */
  private def videoClusterReport(labels: DataFrame, lengths: DataFrame): DataFrame = {
    labels
      .join(lengths, Seq("doc_id"))
      .groupBy("comp_id")
      .agg(count(lit(1)).as("n_members"),
        sum("nf").as("frames_total"),
        max(struct(col("nf").as("f"), (lit(0L) - col("doc_id")).as("negid"))).as("s"))
      .select(col("comp_id"), col("n_members"), col("frames_total"),
        (lit(0L) - col("s.negid")).as("survivor_doc_id"),
        col("s.f").as("survivor_frames"),
        (col("frames_total") - col("s.f")).as("frames_removed"))
      .orderBy("comp_id")
  }

  /** Energy windows in an audio fingerprint (shares the image hash
    * width so [[aHashOf]] is the one threshold-signature kernel for all
    * three modalities). */
  val AudioWindows = 64
  /** Mean |sample| below this flags a low-energy (near-silent) track. */
  val LowEnergyAbs = 1000L

  /** Typed per-track audio signature row. */
  case class AudioSigRow(doc_id: Long, n_samples: Long, sig_hi: Long, sig_lo: Long,
                         total_abs: Long, peak_abs: Long, mean_abs: Long,
                         n_clipped: Long, low_energy: Boolean, short_track: Boolean)

  /** Decode one WAV (real RIFF walk), fold |sample| mass into
    * [[AudioWindows]] equal windows, and hash the energy envelope with
    * [[aHashOf]] — bit t set iff window t carries at least the mean
    * window energy. Plus the audit stats a curation pass cuts on:
    * peak/mean |amplitude|, rail-clipped sample count, low-energy flag.
    *
    * Damaged-input contract (r13, advisory): a track with fewer samples
    * than [[AudioWindows]] used to `require`-crash the whole stage from
    * inside mapPartitions — one malformed upload killing a corpus-wide
    * pass is the wrong trade at scale. Short tracks now DEGRADE: the
    * envelope fold runs over however many windows receive mass (the
    * signature stays deterministic but undersampled) and the row carries
    * `short_track = true` so a curation pass can cut on it; an empty
    * payload yields the all-zero row with both flags set. The corpus
    * generator emits ≥ 500 samples, so gated output has short_track
    * uniformly false — pinned by the oracle's `n < 64` derivation. */
  private[graft] def audioSignature(docId: Long, payload: Array[Byte]): AudioSigRow = {
    val samples = scala.collection.mutable.ArrayBuffer.empty[Int]
    MediaCodecs.decodeWav(payload)(s => samples += math.abs(s.toInt))
    val n = samples.length
    if (n == 0)
      AudioSigRow(docId, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
        low_energy = true, short_track = true)
    else {
      val e = new Array[Long](AudioWindows)
      var total = 0L; var peak = 0L; var clipped = 0L
      var i = 0
      while (i < n) {
        val v = samples(i).toLong
        e(i * AudioWindows / n) += v
        total += v; if (v > peak) peak = v; if (v >= 32767L) clipped += 1
        i += 1
      }
      val (hi, lo) = aHashOf(e)
      val mean = total / n
      AudioSigRow(docId, n.toLong, hi, lo, total, peak, mean, clipped,
        mean < LowEnergyAbs, short_track = n < AudioWindows)
    }
  }

  /** q138 — AUDIO energy-envelope signatures: the audio member of the
    * perceptual-fingerprint trilogy (image q128, video q134). Every WAV
    * document's PCM stream is decoded from real RIFF bytes, its
    * |sample| mass folded into [[AudioWindows]] equal windows, and the
    * envelope hashed with the SAME mean-threshold kernel as the image
    * hashes — re-encoded or resampled copies of one recording collapse
    * to the same 64-bit signature, which is the dedup join key at
    * deployment. The row also carries the audit columns an audio
    * curation pass cuts on: peak and mean |amplitude|, the
    * rail-clipped sample count (distorted captures), and a low-energy
    * flag (near-silent tracks carry no training value per byte). The
    * DuckDB oracle re-derives envelope, hash, and stats from the PCM
    * generator in closed form.
    *
    * Scale shape: one typed mapPartitions decode kernel, map-side; one
    * narrow row per track; no shuffle before the contract sort. */
  def audioSignatures(spark: SparkSession, dir: String): DataFrame =
    audioSigTable(spark, dir).orderBy("doc_id")

  /** [[audioSignatures]] without the presentation sort — the form the
    * q141/q142 near-dup chain composes (their first move re-shuffles). */
  private[graft] def audioSigTable(spark: SparkSession, dir: String): DataFrame =
    audioSigTableOf(mediaTable(spark, dir).where(col("meta.format") === "wav"))

  /** The signature kernel over an arbitrary (doc_id, payload) frame —
    * shared by the corpus path, the q145 batch probe, and the streaming
    * ingest twin (the [[imageAHashesOf]] pattern). */
  private[graft] def audioSigTableOf(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media
      .select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions { rows =>
        rows.map(m => audioSignature(m.doc_id, Option(m.payload).getOrElse(Array.emptyByteArray)))
      }
      .toDF()
  }

  /** q141 — AUDIO near-dup verdicts: q128's banded-Hamming machinery
    * over q138's 64-bit energy-envelope hashes. The envelope normalizes
    * any track to [[AudioWindows]] equal-mass windows, so a re-encoded
    * or re-SAMPLED copy of one recording (different n_samples, same
    * waveform shape — the case the exact byte/content hash can never
    * catch) lands within a few envelope bits of its source; banding (4 ×
    * 16-bit, capped buckets with overflow observed) generates candidates
    * with guaranteed recall to 3 flipped bits, exact XOR-popcount ≤
    * [[ImgHammingMax]] verifies, and the verify runs BEFORE the
    * cross-band distinct (q128's trick). Output carries both track
    * lengths precisely because near-dups with DIFFERENT lengths are the
    * operator's point.
    *
    * The audio generator's waveform is doc_id-keyed with no EXACT
    * periodic class inside any test SF (the envelope offset cycle is
    * 65536 ids), so gated output at the small gate SFs is empty — pinned
    * by spec, with crafted resample/re-encode fixtures driving the
    * guaranteed verdicts through [[audioNearDupOf]] (the q139 fixture
    * pattern). At sf0.1 the corpus DOES produce verified pairs (761,
    * hash-matched against the oracle): long tracks' near-uniform
    * envelopes sit within a few bits of each other — the known aHash
    * low-contrast behavior (same kernel as images); a deployment cuts
    * low-energy/low-contrast tracks upstream, which is exactly what the
    * q138 audit columns are for.
    *
    * Scale shape: identical to q128 — map-side hashing, one 4-rows/track
    * band shuffle, capped pair expansion, never all-pairs. */
  def audioNearDup(spark: SparkSession, dir: String): DataFrame = {
    Diagnostics.install(spark)
    audioNearDupOf(audioSigTable(spark, dir)).orderBy("d1", "d2")
  }

  /** [[audioNearDup]] over an arbitrary signature table — the unit the
    * spec drives crafted fixtures through (needs doc_id, sig_hi, sig_lo,
    * n_samples). */
  private[graft] def audioNearDupOf(sigs: DataFrame): DataFrame = {
    val banded = sigs.select(
      col("doc_id"), col("sig_hi").as("hi"), col("sig_lo").as("lo"),
      col("n_samples").as("ns"),
      posexplode(array(
        expr("sig_hi div 65536"), expr("sig_hi % 65536"),
        expr("sig_lo div 65536"), expr("sig_lo % 65536"))).as(Seq("band_idx", "band_val")))
    val buckets = banded
      .groupBy(col("band_idx"), col("band_val"))
      .agg(array_sort(collect_list(
        struct(col("doc_id"), col("hi"), col("lo"), col("ns")))).as("all_members"))
      .where(size(col("all_members")) >= 2)
      .withColumn("members", slice(col("all_members"), 1, Dedup.MaxBucket))
      .observe("q141_audio_buckets",
        sum(greatest(size(col("all_members")) - Dedup.MaxBucket, lit(0))).as("overflow_members_dropped"))
    buckets
      .select(explode(expr(
        """flatten(transform(members, (x, i) ->
          |  transform(slice(members, i + 2, size(members)), y ->
          |    named_struct('d1', x.doc_id, 'hi1', x.hi, 'lo1', x.lo, 'ns1', x.ns,
          |                 'd2', y.doc_id, 'hi2', y.hi, 'lo2', y.lo, 'ns2', y.ns))))""".stripMargin)).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"),
        expr("CAST(bit_count(p.hi1 ^ p.hi2) + bit_count(p.lo1 ^ p.lo2) AS BIGINT)").as("hamming"),
        col("p.ns1").as("n_samples_1"), col("p.ns2").as("n_samples_2"))
      .where(col("hamming") <= ImgHammingMax)
      .distinct()
  }

  /** q142 — audio DUP CLUSTERS + survivor selection: q141's verified
    * near-pairs folded into connected components with the policy an
    * audio corpus wants: keep the LONGEST capture (most samples — the
    * least-truncated / highest-rate copy; ties → smallest doc_id), with
    * member count and the sample mass the dedup removes. Completes the
    * q133/q140 survivor story for the third modality, same shapes.
    * Pairs come from the persisted artifact ([[audioPairsTable]], r14);
    * member lengths come from the pairs themselves (q141's verdict rows
    * carry both track lengths, and every cluster member appears in at
    * least one pair), so the cluster pass touches no payload bytes. */
  def audioDupClusters(spark: SparkSession, dir: String): DataFrame = {
    val p = audioPairsTable(spark, dir)
    val lengths = p.select(col("d1").as("doc_id"), col("n_samples_1").as("n_samples"))
      .union(p.select(col("d2").as("doc_id"), col("n_samples_2").as("n_samples")))
      .groupBy("doc_id").agg(max("n_samples").as("n_samples"))
    audioClusterReport(
      pairLabelsTable(spark, dir, "aud", 142)(p.select(col("d1"), col("d2"))), lengths)
  }

  /** [[audioDupClusters]] over an arbitrary signature table — the
    * fixture path (no artifact for an arbitrary frame). */
  private[graft] def audioDupClustersOf(sigs: DataFrame): DataFrame =
    audioClusterReport(
      liveLabels(audioNearDupOf(sigs).select(col("d1"), col("d2"))),
      sigs.select(col("doc_id"), col("n_samples")))

  /** Star-contraction labels computed inline — the fixture path's label
    * source (no artifact for an arbitrary frame). */
  private def liveLabels(pairs: DataFrame): DataFrame = {
    val (labels, _, _) = Dedup.connectedComponents(
      pairs.toDF("src", "dst"), Dedup.MaxCcIters)
    labels.select(col("id").as("doc_id"), col("comp").as("comp_id"))
  }

  /** Persisted per-modality cluster-label tables (doc_id, comp_id) —
    * the q61 `nearDupLabels` pattern applied to the media chains: the
    * O(log n) contraction's handful of shuffle rounds is the remaining
    * per-call cost once pairs are persisted, and it too is a pure
    * function of the corpus fingerprint. Built from the persisted pair
    * artifacts; re-gated every verify run by the oracles' recursive
    * closures. */
  private def pairLabelsTable(spark: SparkSession, dir: String, prefix: String,
      salt: Int)(pairs: => DataFrame): DataFrame = {
    val path = graft.sources.Artifacts.Warehouse + s"/${prefix}_labels_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), salt)
    if (!graft.sources.Artifacts.isBuilt(spark, path))
      liveLabels(pairs).write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** The q142 cluster fold: longest-capture survivor argmax over the
    * cluster labels, per-cluster sample-mass bookkeeping. */
  private def audioClusterReport(labels: DataFrame, lengths: DataFrame): DataFrame = {
    labels
      .join(lengths, Seq("doc_id"))
      .groupBy("comp_id")
      .agg(count(lit(1)).as("n_members"),
        sum("n_samples").as("samples_total"),
        max(struct(col("n_samples").as("n"), (lit(0L) - col("doc_id")).as("negid"))).as("s"))
      .select(col("comp_id"), col("n_members"), col("samples_total"),
        (lit(0L) - col("s.negid")).as("survivor_doc_id"),
        col("s.n").as("survivor_samples"),
        (col("samples_total") - col("s.n")).as("samples_removed"))
      .orderBy("comp_id")
  }

  /** Persisted VERIFIED near-pair artifacts (r14, the round-13 verdict's
    * top task): the three dup-cluster chains (q133/q140/q142) re-ran
    * their modality's full pair generation inline per call — correct and
    * self-contained, but the q61 label-table lesson applies verbatim:
    * pair generation runs once per corpus content-fingerprint and lands
    * as a tiny survivor-pair parquet table; the cluster queries pay a
    * read plus the O(log n) contraction. The gated pair queries
    * (q128/q139/q141) stay fully live — they price the production
    * pipeline and carry the always-on overflow metrics — and every
    * DuckDB oracle re-derives the whole chain from the generator each
    * verify run, so the artifacts are re-gated, never frozen. Same
    * single-writer check-then-write contract as
    * [[graft.operators.Dedup.nearDupLabels]]. */
  private[graft] def imagePairsTable(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Artifacts.Warehouse + "/img_pairs_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 128)
    if (!graft.sources.Artifacts.isBuilt(spark, path))
      imageNearDupUnordered(spark, dir).write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** q164 — multimodal benchmark DECONTAMINATION (image leg): q65's
    * eval/train split (`(doc_id·2654435761) % 100 < 20` holds out the
    * eval slice) applied to the image corpus, with an eval image flagged
    * CONTAMINATED when the perceptual near-dup chain (q128: aHash →
    * 4×16-bit bands → capped buckets → Hamming ≤ ImgHammingMax verify)
    * links it to ANY train image — the multimodal twin of q65's text
    * n-gram decontamination, and the check a benchmark release runs
    * before trusting eval numbers (a re-encoded/rescaled copy of a
    * training image in the eval set is invisible to exact byte or hash
    * equality; the perceptual chain is what actually catches it).
    * `train_match` carries the smallest matching train doc_id for
    * provenance (−1 when clean).
    *
    * Scale shape: the pair set is the persisted verified-pair artifact
    * ([[imagePairsTable]] — banded, capped, never all-pairs); the audit
    * is a direction union + one groupBy over that bounded set, then a
    * left join against the eval slice of the image ids (a metadata
    * projection — no decode on the live path). */
  def mediaContamination(spark: SparkSession, dir: String): DataFrame = {
    def isEval(c: org.apache.spark.sql.Column) =
      pmod(c * lit(2654435761L), lit(100)) < 20
    val pairs = imagePairsTable(spark, dir).select("d1", "d2")
    val part = pairs.select(col("d1").as("e"), col("d2").as("t"))
      .union(pairs.select(col("d2").as("e"), col("d1").as("t")))
    val hits = part
      .where(isEval(col("e")) && !isEval(col("t")))
      .groupBy(col("e"))
      .agg(min(col("t")).as("tm"))
    mediaTable(spark, dir).where(col("meta.format") === "bmp")
      .select(col("doc_id")).where(isEval(col("doc_id")))
      .join(hits, col("doc_id") === col("e"), "left")
      .select(col("doc_id"),
        col("tm").isNotNull.as("contaminated"),
        coalesce(col("tm"), lit(-1L)).as("train_match"))
      .orderBy("doc_id")
  }

  /** q175 — FULL-RELEASE media decontamination (r16, verdict task 4):
    * q164's audit extended to every modality. A re-encoded training
    * VIDEO or AUDIO clip in the eval set was unchecked — q164 filters
    * `format = 'bmp'` — even though the perceptual chains to catch it
    * already existed. One row per EVAL-side media document (q65's split
    * predicate, all three modalities), flagged CONTAMINATED when ANY
    * chain links it to a train-side document:
    *   - images: the verified near-pair artifact (q128's chain);
    *   - video: q139's aligned-envelope pairs (same-length re-encodes)
    *     OR q178's TIME-NORMALIZED prefix containment (a clipped —
    *     even re-timed — eval copy of a training video, invisible to
    *     the aligned-length chain);
    *   - audio: q141's envelope pairs (resample-invariant re-encodes)
    *     OR q176's RATE-NORMALIZED prefix containment (clips the
    *     whole-track envelope renormalizes away, resampled or not).
    * The prefix legs read the NORMALIZED chains since r18 (verdict
    * task 3): the raw q147/q173 legs let a resampled or re-timed
    * eval-set copy pass the release audit that exists precisely to
    * catch it. On the all-canonical corpus the normalized and raw
    * verdict sets are identical (spec-pinned), so the swap changes the
    * contract, not the canonical result. `train_match` carries the
    * smallest matching train doc_id for provenance (−1 when clean) —
    * q164's contract, unchanged.
    *
    * Scale shape: ALL FIVE pair inputs are persisted duplicate-mass-
    * bounded artifacts — the three near-pair tables plus the two
    * prefix-verdict tables ([[videoPrefixPairsTable]] /
    * [[audioPrefixPairsTable]], built once per corpus fingerprint from
    * the q178/q176 normalized chains); the eval slice is a metadata projection of
    * the media table (no payload bytes move); the audit itself is
    * [[mediaContaminationFrom]] — a direction union + one groupBy over
    * the bounded pair set, then a left join against the eval slice. */
  def mediaContaminationFull(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Seq(
        imagePairsTable(spark, dir),
        videoPairsTable(spark, dir),
        videoPrefixPairsTable(spark, dir),
        audioPairsTable(spark, dir),
        audioPrefixPairsTable(spark, dir))
      .map(_.select(col("d1"), col("d2")))
      .reduce(_ unionByName _)
    mediaContaminationFrom(pairs,
      mediaTable(spark, dir).select(col("doc_id"), col("meta.format").as("modality")))
  }

  /** The q175 audit core over an arbitrary undirected pair set and a
    * (doc_id, modality) catalog — the unit the spec drives crafted
    * cross-split fixtures through. */
  private[graft] def mediaContaminationFrom(pairs: DataFrame,
      media: DataFrame): DataFrame = {
    def isEval(c: org.apache.spark.sql.Column) =
      pmod(c * lit(2654435761L), lit(100)) < 20
    val part = pairs.select(col("d1").as("e"), col("d2").as("t"))
      .union(pairs.select(col("d2").as("e"), col("d1").as("t")))
    val hits = part
      .where(isEval(col("e")) && !isEval(col("t")))
      .groupBy(col("e"))
      .agg(min(col("t")).as("tm"))
    media.where(isEval(col("doc_id")))
      .join(hits, col("doc_id") === col("e"), "left")
      .select(col("doc_id"), col("modality"),
        col("tm").isNotNull.as("contaminated"),
        coalesce(col("tm"), lit(-1L)).as("train_match"))
      .orderBy("doc_id")
  }

  /** [[imagePairsTable]]'s video twin, enriched at build time with both
    * sides' TOTAL frame counts (parsed, not metadata) so the cluster
    * fold needs no decode pass. */
  private[graft] def videoPairsTable(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Artifacts.Warehouse + "/vid_pairs_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 139)
    if (!graft.sources.Artifacts.isBuilt(spark, path)) {
      val fh = videoFrameTable(spark, dir)
      val nf = fh.groupBy(col("doc_id")).agg(max(col("n_frames")).as("nf"))
      videoNearDupOf(fh)
        .join(nf.select(col("doc_id").as("d1"), col("nf").as("nf1")), Seq("d1"))
        .join(nf.select(col("doc_id").as("d2"), col("nf").as("nf2")), Seq("d2"))
        .write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** [[imagePairsTable]]'s audio twin (q141's verdict rows already carry
    * both track lengths). */
  private[graft] def audioPairsTable(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Artifacts.Warehouse + "/aud_pairs_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 141)
    if (!graft.sources.Artifacts.isBuilt(spark, path))
      audioNearDupOf(audioSigTable(spark, dir)).write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** Persisted NORMALIZED containment verdicts (q178's time-normalized
    * chain) — the prefix-pair artifact the q175 audit consumes,
    * mirroring [[videoPairsTable]] for the aligned chain. Swapped from
    * the raw q147 chain in r18 (verdict task 3): the release audit
    * exists precisely to catch eval contamination, so it must read the
    * resample/re-time-proof verdicts — a re-timed eval-set copy passed
    * the raw-leg audit. On the all-canonical corpus the normalized and
    * raw verdict sets are provably identical (the q178 spec pins it),
    * so the swap is a contract fix, not a result change. q178 itself
    * stays a live recompute (banding + verify from the normalized frame
    * table) so the gated query keeps pricing the chain; downstream
    * audits read the verdicts the way a deployment would — containment
    * is derived once per corpus fingerprint, not once per audit. The
    * oracle re-derives containment from pixels every verify run, so
    * the artifact is re-gated, never trusted. */
  private[graft] def videoPrefixPairsTable(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Artifacts.Warehouse + "/vidpfx_pairs_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 1780)
    if (!graft.sources.Artifacts.isBuilt(spark, path))
      videoPrefixContainmentTimeNormalized(spark, dir).write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** [[videoPrefixPairsTable]]'s audio twin (q176's rate-normalized
    * verdicts; swapped from raw q173 in r18 for the same reason). */
  private[graft] def audioPrefixPairsTable(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Artifacts.Warehouse + "/audpfx_pairs_" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.sources.Bucketing.fingerprint(dir, Seq("documents"), 1760)
    if (!graft.sources.Artifacts.isBuilt(spark, path))
      audioPrefixContainmentNormalized(spark, dir).write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** q146 — MEDIA DEDUP MANIFEST: the per-document keep/drop verdict
    * table across ALL THREE modalities — the release artifact a
    * multimodal training job actually consumes (r13 verdict gap 2: the
    * dedup funnel and training manifest were text-only; the media
    * keep-lists existed but nothing joined survivorship into one
    * report). Every media document gets one row: its modality, its
    * near-dup cluster (NULL when unclustered), `keep` (unclustered, or
    * its cluster's survivor under that modality's policy — largest
    * image / longest video / longest audio capture, ties smallest
    * doc_id) or `drop` with `dup_of` naming the survivor to train on
    * instead.
    *
    * Scale shape: three persisted label-table reads + the (tiny)
    * survivor tables, one left join against a metadata-only projection
    * of the media table (no payload bytes move), output one narrow row
    * per media document. Modalities partition doc_id space, so the
    * union carries no key collisions. */
  def mediaDedupManifest(spark: SparkSession, dir: String): DataFrame = {
    val img = pairLabelsTable(spark, dir, "img", 133)(
        imagePairsTable(spark, dir).select(col("d1"), col("d2")))
      .join(imageDupClusters(spark, dir).select(col("comp_id"), col("survivor_doc_id")),
        Seq("comp_id"))
    val vid = pairLabelsTable(spark, dir, "vid", 140)(
        videoPairsTable(spark, dir).select(col("d1"), col("d2")))
      .join(videoDupClusters(spark, dir).select(col("comp_id"), col("survivor_doc_id")),
        Seq("comp_id"))
    val aud = pairLabelsTable(spark, dir, "aud", 142)(
        audioPairsTable(spark, dir).select(col("d1"), col("d2")))
      .join(audioDupClusters(spark, dir).select(col("comp_id"), col("survivor_doc_id")),
        Seq("comp_id"))
    val clustered = img.unionByName(vid).unionByName(aud)
    mediaTable(spark, dir).select(col("doc_id"), col("meta.format").as("modality"))
      .join(clustered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("modality"), col("comp_id"),
        when(col("comp_id").isNull || col("doc_id") === col("survivor_doc_id"), "keep")
          .otherwise("drop").as("verdict"),
        when(col("comp_id").isNotNull && col("doc_id") =!= col("survivor_doc_id"),
          col("survivor_doc_id")).as("dup_of"))
      .orderBy("doc_id")
  }

  /** q172 — MEDIA-AWARE leakage-safe split (r15 verdict task 4): q89
    * keeps TEXT near-dup clusters split-atomic, but an image/video/audio
    * duplicated between two documents could still place them on opposite
    * sides of train/eval — cross-modal leakage the q146 manifest sees
    * but the split rule ignored. This folds the media cluster labels
    * (q133/q140/q142) into the split: ONE connected-components pass over
    * the union of the four label tables' (doc_id → comp root) edges
    * merges every text and media component that shares a document, and
    * the unified root drives q89's hash rule unchanged (unclustered docs
    * keep q82's content-digest fallback).
    *
    * Label edges connect exactly the same vertices as each modality's
    * raw pair graph (labels ARE that graph's components), so CC over the
    * unioned label edges equals CC over the unioned pair graphs — the
    * form the oracle recomputes from raw text/bytes.
    *
    * Scale shape: every input is a persisted duplicate-mass-bounded
    * label table, NOT the corpus; the union graph folds in one
    * mapPartitions union-find task under [[Dedup.SmallGraphEdgeCap]]
    * (star contraction above it); the corpus is touched once, by the
    * final split join. */
  def mediaSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val text = Dedup.nearDupLabels(spark, dir)
    val img = pairLabelsTable(spark, dir, "img", 133)(
      imagePairsTable(spark, dir).select(col("d1"), col("d2")))
    val vid = pairLabelsTable(spark, dir, "vid", 140)(
      videoPairsTable(spark, dir).select(col("d1"), col("d2")))
    val aud = pairLabelsTable(spark, dir, "aud", 142)(
      audioPairsTable(spark, dir).select(col("d1"), col("d2")))
    val edges = Seq(text, img, vid, aud)
      .map(_.select(col("doc_id"), col("comp_id")))
      .reduce(_ unionByName _)
      .where(col("doc_id") =!= col("comp_id"))
      .select(greatest(col("doc_id"), col("comp_id")).as("src"),
        least(col("doc_id"), col("comp_id")).as("dst"))
      .distinct().localCheckpoint(true)
    val unified =
      (if (edges.count() <= Dedup.SmallGraphEdgeCap) Dedup.ccSingleTask(edges)
       else Dedup.connectedComponents(edges, Dedup.MaxCcIters)._1)
        .select(col("id").as("doc_id"), col("comp").as("comp_id"))
    Dedup.clusterSplitFrom(spark, dir, unified)
  }

  def imageDupClusters(spark: SparkSession, dir: String): DataFrame = {
    val labels = pairLabelsTable(spark, dir, "img", 133)(
      imagePairsTable(spark, dir).select(col("d1"), col("d2")))
    val areas = mediaTable(spark, dir)
      .where(col("meta.format") === "bmp")
      .select(col("doc_id"),
        (col("meta.width").cast("long") * col("meta.height")).as("area"))
    labels
      .join(areas, Seq("doc_id"))
      .groupBy("comp_id")
      .agg(count(lit(1)).as("n_members"),
        sum("area").as("total_area"),
        max(struct(col("area").as("a"), (lit(0L) - col("doc_id")).as("negid"))).as("s"))
      .select(col("comp_id"), col("n_members"), col("total_area"),
        (lit(0L) - col("s.negid")).as("survivor_doc_id"),
        col("s.a").as("survivor_area"),
        (col("total_area") - col("s.a")).as("area_removed"))
      .orderBy("comp_id")
  }
}

/** Codec-free encoders/decoders: every format here is header + raw
  * samples, decodable with pure byte arithmetic. Encoders emit
  * spec-conformant files; decoders validate magic numbers and header
  * invariants and throw IllegalArgumentException on malformed input
  * (the binary analog of the CLF dead-letter discipline). */
object MediaCodecs {

  /** Classify a payload from its magic bytes: BM → bmp, RIFF/WAVE → wav,
    * P6 → vid (a PPM stream; single images use BMP in this pipeline). */
  def sniff(b: Array[Byte]): String =
    if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 12 && ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "WAVE") "wav"
    else if (b.length >= 2 && b(0) == 'P' && b(1) == '6') "vid"
    else "unknown"

  private def ascii(b: Array[Byte], off: Int, len: Int): String =
    new String(b, off, len, java.nio.charset.StandardCharsets.US_ASCII)
  @inline private def u8(b: Byte): Int = b & 0xFF
  private def readLE16(b: Array[Byte], off: Int): Int = u8(b(off)) | (u8(b(off + 1)) << 8)
  private def readLE32(b: Array[Byte], off: Int): Int =
    u8(b(off)) | (u8(b(off + 1)) << 8) | (u8(b(off + 2)) << 16) | (u8(b(off + 3)) << 24)
  private def writeLE16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
  }
  private def writeLE32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }
  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)
  private def check(cond: Boolean, msg: => String): Unit = if (!cond) fail(msg)

  /** BMP row stride: w·3 bytes rounded up to a 4-byte boundary. */
  def bmpStride(w: Int): Int = (w * 3 + 3) / 4 * 4
  /** Total encoded BMP size for a w×h 24-bpp image. */
  def bmpSize(w: Int, h: Int): Int = 54 + bmpStride(w) * h

  /** Encode a 24-bpp bottom-up BMP. `rgb(i)` gives the byte at logical
    * top-down row-major RGB flat index i ∈ [0, w·h·3). */
  def encodeBmp(w: Int, h: Int, rgb: Int => Int): Array[Byte] = {
    val stride = bmpStride(w)
    val out = new Array[Byte](bmpSize(w, h))
    out(0) = 'B'; out(1) = 'M'
    writeLE32(out, 2, out.length)           // file size
    writeLE32(out, 10, 54)                  // pixel-data offset
    writeLE32(out, 14, 40)                  // BITMAPINFOHEADER size
    writeLE32(out, 18, w)
    writeLE32(out, 22, h)                   // positive height = bottom-up
    writeLE16(out, 26, 1)                   // planes
    writeLE16(out, 28, 24)                  // bits per pixel
    writeLE32(out, 30, 0)                   // BI_RGB (uncompressed)
    writeLE32(out, 34, stride * h)          // image size
    writeLE32(out, 38, 2835); writeLE32(out, 42, 2835) // 72 dpi
    var fy = 0
    while (fy < h) {
      val y = h - 1 - fy                    // file rows are bottom-up
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3             // logical RGB index
        val pos = 54 + fy * stride + x * 3  // file stores BGR
        out(pos) = rgb(i + 2).toByte
        out(pos + 1) = rgb(i + 1).toByte
        out(pos + 2) = rgb(i).toByte
        x += 1
      }
      fy += 1                               // padding bytes stay zero
    }
    out
  }

  /** Parse a 24-bpp BMP and emit the logical top-down RGB value stream
    * (each value 0–255) in order — un-padding rows, flipping the
    * bottom-up layout and un-swizzling BGR. */
  /** Parsed (width, height) of a BMP payload (validated magic/header). */
  def bmpDims(b: Array[Byte]): (Int, Int) = {
    check(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "BMP: bad magic/short header")
    (readLE32(b, 18), readLE32(b, 22))
  }

  def decodeBmp(b: Array[Byte])(emit: Int => Unit): Unit = {
    check(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "BMP: bad magic/short header")
    val off = readLE32(b, 10)
    check(readLE32(b, 14) == 40, "BMP: expected BITMAPINFOHEADER")
    val w = readLE32(b, 18); val h = readLE32(b, 22)
    check(w > 0 && h > 0, s"BMP: bad dims ${w}x$h")
    check(readLE16(b, 26) == 1, "BMP: planes != 1")
    check(readLE16(b, 28) == 24, "BMP: not 24-bpp")
    check(readLE32(b, 30) == 0, "BMP: compressed")
    val stride = bmpStride(w)
    check(b.length >= off + stride * h, "BMP: truncated pixel data")
    var y = 0
    while (y < h) {
      val rowPos = off + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val pos = rowPos + x * 3
        emit(u8(b(pos + 2))); emit(u8(b(pos + 1))); emit(u8(b(pos))) // BGR → R,G,B
        x += 1
      }
      y += 1
    }
  }

  /** Total encoded WAV size for n mono 16-bit samples. */
  def wavSize(n: Int): Int = 44 + 2 * n

  /** Encode mono 16-bit PCM into a canonical RIFF/WAVE file. The
    * generator always writes the 8 kHz default; the `rate` parameter
    * exists for crafted resampled-copy fixtures (q176's spec). */
  def encodeWav(samples: Array[Short], rate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    writeLE32(out, 4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    writeLE32(out, 16, 16)                  // fmt chunk size
    writeLE16(out, 20, 1)                   // PCM
    writeLE16(out, 22, 1)                   // mono
    writeLE32(out, 24, rate)                // sample rate
    writeLE32(out, 28, rate * 2)            // byte rate
    writeLE16(out, 32, 2)                   // block align
    writeLE16(out, 34, 16)                  // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    writeLE32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) { writeLE16(out, 44 + i * 2, samples(i) & 0xFFFF); i += 1 }
    out
  }

  /** Parse the sample rate out of a RIFF/WAVE `fmt ` chunk (same walk
    * and validation as [[decodeWav]], stopping at fmt). The rate is the
    * one header field the decode path doesn't consume — window signing
    * is sample-indexed — so the rate-normalization stage (q176) reads
    * it explicitly. */
  def wavSampleRate(b: Array[Byte]): Int = {
    check(b.length >= 44 && ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "WAVE",
      "WAV: bad RIFF/WAVE header")
    var pos = 12
    while (pos + 8 <= b.length) {
      val id = ascii(b, pos, 4)
      val size = readLE32(b, pos + 4)
      check(size >= 0 && pos + 8 + size <= b.length, s"WAV: chunk '$id' overruns payload")
      if (id == "fmt ") {
        check(size >= 16, "WAV: short fmt chunk")
        val rate = readLE32(b, pos + 12)
        check(rate > 0, "WAV: non-positive sample rate")
        return rate
      }
      pos += 8 + size + (size & 1)
    }
    fail("WAV: no fmt chunk")
  }

  /** Walk a RIFF/WAVE container chunk-by-chunk (word-aligned, unknown
    * chunks skipped), validate `fmt ` as PCM mono 16-bit, and emit the
    * signed samples of the `data` chunk in order. */
  def decodeWav(b: Array[Byte])(emit: Short => Unit): Unit = {
    check(b.length >= 44 && ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "WAVE",
      "WAV: bad RIFF/WAVE header")
    var pos = 12
    var fmtSeen = false
    var dataSeen = false
    while (pos + 8 <= b.length && !dataSeen) {
      val id = ascii(b, pos, 4)
      val size = readLE32(b, pos + 4)
      check(size >= 0 && pos + 8 + size <= b.length, s"WAV: chunk '$id' overruns payload")
      id match {
        case "fmt " =>
          check(size >= 16, "WAV: short fmt chunk")
          check(readLE16(b, pos + 8) == 1, "WAV: not PCM")
          check(readLE16(b, pos + 10) == 1, "WAV: not mono")
          check(readLE16(b, pos + 22) == 16, "WAV: not 16-bit")
          fmtSeen = true
        case "data" =>
          check(fmtSeen, "WAV: data chunk before fmt")
          check(size % 2 == 0, "WAV: odd data size for 16-bit samples")
          var i = 0
          while (i < size / 2) { emit(readLE16(b, pos + 8 + i * 2).toShort); i += 1 }
          dataSeen = true
        case _ => // skip unknown chunk
      }
      pos += 8 + size + (size & 1)          // chunks are word-aligned
    }
    check(dataSeen, "WAV: no data chunk")
  }

  /** Encoded size of one P6 frame header ("P6\n{w} {h}\n255\n"). */
  def ppmHeaderSize(w: Int, h: Int): Int = 9 + w.toString.length + h.toString.length
  /** Total encoded size of an n-frame P6 stream. */
  def ppmStreamSize(w: Int, h: Int, nFrames: Int): Int =
    nFrames * (ppmHeaderSize(w, h) + w * h * 3)

  /** Encode nFrames concatenated binary PPM (P6) frames — the
    * image2pipe stream layout. `value(f, i)` gives frame f's byte at
    * flat index i ∈ [0, w·h·3). */
  def encodePpmStream(w: Int, h: Int, nFrames: Int, value: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(ppmStreamSize(w, h, nFrames))
    var f = 0
    while (f < nFrames) {
      out.write(s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      var i = 0
      while (i < w * h * 3) { out.write(value(f, i)); i += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** [[encodePpmStream]] carrying a TIME-BASE tag: every frame header
    * gets a `# fps=<n>` comment (netpbm comments are legal between
    * header tokens). The generator never tags (canonical untagged
    * streams keep the corpus byte-identical); this overload exists for
    * crafted re-timed fixtures — the [[encodeWav]] `rate` parameter
    * pattern for video (q178's spec). */
  def encodePpmStream(w: Int, h: Int, nFrames: Int, fps: Int,
      value: (Int, Int) => Int): Array[Byte] = {
    check(fps > 0, "PPM: non-positive fps tag")
    val out = new java.io.ByteArrayOutputStream(ppmStreamSize(w, h, nFrames))
    var f = 0
    while (f < nFrames) {
      out.write(s"P6\n# fps=$fps\n$w $h\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      var i = 0
      while (i < w * h * 3) { out.write(value(f, i)); i += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** Skip PPM header whitespace AND `#` comment lines (legal anywhere
    * between header tokens per the netpbm format; the generator never
    * writes them — they carry the optional q178 time-base tag in
    * crafted re-timed fixtures). Returns the new position. */
  private def skipPpmSpace(b: Array[Byte], start: Int): Int = {
    var pos = start
    var moved = true
    while (moved) {
      moved = false
      while (pos < b.length && (b(pos) == ' ' || b(pos) == '\n' || b(pos) == '\t' || b(pos) == '\r')) {
        pos += 1; moved = true
      }
      if (pos < b.length && b(pos) == '#') {
        while (pos < b.length && b(pos) != '\n') pos += 1
        moved = true
      }
    }
    pos
  }

  /** Parsed (width, height) of a P6 stream's first frame header
    * (validated magic; all frames share dims — enforced by the full
    * decoder's per-frame check). */
  def ppmDims(b: Array[Byte]): (Int, Int) = {
    check(b.length >= 2 && b(0) == 'P' && b(1) == '6', "PPM: bad magic")
    var pos = 2
    def parseInt(): Int = {
      pos = skipPpmSpace(b, pos)
      check(pos < b.length && b(pos) >= '0' && b(pos) <= '9', "PPM: expected integer in header")
      var v = 0
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') { v = v * 10 + (b(pos) - '0'); pos += 1 }
      v
    }
    val w = parseInt(); val h = parseInt()
    check(w > 0 && h > 0, s"PPM: bad dims ${w}x$h")
    (w, h)
  }

  /** Largest legal `# fps=` tag value. PPM headers are attacker-shaped
    * input (crafted payloads reach this parser before any split gate),
    * so the tag is bounded like every other header field: a saner-than-
    * any-camera 1000 fps cap turns both an overlong digit run (which
    * would overflow `toInt` into a raw NumberFormatException) and an
    * absurd rate (which would normalize every stream to zero frames)
    * into the parser family's validated `check` error. */
  val MaxPpmFps = 1000

  /** Parse the TIME-BASE tag out of a P6 stream's first frame header:
    * an optional `# fps=<n>` comment between ANY of the header tokens
    * (netpbm comments are legal at every inter-token position, and
    * [[skipPpmSpace]] accepts them there — the tag parse scans the same
    * positions: magic→width, width→height, height→maxval). The one
    * field the frame walk doesn't consume — the q178/q179
    * time-normalization stages read it explicitly, the q176
    * [[wavSampleRate]] pattern for video. Absent tag → `default` (the
    * canonical rate; the generator writes untagged streams). Tag value
    * is bounded by [[MaxPpmFps]] (validated error, not overflow). */
  def ppmFrameRate(b: Array[Byte], default: Int): Int = {
    check(b.length >= 2 && b(0) == 'P' && b(1) == '6', "PPM: bad magic")
    var pos = 2
    var found = -1
    // the first frame header has three inter-token gaps that can carry
    // comments (before width, height, maxval); scan them all
    var gap = 0
    while (gap < 3) {
      var moved = true
      while (moved) {
        moved = false
        while (pos < b.length && (b(pos) == ' ' || b(pos) == '\n' || b(pos) == '\t' || b(pos) == '\r')) {
          pos += 1; moved = true
        }
        if (pos < b.length && b(pos) == '#') {
          val eol = { var e = pos; while (e < b.length && b(e) != '\n') e += 1; e }
          if (found < 0) {
            val m = "fps=([0-9]+)".r.findFirstMatchIn(ascii(b, pos, eol - pos))
            m.foreach { g =>
              val digits = g.group(1)
              check(digits.length <= 4 && digits.toInt > 0 && digits.toInt <= MaxPpmFps,
                s"PPM: fps tag out of range (1..$MaxPpmFps)")
              found = digits.toInt
            }
          }
          pos = eol; moved = true
        }
      }
      // consume the token this gap precedes (digits of w/h/maxval)
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') pos += 1
      gap += 1
    }
    if (found > 0) found else default
  }

  /** Pass-1 header walk of a concatenated P6 stream: validates every
    * frame header (shared dims, maxval 255, complete pixel data) and
    * returns (w, h, per-frame pixel-data offsets). The single parser
    * behind [[decodePpmStreamSampled]] and [[ppmFrameCount]] —
    * layout-derived, never metadata-trusted. */
  private def ppmFrameOffsets(b: Array[Byte]): (Int, Int, Array[Int]) = {
    var pos = 0
    var dims: (Int, Int) = null
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (pos < b.length) {
      check(pos + 2 <= b.length && b(pos) == 'P' && b(pos + 1) == '6', "PPM: bad magic")
      pos += 2
      def parseInt(): Int = {
        pos = skipPpmSpace(b, pos)
        check(pos < b.length && b(pos) >= '0' && b(pos) <= '9', "PPM: expected integer in header")
        var v = 0
        while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') { v = v * 10 + (b(pos) - '0'); pos += 1 }
        v
      }
      val w = parseInt(); val h = parseInt(); val maxVal = parseInt()
      pos += 1                              // single whitespace after maxval
      check(maxVal == 255, s"PPM: unsupported maxval $maxVal")
      check(w > 0 && h > 0, s"PPM: bad dims ${w}x$h")
      if (dims == null) dims = (w, h)
      else check(dims == ((w, h)), "PPM: frame dims differ within stream")
      check(pos + w * h * 3 <= b.length, "PPM: truncated frame data")
      offsets += pos
      pos += w * h * 3
    }
    check(offsets.nonEmpty, "PPM: empty stream")
    (dims._1, dims._2, offsets.toArray)
  }

  /** Total frame count of a P6 stream, from the validated header walk
    * (NOT size arithmetic — a crafted stream with header comments has
    * non-uniform header sizes). */
  def ppmFrameCount(b: Array[Byte]): Int = ppmFrameOffsets(b)._3.length

  /** Parse a concatenated P6 stream: discover the frame count from the
    * stream itself, sample k evenly spaced frames via
    * [[Multimodal.frameOffsets]], and emit their pixel bytes in frame
    * order. Returns the number of frames sampled. */
  def decodePpmStreamSampled(b: Array[Byte], k: Int)(emit: Int => Unit): Int =
    decodePpmStreamSampledCounted(b, k)(emit)._1

  /** [[decodePpmStreamSampled]] also reporting the TOTAL frame count
    * from the same validated header walk — (sampled, total). The decode
    * kernels need both, and walking every frame header twice per video
    * (once for the pixel pass, once for [[ppmFrameCount]]) was a
    * redundant hot-path scan (r17 advisory). */
  def decodePpmStreamSampledCounted(b: Array[Byte], k: Int)(emit: Int => Unit): (Int, Int) = {
    val (w, h, offsets) = ppmFrameOffsets(b)
    val sampled = Multimodal.frameOffsets(offsets.length, k)
    sampled.foreach { f =>
      val base = offsets(f)
      var i = 0
      while (i < w * h * 3) { emit(u8(b(base + i))); i += 1 }
    }
    (sampled.length, offsets.length)
  }
}
