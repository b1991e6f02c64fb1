package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.{MinHashSig, Simhash64}
import graft.sources.Tables

/** Deduplication operators over `documents` — the core of a training-data
  * pipeline at 100 TB.
  *
  * Three tiers, by cost:
  *  1. exact (hash groupBy) — one shuffle on a 16-byte digest;
  *  2. exact n-gram Jaccard via an inverted shingle index — shuffles
  *     (doc, shingle) pairs, never materializes the O(n²) pair space
  *     beyond docs that actually share a shingle;
  *  3. MinHash + LSH banding — fixed-size signatures (64 longs/doc)
  *     regardless of document length; candidate pairs come from band
  *     buckets, then are verified on the signature. This is the 100 TB
  *     path: shuffle volume is O(n · bands), not O(n · shingles).
  */
object Dedup {

  /** Exact dedup on whitespace-normalized content hash. Keeps min doc_id
    * as the canonical representative (deterministic, unlike
    * dropDuplicates). */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("text_md5"))
      .agg(
        min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"))
      .orderBy("text_md5")

  /** Word-3-gram shingles per document (with duplicates). */
  private def rawShingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), "\\s+").as("tks"))
      .where(size(col("tks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tks)-3), i -> concat_ws(' ', tks[i], tks[i+1], tks[i+2]))")).as("sh"))

  /** Distinct word-3-gram shingles per document (set semantics for the
    * inverted-index Jaccard join). */
  private def shingles(spark: SparkSession, dir: String): DataFrame =
    rawShingles(spark, dir).distinct()

  /** Exact n-gram Jaccard near-dup pairs (threshold 0.6) via inverted
    * index self-join: only docs sharing at least one shingle ever meet. */
  def nearDupJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"),
        (col("inter").cast("double") / (col("s1.n_sh") + col("s2.n_sh") - col("inter"))).as("j"))
      .where(col("j") >= 0.6)
      .select(col("d1"), col("d2"), round(col("j"), 6).as("jaccard"))
      .orderBy("d1", "d2")
  }

  /** MinHash parameters: 64 permutations h_i(x) = a_i*x + b_i over
    * 32-bit-reduced xxhash64 shingle hashes, banded 16×4 for LSH.
    * a_i < 2^30 and x < 2^32 keep every product under 2^62 — no long
    * overflow, so the math is safe under Spark 4's default ANSI mode.
    * Constants come from a fixed LCG: reproducible, no runtime
    * randomness. */
  private val NumPerm = 64
  private val Bands = 16
  private val RowsPerBand = NumPerm / Bands
  /** Largest prime below 2^32 — shingle-hash reduction modulus. */
  private val P32 = 4294967291L
  private def lcgStream(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)
  private val permA: Array[Long] = lcgStream(0x12345678L).map(x => (x >>> 34) | 1L).take(NumPerm).toArray
  private val permB: Array[Long] = lcgStream(0x87654321L).map(_ >>> 34).take(NumPerm).toArray

  /** 64-long MinHash signature per doc, computed with higher-order
    * functions over the collected distinct shingle-hash set — one shuffle
    * (groupBy doc), then pure map-side array math. */
  private def signatures(spark: SparkSession, dir: String): DataFrame =
    // rawShingles: collect_set dedups per doc anyway, so the global
    // distinct() exchange the Jaccard path needs would be a wasted shuffle
    rawShingles(spark, dir)
      .select(col("doc_id"), pmod(xxhash64(col("sh")), lit(P32)).as("h"))
      .groupBy("doc_id")
      .agg(collect_set(col("h")).as("hs"))
      // native tight-loop expression; same a*x+b arithmetic as the HOF
      // formulation, ~64x fewer interpreted lambda dispatches
      .select(col("doc_id"),
        ColumnBridge.of(MinHashSig(ColumnBridge.expr(col("hs")), permA.toSeq, permB.toSeq)).as("sig"))

  /** MinHash-LSH candidate pairs with signature-estimated Jaccard.
    * Bands hashed with a polynomial fold; docs sharing any band bucket
    * become candidates; estimate = matching signature positions / 64.
    * Not SQL-expressible in the oracle (xxhash64) — rows-only check;
    * ScalaTest asserts recall against [[nearDupJaccard]]. */
  def minhashLshPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = signatures(spark, dir)
    val banded = sig.select(col("doc_id"), col("sig"),
      posexplode(expr(
        s"transform(sequence(0, ${Bands - 1}), b -> aggregate(slice(sig, b*$RowsPerBand + 1, $RowsPerBand), 0L, (acc, x) -> (acc * 1000003L + pmod(x, 1000000007L)) % 1000000007L))"
      )).as(Seq("band_idx", "band_key")))
    // bucket-local pair expansion instead of a self-join: the signature
    // pipeline runs ONCE, one shuffle on the band key, and the O(k²) pair
    // blow-up stays confined to each bucket's member list (the property
    // that makes LSH viable at 100 TB). array_sort orders members by
    // doc_id, so emitted pairs are canonically d1 < d2.
    val buckets = banded
      .groupBy(col("band_idx"), col("band_key"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("sig")))).as("members"))
      .where(size(col("members")) >= 2)
    buckets
      .select(explode(expr(
        """flatten(transform(members, (x, i) ->
          |  transform(slice(members, i + 2, size(members)), y ->
          |    named_struct('d1', x.doc_id, 'sig1', x.sig, 'd2', y.doc_id, 'sig2', y.sig))))""".stripMargin)).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"), col("p.sig1").as("sig1"), col("p.sig2").as("sig2"))
      .distinct() // the same pair can collide in several bands
      .select(col("d1"), col("d2"),
        round(expr(s"size(filter(zip_with(sig1, sig2, (x, y) -> x = y), v -> v))").cast("double") / NumPerm, 6)
          .as("est_jaccard"))
      .where(col("est_jaccard") >= 0.5)
      .orderBy("d1", "d2")
  }

  /** Oracle-checkable MinHash: same 64 permutations, but the shingle hash
    * is the first 8 hex chars of md5 (portable to DuckDB, unlike
    * xxhash64), exploded to one row per (doc, permutation). Proves the
    * signature arithmetic cross-engine; [[minhashLshPairs]] keeps the
    * faster xxhash64 for the production path. */
  def minhashSignaturesPortable(spark: SparkSession, dir: String): DataFrame =
    shingles(spark, dir)
      .select(col("doc_id"),
        expr("CAST(conv(substr(md5(sh), 1, 8), 16, 10) AS BIGINT)").as("h"))
      .groupBy("doc_id")
      .agg(collect_set(col("h")).as("hs"))
      .select(col("doc_id"),
        ColumnBridge.of(MinHashSig(ColumnBridge.expr(col("hs")), permA.toSeq, permB.toSeq)).as("sig"))
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("pos", "sig_value")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("perm_idx"), col("sig_value"))
      .orderBy("doc_id", "perm_idx")

  /** The permutation constants, rendered as engine literals for the
    * DuckDB oracle. */
  def permALiteral: String = permA.mkString("[", ", ", "]")
  def permBLiteral: String = permB.mkString("[", ", ", "]")

  /** 64-bit SimHash per document, emitted as a 16-hex-digit string.
    *
    * Portable construction (identical arithmetic exists in the DuckDB
    * oracle): per token take md5 hex; each of the 16 hex digits carries 4
    * signature bits; a bit is 1 iff the sum over tokens of ±1 (bit set /
    * unset) is >= 0. Token multiplicity counts (true SimHash weighting).
    */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        ColumnBridge.of(Simhash64(ColumnBridge.expr(split(col("text"), "\\s+")))).as("simhash"))
      .orderBy("doc_id")

  /** Hamming-near SimHash pairs: block the 16 hex digits into 4 bands of
    * 4 digits; candidates share a band (pigeonhole: any pair within
    * Hamming distance 3 bits-per-band-boundary shares one); verify by
    * exact bit Hamming distance <= 6 of 64. */
  def simhashNearPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = simhash(spark, dir).select(col("doc_id"), col("simhash"))
    val banded = sh.select(col("doc_id"), col("simhash"),
      posexplode(expr("transform(sequence(0, 3), b -> substr(simhash, b*4 + 1, 4))")).as(Seq("band_idx", "band_val")))
    val hamming: Column = expr(
      """aggregate(sequence(1, 16), 0, (acc, p) ->
        |  acc + bit_count(
        |    (instr('0123456789abcdef', substr(h1, p, 1)) - 1) ^
        |    (instr('0123456789abcdef', substr(h2, p, 1)) - 1)))""".stripMargin)
    // bucket-local pair expansion (see minhashLshPairs): one pass over the
    // simhash pipeline, pairs canonically d1 < d2 via array_sort
    banded
      .groupBy(col("band_idx"), col("band_val"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("simhash")))).as("members"))
      .where(size(col("members")) >= 2)
      .select(explode(expr(
        """flatten(transform(members, (x, i) ->
          |  transform(slice(members, i + 2, size(members)), y ->
          |    named_struct('d1', x.doc_id, 'h1', x.simhash, 'd2', y.doc_id, 'h2', y.simhash))))""".stripMargin)).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"), col("p.h1").as("h1"), col("p.h2").as("h2"))
      .distinct()
      .select(col("d1"), col("d2"), hamming.cast("long").as("hamming"))
      .where(col("hamming") <= 6)
      .orderBy("d1", "d2")
  }
}
