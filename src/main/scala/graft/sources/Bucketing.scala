package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Det

/** Bucketed-table storage layout — the lever a 100 TB deployment uses to
  * make its biggest recurring join shuffle-free.
  *
  * `bucketBy(k, key)` + `sortBy(key)` at write time hash-partitions every
  * file by the join key; two tables bucketed the same way co-locate
  * matching keys in matching buckets, so a later equi-join on that key
  * reads both sides already hash-distributed — Catalyst's
  * EnsureRequirements inserts NO Exchange, and with one sorted file per
  * bucket the sort-merge join skips its sorts too. At 100 TB, paying the
  * one-time bucketed write turns every subsequent fact⋈fact join from a
  * full two-sided shuffle into a local merge.
  *
  * The reference engine has no storage layout control at all (its one
  * source is a text file — reference StreamingJob.scala:85); this is the
  * Spark-native capability its users graduate to.
  */
object Bucketing {

  /** Target on-disk bytes per bucket. A bucketed scan runs ONE task per
    * bucket, so the bucket count is the join's parallelism ceiling — size
    * it from the data, not a constant (the round-2 fixed 8 left 24 of 32
    * local cores idle and showed 11× time at 8× data). */
  val TargetBucketBytes: Long = 256L * 1024 * 1024

  /** Buckets for a source dir: the bigger join side (lineitem) divided
    * into [[TargetBucketBytes]] buckets, floored at the cluster's core
    * count so small inputs still use every core. At 100 TB of lineitem
    * this yields ~400k buckets — fine for parquet (one file per bucket)
    * and exactly the task granularity a 1000-executor scan wants. */
  def numBucketsFor(spark: SparkSession, dir: String): Int = {
    val bytes = sourceFiles(dir, Seq("lineitem")).map(_.length).sum
    val cores = spark.sparkContext.defaultParallelism
    math.max(cores, math.ceil(bytes.toDouble / TargetBucketBytes).toInt)
  }

  private val Warehouse = Artifacts.Warehouse
  private val Db = "graft_bucketed"

  private[graft] def sourceFiles(dir: String, tables: Seq[String]): Seq[java.io.File] =
    tables.flatMap { t =>
      val f = new java.io.File(s"$dir/$t.parquet")
      if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName) else Seq(f)
    }

  /** Content fingerprint of the source tables (name+size+mtime of every
    * file, plus the bucket count): baked into the warehouse table name so
    * (a) distinct source dirs can never collide after sanitization
    * ('sf0.1' vs 'sf0_1') and (b) in-place source changes or a different
    * bucket sizing invalidate the cached copies instead of silently
    * serving stale rows. */
  private[graft] def fingerprint(dir: String, tables: Seq[String], numBuckets: Int): String = {
    val sig = sourceFiles(dir, tables)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|") + s"|b=$numBuckets"
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
  }

  private def tname(base: String, dir: String, fp: String): String =
    s"$Db.${base}_b_" + dir.replaceAll("[^A-Za-z0-9]", "_") + s"_$fp"

  /** One-time (per session + source dir) bucketed copies of orders and
    * lineitem, bucketed and sorted by their order key. `repartition` on
    * the bucket key first so each bucket is a single sorted file — the
    * layout that lets the join skip both Exchange AND Sort.
    *
    * The in-memory session catalog forgets tables between JVMs while
    * their files persist under the warehouse; a fresh session clears the
    * stale location and rewrites (the write is deterministic, so this is
    * a cache rebuild, not a semantic change). */
  def ensureBucketed(spark: SparkSession, dir: String): (String, String) = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $Db LOCATION '$Warehouse'")
    val numBuckets = numBucketsFor(spark, dir)
    val fp = fingerprint(dir, Seq("orders", "lineitem"), numBuckets)
    val o = tname("orders", dir, fp)
    val l = tname("lineitem", dir, fp)
    def write(table: String, df: => org.apache.spark.sql.DataFrame, key: String): Unit =
      if (!spark.catalog.tableExists(table)) {
        Artifacts.deleteIfExists(spark, s"$Warehouse/${table.stripPrefix(s"$Db.")}")
        df.repartition(numBuckets, col(key))
          .write.mode("overwrite").format("parquet")
          .bucketBy(numBuckets, key).sortBy(key)
          .saveAsTable(table)
      }
    write(o, Tables.orders(spark, dir), "o_orderkey")
    write(l, Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_quantity"), "l_orderkey")
    (o, l)
  }

  /** Per-order revenue via the shuffle-free bucketed join: both scans
    * report HashPartitioning(orderkey, NumBuckets), the merge-hinted join
    * consumes them in place, and the groupBy on the same key reuses the
    * partitioning — no `Exchange hashpartitioning` anywhere in the plan
    * (the only exchange is the range partitioning of the final ORDER BY).
    * The merge hint pins sort-merge so a small test-scale orders side
    * can't be broadcast, which would hide the layout win being shown. */
  def bucketedOrderRevenue(spark: SparkSession, dir: String): DataFrame = {
    val (o, l) = ensureBucketed(spark, dir)
    val orders = spark.table(o)
    val line = spark.table(l)
    line.hint("merge")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        Det.dsum(col("l_extendedprice")).as("revenue"),
        Det.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderkey")
  }
}
