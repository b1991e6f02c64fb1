package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXCLUSIVE prefix sum — the primitive behind q71's
  * sequence packing (and the shape q49's day offsets use with a
  * calendar-bounded domain).
  *
  * A naive `Window.orderBy(key)` running sum executes on ONE partition —
  * the classic scale cliff. This helper buckets keys by `floor(key /
  * width)`, computes within-bucket running sums in parallel, and RECURSES
  * on the bucket totals until a level fits a single window partition:
  * 100 TB of documents is ~10¹¹ rows → 10⁸ bucket totals → 10⁵ → 10² —
  * three stacked levels, each a fully-parallel window over `width`-row
  * groups, only the last (≤ width rows) serial.
  *
  * The recursion depth comes from `estRows`, a METADATA estimate (source
  * bytes / a conservative minimum row width — no Spark job, construction
  * stays lazy). The estimate only picks the depth, never the values:
  * overestimating adds one tiny extra level (a ~`width`-row shuffle),
  * underestimating makes the terminal window serial over more than
  * `width` rows — both correct, one slightly slower. Depth is
  * O(log_width(rows)), so even a 100× estimate error moves it by < 1
  * level.
  */
object PrefixSum {

  /** Exclusive prefix sum of `tot` over rows ordered by the numeric
    * `key`: returns (`key`, `off`) where off = sum of `tot` over all
    * strictly-smaller keys. Input must have one row per key. */
  private[graft] def exclusive(df: DataFrame, key: String, tot: String,
      width: Long, estRows: Long): DataFrame = {
    require(width >= 2, s"width must be >= 2, got $width")
    if (estRows <= width) {
      // terminal: one serial window over a level that fits a partition
      df.withColumn("off", coalesce(sum(col(tot)).over(
          Window.orderBy(col(key)).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col(key), col("off"))
    } else {
      val sb: Column = floor(col(key) / width)
      // within-super-bucket EXCLUSIVE running sum — parallel across buckets
      val local = df
        .withColumn("_sb", sb)
        .withColumn("_loc", coalesce(sum(col(tot)).over(
          Window.partitionBy("_sb").orderBy(col(key))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // recurse on the (rows/width)-sized totals table
      val superOff = exclusive(
        df.groupBy(sb.as("_skey")).agg(sum(col(tot)).as("_stot")),
        "_skey", "_stot", width, estRows / width + 1)
        .withColumnRenamed("off", "_soff")
      local.join(broadcast(superOff), col("_sb") === col("_skey"))
        .select(col(key), (col("_loc") + col("_soff")).as("off"))
    }
  }
}
