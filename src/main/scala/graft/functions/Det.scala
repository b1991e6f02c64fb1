package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers shared by every oracle-checked query.
  *
  * Cross-engine (Spark vs DuckDB) float comparison is the main hazard of
  * the driver's hash-compare gate: summing doubles is order-dependent, and
  * shuffle partitioning makes the order nondeterministic. The fix used
  * throughout this engine: route every SUM through an exact decimal type
  * (order-independent), and only cast back to double at the very end.
  * IEEE scalar ops (multiply/divide/sqrt) are bit-deterministic and agree
  * between JVM and C++, so per-row arithmetic may stay in double-land.
  */
object Det {
  /** Money-ish columns (2 decimal digits in the data). */
  val D18_2: DecimalType = DecimalType(18, 2)
  /** Per-row double products (price*(1-disc)); 10 digits keeps them exact
    * enough that both engines round the same way. */
  val D28_10: DecimalType = DecimalType(28, 10)
  /** Near-exact carrier for unit-scale float math (embeddings). */
  val D38_30: DecimalType = DecimalType(38, 30)

  /** Order-independent SUM(double) -> double via exact decimal.
    *
    * The final decimal is rounded to `roundTo` digits BEFORE the double
    * cast: a decimal whose scaled integer exceeds 2^53 casts to double with
    * two roundings in DuckDB (int128→double, then /10^scale) but one in the
    * JVM — an occasional 1-ulp mismatch. Rounding first keeps the scaled
    * integer exact in a double, making the cast single-rounded everywhere. */
  def dsum(c: Column, dt: DecimalType = D18_2, roundTo: Int = 2): Column =
    round(sum(c.cast(dt)), roundTo).cast("double")

  /** Long-truncating average — the reference's integer-division mean
    * (reference StreamingJob.scala:100–106 sums Longs and divides by count). */
  def floorAvg(c: Column): Column =
    floor(sum(c.cast(D18_2)).cast("double") / count(lit(1))).cast("long")
}
