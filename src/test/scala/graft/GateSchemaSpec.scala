package graft

import org.apache.spark.sql.types._

/** Mechanical output-type lint over the ENTIRE gated query surface.
  *
  * Round 10 shipped the one failure mode this spec now forbids: a new
  * query family whose output carried `DECIMAL(38,0)` cells passed every
  * local replay cell-for-cell yet failed the driver's hash gate, because
  * that type's cell canonicalization is not value-stable across engines.
  * The portable set below is exactly the set every currently-green query
  * emits — integral, double, string, boolean. Anything else (decimal of
  * ANY precision, date/timestamp, array, struct, map, binary, float) has
  * never been proven through the driver's DuckDB hash compare, so a new
  * query reaching for one fails HERE, at test time, with the remedy in
  * the message — instead of rediscovering r10's red at the driver.
  *
  * Deliberately strict: if a future query legitimately needs a new type,
  * green it through the gate first, then widen the allowlist in the same
  * commit — the lint documents proven portability, not Spark capability.
  */
class GateSchemaSpec extends SparkSpec {

  /** Types every green query on the r10/r11 surface emits; the driver's
    * sorted-column value-hash is proven stable for all of them. */
  private val portable: Set[DataType] =
    Set(LongType, IntegerType, DoubleType, StringType, BooleanType)

  /** Columns of `schema` whose type is outside the proven-portable set
    * (top-level only: nested types are themselves non-portable). */
  private[graft] def nonPortable(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if !portable.contains(f.dataType) => s"${f.name}: ${f.dataType.sql}"
    }

  test("every gated query emits only driver-hash-portable column types") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val bad = nonPortable(fn(spark, sf0001).schema)
      if (bad.nonEmpty) Some(s"$name -> ${bad.mkString(", ")}") else None
    }
    assert(offenders.isEmpty,
      "gated output column type outside the proven-portable set " +
        "{BIGINT, INT, DOUBLE, STRING, BOOLEAN} — emit an exact integral/" +
        "string encoding instead (e.g. DECIMAL(38,0) -> canonical digit " +
        "string, timestamp -> epoch seconds), or gate-prove the new type " +
        s"and widen the allowlist deliberately:\n${offenders.mkString("\n")}")
  }

  test("the lint actually catches r10's failure shape (decimal, timestamp, array)") {
    val trap = StructType(Seq(
      StructField("ok_cnt", LongType),
      StructField("drift", DecimalType(38, 0)),
      StructField("seen_at", TimestampType),
      StructField("toks", ArrayType(StringType))))
    val flagged = nonPortable(trap)
    assert(flagged === Seq("drift: DECIMAL(38,0)", "seen_at: TIMESTAMP",
      "toks: ARRAY<STRING>"))
  }
}
