package graft

import org.apache.spark.sql.types._

/** Dtype lint over every ORACLE-HASHED gate's output schema.
  *
  * Round 8's only red gate (`agg_hll_distinct`) was a pure
  * schema-portability defect: its values bit-matched an independent
  * DuckDB replay, but it was the one gate in the suite emitting a
  * DECIMAL(25,0) column — wider than BIGINT's 19 digits — and the
  * driver environment renders such a decimal differently on one side
  * of its textual compare. Same family as round 7's `round(double, n)`
  * divergence (see memory: portable-rounding-contract, and
  * PortableSpec's oracle scan banning `round(`).
  *
  * This spec makes the whole CLASS unreintroducible: every query that
  * has an `oracleSql` entry (i.e. is hash-compared, not rows-only)
  * must project only dtypes proven portable across the Spark dump →
  * parquet → driver canonicalization → DuckDB replay path:
  *
  *   - VARCHAR / BOOLEAN / DATE / TIMESTAMP — textual forms agree
  *   - BYTE / SHORT / INT / BIGINT — exact integers
  *   - DECIMAL(p≤18, s) — fits a 64-bit unscaled long on both sides
  *   - DOUBLE — ONLY because every gated double is produced through
  *     `Portable.fx` quantization (PortableSpec bans bare `round(` in
  *     oracle SQL; the quantized values are exactly representable)
  *
  * Banned: FLOAT (single-precision text forms differ), DECIMAL with
  * precision > 18 (the r8 failure), BINARY (no canonical text form in
  * the compare). Arrays/structs/maps are recursed into.
  */
class GateSchemaSpec extends SparkTestBase {

  private def violations(name: String, dt: DataType, path: String): Seq[String] =
    dt match {
      case StringType | BooleanType | DateType | TimestampType |
           TimestampNTZType | ByteType | ShortType | IntegerType |
           LongType | DoubleType =>
        Nil
      case d: DecimalType if d.precision <= 18 => Nil
      case d: DecimalType =>
        Seq(s"$name.$path: DECIMAL(${d.precision},${d.scale}) wider than 18 digits " +
          "— driver environments render wide decimals divergently (r8 agg_hll_distinct)")
      case FloatType =>
        Seq(s"$name.$path: FLOAT — single-precision text forms are not portable; " +
          "cast to DOUBLE via Portable.fx or to DECIMAL")
      case BinaryType =>
        Seq(s"$name.$path: BINARY — no canonical text form in the driver compare; " +
          "emit a hex/md5 string instead")
      case ArrayType(e, _)  => violations(name, e, s"$path[]")
      case MapType(k, v, _) =>
        violations(name, k, s"$path.key") ++ violations(name, v, s"$path.value")
      case StructType(fs)   => fs.toSeq.flatMap(f => violations(name, f.dataType, s"$path.${f.name}"))
      case other =>
        Seq(s"$name.$path: unvetted dtype $other — extend GateSchemaSpec deliberately " +
          "if this type is proven portable")
    }

  for (name <- SparkEntry.oracleSql.keySet.toSeq.sorted) {
    test(s"gate $name projects only portable dtypes") {
      val df = SparkEntry.queries(name)(spark, sf)
      val bad = df.schema.fields.toSeq
        .flatMap(f => violations(name, f.dataType, f.name))
      assert(bad.isEmpty, bad.mkString("\n"))
    }
  }
}
