package graft
import java.nio.file.{Files, Paths}
/** Writes SparkEntry.oracleSql as oracle_sql.json WITHOUT running any
  * Spark query — the oracle map is pure data. Used by the round's
  * oracle-cost profiling (`tools/oracle_profile.py`) so DuckDB-side
  * regressions are measurable without a 20-minute Verify pass. */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/oracle_dump")
    new java.io.File(outDir).mkdirs()
    import graft.util.Fs.{jsonEscape => q}
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"wrote ${SparkEntry.oracleSql.size} oracle entries to $outDir/oracle_sql.json")
  }
}
