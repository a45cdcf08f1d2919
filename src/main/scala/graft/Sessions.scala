package graft

import org.apache.spark.sql.SparkSession

/** One place to construct engine SparkSessions so every entry point
  * (Verify, Bench, CLI, tests) carries identical session-scoped conf.
  *
  * `spark.sql.legacy.parquet.nanosAsLong` is set HERE, once, at build
  * time — not mutated from inside a source accessor (round-1 advice):
  * the `events` fixture stores parquet TIMESTAMP(NANOS), which Spark 4
  * only reads via this flag. It affects nanos-typed columns only, which
  * in this engine is exactly `events.ts`.
  */
object Sessions {
  def builder(appName: String, cores: Int): SparkSession.Builder = {
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // native graft expressions as SQL functions (graft_cosine, …)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // parallel table pipelines (TransferRunner) interleave fairly
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Plan STRINGS are diagnostics and must never cost heap: AQE
      // re-renders explainString on every stage completion
      // (AdaptiveSparkPlanExec.onUpdatePlan), and a deep-lineage
      // iterative frame (BPE census at a sparse checkpoint cadence, the
      // r11 image pair graph) can OOM the driver purely building that
      // string — the default cap is effectively 2 GB. 1 MB renders
      // everything a human reads and truncates the rest (measured:
      // BpeSpec's cadence-1000 property aborted the full suite's JVM
      // on exactly this allocation).
      .config("spark.sql.maxPlanStringLength", (1 << 20).toString)
      .config("spark.ui.enabled", "false")
  }

  /** Default core count: env override, else min(32, host cores). */
  def cores: Int = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
    .getOrElse(math.min(32, Runtime.getRuntime.availableProcessors()))
}
