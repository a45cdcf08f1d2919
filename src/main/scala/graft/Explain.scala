package graft

/** Dev tool: print the executed physical plan of a declared query after
  * running it (so AQE's final plan is shown, not the initial one).
  *
  * Usage: sbt "runMain graft.Explain <queryName> [sfDir]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.builder("graft-explain", Sessions.cores).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    // Execute THROUGH this QueryExecution: a noop write would build a
    // separate QueryExecution for the write command, leaving df's own
    // AdaptiveSparkPlanExec unexecuted (isFinalPlan=false — the initial
    // plan, not the promised final one).
    val qe = df.queryExecution
    qe.toRdd.foreach(_ => ())
    println(s"=== $name @ $sfDir (final plan after AQE) ===")
    println(qe.executedPlan.toString)
    spark.stop()
  }
}
