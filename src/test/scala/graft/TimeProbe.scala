package graft

/** Ad-hoc single-query timing probe: warms the plan shape, then times
  * the query against each given data dir twice (min reported runs are
  * what BENCH_SCALE.md's ratios use).
  *
  * Run: sbt "Test/runMain graft.TimeProbe <query> <dir1> [dir2 …]"
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val dirs = args.tail.toSeq
    val spark = Sessions.builder("graft-time-probe", Sessions.cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(dirs.head) // plan-shape warmup
    dirs.foreach { d =>
      val ts = (1 to 2).map(_ => run(d))
      println(f"$name @ $d: ${ts.map(t => f"$t%.2f").mkString(", ")} s (min ${ts.min}%.2f)")
    }
    spark.stop()
  }
}
