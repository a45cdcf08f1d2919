package graft

/** One-shot bench-drift probe (VERDICT r5 Next #1): times
  * `dedup_clusters` at sf0.1 in two suite positions inside ONE JVM —
  * (A) immediately after the standard Bench warmup, ×3;
  * (B) after the same headline prefix Bench runs before it
  *     (q1_agg … dedup_simhash_pairs), ×2 —
  * with `-Dgraft.dedup.timers=1` so per-iteration wall time is visible.
  * If A≈B and both ≪ the BENCH number, the drift is cross-entry JVM load
  * (GC/codegen-cache pressure), not a plan or position effect.
  *
  * Run: sbt "Test/runMain graft.DriftProbe [sfDir]"
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.dedup.timers", "1")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.builder("graft-drift-probe", Sessions.cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    force("p5_completed_count") // Bench's warmup query
    println("== position A: right after warmup ==")
    (1 to 3).foreach(i => println(f"A$i dedup_clusters ${force("dedup_clusters")}%.2f s"))
    println("== position B: after the Bench prefix ==")
    val prefix = Seq("q1_agg", "q3_join", "join_broadcast_dim",
      "window_rank_dedup", "window_running_sum", "s1_keyset_scan",
      "upsert_last_writer", "o1_sort_limit", "agg_rollup",
      "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs")
    prefix.foreach(n => println(f"  prefix $n ${force(n)}%.2f s"))
    (1 to 2).foreach(i => println(f"B$i dedup_clusters ${force("dedup_clusters")}%.2f s"))
    spark.stop()
  }
}
