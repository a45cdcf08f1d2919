package graft

import org.apache.spark.sql.functions._

/** Diagnostic main (test scope, not shipped): reproduce the BpeSpec
  * cadence-1000 plan blowup and print per-round plan sizes.
  *
  * Usage: sbt "Test/runMain graft.BpeProbe [rounds] [cadence]"
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.length > 0) args(0).toInt else 10
    val cadence = if (args.length > 1) args(1).toInt else 1000
    val spark = Sessions.builder("bpe-probe", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val corpus = Seq(
      (0L, "abab ababab cdcd"), (1L, "abcd abcd dcba"), (2L, "aaabbb cdcd ab"))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val (m, v) = graft.ops.TextAnalysis.bpeTrainState(corpus, rounds,
      checkpointEvery = cadence)
    println(f"train took ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      s"merges=${m.size}")
    v.count()
    graft.ops.Dedup.releaseLocalCheckpoint(v)
    spark.stop()
  }
}
