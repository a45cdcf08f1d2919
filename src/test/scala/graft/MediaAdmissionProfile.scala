package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Throwaway stage profiler for the media admission book — times each
  * modality's decode / pairs / closure / verdict stage in isolation so
  * optimization effort lands on the measured hotspot, not a guess.
  * Run: sbt "Test/runMain graft.MediaAdmissionProfile". Not a test.
  */
object MediaAdmissionProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("media-admission-profile")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def T(n: String) = spark.read.parquet(s"$d/$n.parquet")
    def assets(gen: Long => Array[Byte], c: String) =
      T("events").select(col("event_id").cast("long")).as[Long]
        .mapPartitions(_.map(id => (id, gen(id)))).toDF("id", c)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // image
    val imgBin = assets(Multimodal.syntheticBmp, "img")
    val imgHashes = time("img: aHash decode + checkpoint") {
      Multimodal.imageAHash(imgBin, "id", "img").toDF().localCheckpoint(true)
    }
    val imgPairs = time("img: pairs") {
      val p = Multimodal.imageAHashPairs(imgHashes); p.count(); p
    }
    time("img: closure + count") {
      Multimodal.mediaNearDupClusters(imgHashes.select("id"), imgPairs).count()
    }
    time("img: exact fp + window count") {
      val fp = Multimodal.imagePixelFingerprint(imgBin, "id", "img").toDF()
      fp.select(col("id"), (col("id") === min(col("id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
        .as("keep_exact")).count()
    }

    // audio
    val audBin = assets(Multimodal.syntheticWav, "clip")
    val audFps = time("aud: fingerprint decode + checkpoint") {
      Multimodal.audioFingerprint(audBin, "id", "clip").toDF().localCheckpoint(true)
    }
    val audPairs = time("aud: pairs") {
      val p = Multimodal.audioFingerprintPairs(audFps); p.count(); p
    }
    time("aud: closure + count") {
      Multimodal.mediaNearDupClusters(audFps.select("id"), audPairs).count()
    }
    time("aud: exact fp + window count") {
      val fp = Multimodal.audioSampleFingerprint(audBin, "id", "clip").toDF()
      fp.select(col("id"), (col("id") === min(col("id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
        .as("keep_exact")).count()
    }

    // video
    val vidSigs = time("vid: phash decode + checkpoint") {
      Multimodal.videoPerceptualHash(
        assets(Multimodal.syntheticVideoMp4, "vid"), "id", "vid").toDF()
        .localCheckpoint(true)
    }
    val vidPairs = time("vid: pairs") {
      val p = Multimodal.videoPerceptualPairs(vidSigs); p.count(); p
    }
    time("vid: closure + count") {
      Multimodal.mediaNearDupClusters(vidSigs.select("id"), vidPairs).count()
    }
    time("vid: exact fp + window count") {
      val fp = Multimodal.videoFingerprint(
        assets(Multimodal.syntheticMp4, "vid"), "id", "vid").toDF()
      fp.select(col("id"), (col("id") === min(col("id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
        .as("keep_exact")).count()
    }
    spark.stop()
  }
}
