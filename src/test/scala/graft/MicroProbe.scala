package graft

import graft.ops.{Multimodal, Mp4}

/** Ad-hoc SINGLE-THREADED per-clip codec cost attribution (r18
  * optimization round, guide §1.2 step 2): times each stage of the
  * media gates' per-row work in isolation — synthetic generation,
  * container parse, pixel decode + thumb, orbit keys, resample
  * generators — so per-task-work optimizations target the measured
  * stage instead of a guess. No Spark session: this is exactly the
  * code a scan task runs per row, minus the row plumbing.
  *
  * Run: sbt "Test/runMain graft.MicroProbe [n]"
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    // per-item cost divides by the ACTUAL item count of the loop
    // (ADVICE r18: the n/7 upscale/resample loops previously divided by
    // n, under-reporting their per-item cost ~7x)
    def timeN(tag: String, items: Int)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val sink = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-30s $sec%8.3f s  ${sec * 1e6 / items}%8.2f us/item  (sink=$sink)")
    }
    def time(tag: String)(body: => Long): Unit = timeN(tag, n)(body)
    // JIT warmup on every path
    (0 until 3000).foreach { i =>
      val v = Multimodal.syntheticVideoMp4(i.toLong)
      Multimodal.videoSiOne(i.toLong, v, 4, 8, 8)
      Multimodal.videoRoOne(i.toLong, v, 4, 8, 8)
      val b = Multimodal.syntheticBmp(i.toLong)
      Multimodal.nnUpscale2x(b)
      val w = Multimodal.syntheticWavMixed(i.toLong)
      Multimodal.zohUpsample2x(w)
      ()
    }

    val vids = new Array[Array[Byte]](n)
    time("gen syntheticVideoMp4") {
      var i = 0; var s = 0L
      while (i < n) { vids(i) = Multimodal.syntheticVideoMp4(i.toLong); s += vids(i).length; i += 1 }
      s
    }
    time("Mp4.parse only") {
      var i = 0; var s = 0L
      while (i < n) { s += Mp4.parse(vids(i)).samples.length; i += 1 }
      s
    }
    time("videoSiOne (parse+dec+thumb)") {
      var i = 0; var s = 0L
      while (i < n) { s += Multimodal.videoSiOne(i.toLong, vids(i), 4, 8, 8).map(_.sig).getOrElse(0L); i += 1 }
      s
    }
    time("videoRoOne (8-orbit)") {
      var i = 0; var s = 0L
      while (i < n) { s += Multimodal.videoRoOne(i.toLong, vids(i), 4, 8, 8).map(_.sig).getOrElse(0L); i += 1 }
      s
    }
    timeN("nnUpscaleVideo2x", n / 7) {
      var i = 0; var s = 0L
      while (i < n / 7) { s += Multimodal.nnUpscaleVideo2x(vids(i)).length; i += 1 }
      s
    }
    val bmps = new Array[Array[Byte]](n)
    time("gen syntheticBmp") {
      var i = 0; var s = 0L
      while (i < n) { bmps(i) = Multimodal.syntheticBmp(i.toLong); s += bmps(i).length; i += 1 }
      s
    }
    time("gen syntheticPng") {
      var i = 0; var s = 0L
      while (i < n) { s += Multimodal.syntheticPng(i.toLong).length; i += 1 }
      s
    }
    timeN("imageSi thumb (via nnUpscale2x)", n / 7) {
      var i = 0; var s = 0L
      while (i < n / 7) { s += Multimodal.nnUpscale2x(bmps(i)).length; i += 1 }
      s
    }
    val wavs = new Array[Array[Byte]](n)
    time("gen syntheticWavMixed") {
      var i = 0; var s = 0L
      while (i < n) { wavs(i) = Multimodal.syntheticWavMixed(i.toLong); s += wavs(i).length; i += 1 }
      s
    }
    timeN("zohUpsample2x", n / 7) {
      var i = 0; var s = 0L
      while (i < n / 7) { s += Multimodal.zohUpsample2x(wavs(i)).length; i += 1 }
      s
    }
  }
}
