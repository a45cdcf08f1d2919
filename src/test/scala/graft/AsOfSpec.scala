package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOf

/** ops/AsOf — as-of join semantics: inclusive bound, LEFT behavior,
  * tolerance nulling, multi-key, and plan shape (one exchange, no
  * cartesian/range explosion). */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = Sessions.builder("asof-spec", 4).getOrCreate()
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, 100L, "a"), // after r at 90 → matches 90
    (2L, 10L, 90L, "b"),  // EQUAL ts → inclusive, matches 90
    (3L, 10L, 50L, "c"),  // between ticks → matches the 40 tick
    (4L, 20L, 100L, "d"), // other key, matches its own stream
    (5L, 10L, 30L, "e")   // before ANY right row → null
  ).toDF("id", "k", "t", "payload")

  private def right = Seq(
    (10L, 90L, 1.0), (10L, 40L, 0.5), // k=10: ticks at 40, 90
    (20L, 99L, 2.0),                  // k=20
    (30L, 10L, 9.9)                   // key with no left rows
  ).toDF("k", "t", "v")

  test("inclusive bound, latest-wins, LEFT semantics") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "t")
      .select("id", "asof_t", "asof_v").as[(Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, Some(90L), Some(1.0))))
    assert(out(1) == ((2L, Some(90L), Some(1.0)))) // equal ts matches
    assert(out(2) == ((3L, Some(40L), Some(0.5)))) // between ticks
    assert(out(3) == ((4L, Some(99L), Some(2.0))))
    assert(out(4) == ((5L, None, None)))           // nothing at-or-before
  }

  test("tolerance nulls stale matches but keeps fresh ones") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", tolerance = Some(5L))
      .select("id", "asof_t").as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(out(0)._2.isEmpty)        // 100 - 90 = 10 > 5 → stale
    assert(out(1)._2 == Some(90L))   // exact hit, gap 0
    assert(out(3)._2 == Some(99L))   // gap 1 ≤ 5
  }

  test("plan: one shuffle on the key, no cartesian") {
    val plan = AsOf.asofJoin(left, right, Seq("k"), "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"))
    // union feeds ONE hashpartitioning exchange for the window
    assert("hashpartitioning".r.findAllIn(plan).size <= 2)
  }

  test("streaming twin emits exactly the batch as-of rows (sf0.001)") {
    val batch = SparkEntry.queries("join_asof")(spark, "/root/testdata/sf0.001")
    val stream = SparkEntry.queries("streaming_asof")(spark, "/root/testdata/sf0.001")
    assert(stream.columns.sorted.sameElements(batch.columns.sorted))
    assert(stream.exceptAll(batch.select(stream.columns.map(col): _*)).isEmpty)
    assert(batch.select(stream.columns.map(col): _*).exceptAll(stream).isEmpty)
  }

  test("bucketed variant is result-equal to the plain as-of (incl. empty buckets)") {
    // widths chosen so buckets split mid-timeline, isolate single
    // events, and leave left-only/empty buckets in between
    for (width <- Seq(1L, 7L, 25L, 1000L)) {
      val b = AsOf.asofJoinBucketed(left, right, Seq("k"), "t", width)
      val p = AsOf.asofJoin(left, right, Seq("k"), "t")
      assert(b.exceptAll(p).isEmpty && p.exceptAll(b).isEmpty,
        s"bucketed(width=$width) diverged from plain")
    }
  }

  test("bucketed property: random streams, random widths, equal to plain") {
    val rnd = new scala.util.Random(11)
    for (round <- 0 until 3) {
      val keys = 1 + rnd.nextInt(3)
      val l = (0 until 50).map(i =>
        (i.toLong, rnd.nextInt(keys).toLong, rnd.nextInt(200).toLong)).toDF("id", "k", "t")
      val r = (0 until 40).map(i =>
        (1000L + i, rnd.nextInt(keys).toLong, rnd.nextInt(200).toLong, rnd.nextDouble()))
        .groupBy(x => (x._2, x._3)).values.map(_.maxBy(_._1)).toSeq
        .toDF("rid", "k", "t", "v").select(col("k"), col("t"), col("rid"), col("v"))
      val width = 1L + rnd.nextInt(60)
      val b = AsOf.asofJoinBucketed(l, r, Seq("k"), "t", width)
      val p = AsOf.asofJoin(l, r, Seq("k"), "t")
      assert(b.exceptAll(p).isEmpty && p.exceptAll(b).isEmpty,
        s"round $round width $width diverged")
    }
  }

  test("property: random streams match the brute-force as-of reference") {
    val rnd = new scala.util.Random(42)
    for (round <- 0 until 5) {
      val keys = 1 + rnd.nextInt(4)
      val lefts = (0 until 40).map(i =>
        (i.toLong, rnd.nextInt(keys).toLong, rnd.nextInt(50).toLong))
      val rights = (0 until 30).map(i =>
        (1000L + i, rnd.nextInt(keys).toLong, rnd.nextInt(50).toLong, rnd.nextDouble()))
      // unique per (k, t): keep max id (the gate's contract)
      val rightsU = rights.groupBy(r => (r._2, r._3)).values
        .map(_.maxBy(_._1)).toSeq
      val l = lefts.toDF("id", "k", "t")
      val r = rightsU.toDF("rid", "k", "t", "v")
        .select(col("k"), col("t"), col("rid"), col("v"))
      val got = AsOf.asofJoin(l, r, Seq("k"), "t")
        .select("id", "asof_rid").as[(Long, Option[Long])]
        .collect().toMap
      lefts.foreach { case (id, k, t) =>
        val want = rightsU.filter(x => x._2 == k && x._3 <= t)
          .sortBy(x => (x._3, x._1)).lastOption.map(_._1)
        assert(got(id) == want, s"round $round left $id key $k ts $t")
      }
    }
  }

  test("matches the declared-gate oracle shape on real events (sf0.001)") {
    val df = SparkEntry.queries("join_asof")(spark, "/root/testdata/sf0.001")
    val n = df.count()
    assert(n > 0)
    // every matched row's gap is non-negative (as-of never looks forward)
    assert(df.where(col("gap_us") < 0).count() == 0)
    // unmatched rows exist in this fixture and carry null payload
    assert(df.where(col("asof_click_id").isNull && col("gap_us").isNotNull).count() == 0)
  }
}
