package graft

import java.nio.file.{Files, Paths}

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core._
import graft.engine._

/** End-to-end tests of the config-driven transfer engine, including the
  * SURVEY §5.2.4 invariant: for a random kill point, resuming from the
  * checkpoint yields a destination identical (as a keyed set) to an
  * uninterrupted run. */
class TransferJobSpec extends SparkTestBase {

  /** Minimal property-check driver (scalatestplus is not on the offline
    * classpath): sample `n` values from a ScalaCheck Gen and assert each. */
  private def forAllN[T](gen: Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      val v = gen.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(fail("gen exhausted"))
      withClue(s"sample #$i = $v: ")(body(v))
    }

  /** Cancels after `n` chunk-boundary checks — the simulated kill. */
  private def KillAfter(n: Int): TransferControl =
    TransferControl.cancelAfterChecks(n)

  private def freshSpec(tables: Seq[TableMapping],
                        batch: Int = 50): (TransferSpec, String) = {
    val work = Files.createTempDirectory("xfer").toString
    val spec = TransferSpec(
      source = EndpointSpec("parquet", path = sf, tables = tables),
      destination = EndpointSpec("parquet", path = s"$work/dest"),
      migration = MigrationSpec(batchSize = batch, checkpointRowThreshold = batch,
        checkpointDir = s"$work/checkpoints", rateLimit = 100000000))
    (spec, work)
  }

  private val customerXform = TableMapping("customer",
    targetName = Some("customer_new"),
    columnTransformations = Seq(
      ColumnTransformation("c_name", "UPPER(c_name)"),
      ColumnTransformation("c_acctbal", "round(c_acctbal * 100, 0)")))

  private def expectedCustomer = {
    import org.apache.spark.sql.functions._
    graft.sources.Tables(spark, sf, "customer")
      .withColumn("c_name", expr("UPPER(c_name)"))
      .withColumn("c_acctbal", expr("round(c_acctbal * 100, 0)"))
  }

  test("full transfer: transforms applied, chunked dest matches source") {
    val (spec, _) = freshSpec(Seq(customerXform))
    val out = TransferRunner.run(spark, spec, log = _ => ())
    assert(out.forall(_.outcome.isSuccess))
    val dest = TableTransferJob.readTarget(spark, spec, "customer_new")
    assert(dest.count() == expectedCustomer.count())
    assert(dest.except(expectedCustomer).isEmpty)
    assert(expectedCustomer.except(dest).isEmpty)
    // artifacts: DDL sidecar (S8), completion marker, complete checkpoint
    assert(Files.exists(Paths.get(spec.destination.path, "customer_new", "_schema.ddl")))
    assert(Files.exists(Paths.get(spec.destination.path, "customer_new", "_GRAFT_COMPLETE")))
    assert(Checkpoint.load(spec.migration.checkpointDir, "parquet", TableTransferJob.checkpointName(spec, customerXform))
      .exists(_.complete))
    // multiple chunks actually happened (150 rows / 50 per chunk)
    val chunks = new java.io.File(s"${spec.destination.path}/customer_new")
      .listFiles().count(_.getName.startsWith("chunk-"))
    assert(chunks >= 2, s"expected chunked layout, got $chunks chunk dirs")
  }

  test("completed table is skipped on rerun (R6)") {
    val (spec, _) = freshSpec(Seq(customerXform))
    TransferRunner.run(spark, spec, log = _ => ())
    val again = TransferRunner.run(spark, spec, log = _ => ())
    assert(again.head.outcome.get == TransferOutcome.SkippedComplete)
  }

  test("parquet incremental: completed transfer extends with ONLY the appended key tail") {
    import org.apache.spark.sql.functions._
    val work = Files.createTempDirectory("pinc").toString
    val src0 = graft.sources.Tables(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    src0.where(col("o_orderkey") < 800).write.parquet(s"$work/src/orders_inc.parquet")
    val spec = TransferSpec(
      EndpointSpec("parquet", path = s"$work/src", tables = Seq(
        TableMapping("orders_inc", targetName = Some("orders_inc_new"),
          primaryKey = Some("o_orderkey"), incremental = true))),
      EndpointSpec("parquet", path = s"$work/dest"),
      MigrationSpec(batchSize = 100, checkpointRowThreshold = 100,
        checkpointDir = s"$work/cp", rateLimit = 100000000))
    val t = spec.source.tables.head
    assert(new TableTransferJob(spark, spec, t, log = _ => ()).run() ==
      TransferOutcome.Completed)
    val destDir = s"$work/dest/orders_inc_new"
    def chunkDirs = new java.io.File(destDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("chunk-"))
      .map(_.getName).toSet
    val before = chunkDirs
    // no new rows: the extension is a no-op that ends complete again
    assert(new TableTransferJob(spark, spec, t, log = _ => ()).run() ==
      TransferOutcome.Completed)
    assert(chunkDirs == before, "no-op delta must not touch chunk dirs")
    // source appends a key tail; the delta lands in NEW chunk dirs only
    src0.where(col("o_orderkey") >= 800).write.mode("append")
      .parquet(s"$work/src/orders_inc.parquet")
    assert(new TableTransferJob(spark, spec, t, log = _ => ()).run() ==
      TransferOutcome.Completed)
    val after = chunkDirs
    assert(before.subsetOf(after) && after.size > before.size,
      s"delta must append chunk dirs: $before -> $after")
    val deltaRows = (after -- before).toSeq
      .map(n => spark.read.parquet(s"$destDir/$n").count()).sum
    assert(deltaRows == src0.where(col("o_orderkey") >= 800).count(),
      s"delta chunk dirs hold $deltaRows rows")
    val dest = TableTransferJob.readTarget(spark, spec, "orders_inc_new")
    assert(dest.count() == src0.count())
    assert(dest.except(src0).isEmpty && src0.except(dest).isEmpty)
    // R6 preserved: a non-incremental mapping still skips
    assert(new TableTransferJob(spark, spec, t.copy(incremental = false),
      log = _ => ()).run() == TransferOutcome.SkippedComplete)
  }

  test("parquet incremental over a hash-bucketed key degrades to a correct full re-transfer") {
    import org.apache.spark.sql.functions._
    val work = Files.createTempDirectory("pinch").toString
    val src0 = graft.sources.Tables(spark, sf, "customer")
      .select(concat(lit("K"), col("c_custkey")).as("ckey"), col("c_acctbal"))
    val firstHalf = src0.where(pmod(crc32(col("ckey")), lit(2)) === 0)
    firstHalf.write.parquet(s"$work/src/cust_inc.parquet")
    val spec = TransferSpec(
      EndpointSpec("parquet", path = s"$work/src", tables = Seq(
        TableMapping("cust_inc", targetName = Some("cust_inc_new"),
          primaryKey = Some("ckey"), incremental = true))),
      EndpointSpec("parquet", path = s"$work/dest"),
      MigrationSpec(batchSize = 100, checkpointRowThreshold = 100,
        checkpointDir = s"$work/cp", rateLimit = 100000000))
    val t = spec.source.tables.head
    assert(new TableTransferJob(spark, spec, t, log = _ => ()).run() ==
      TransferOutcome.Completed)
    // new rows arrive ANYWHERE in the key space (varchar keys have no
    // range cursor) — the incremental re-run degrades to a full
    // idempotent re-transfer and must still be exactly right
    src0.where(pmod(crc32(col("ckey")), lit(2)) === 1).write.mode("append")
      .parquet(s"$work/src/cust_inc.parquet")
    assert(new TableTransferJob(spark, spec, t, log = _ => ()).run() ==
      TransferOutcome.Completed)
    val dest = TableTransferJob.readTarget(spark, spec, "cust_inc_new")
    assert(dest.count() == src0.count())
    assert(dest.except(src0).isEmpty && src0.except(dest).isEmpty)
    // crash-safety of the degrade: the old COMPLETE state is cleared
    // BEFORE the wipe, so an interrupted degrade must NOT be shielded
    // by a stale complete marker — the next plain run must transfer,
    // not skip (R6 would otherwise serve a destroyed destination)
    val killed = new TableTransferJob(spark, spec, t, KillAfter(1),
      log = _ => ()).run()
    assert(killed.isInstanceOf[TransferOutcome.Interrupted], killed.toString)
    val after = new TableTransferJob(spark, spec,
      t.copy(incremental = false), log = _ => ()).run()
    assert(after == TransferOutcome.Completed,
      s"interrupted degrade must resume, not skip: $after")
    val dest2 = TableTransferJob.readTarget(spark, spec, "cust_inc_new")
    assert(dest2.count() == src0.count())
    assert(dest2.except(src0).isEmpty && src0.except(dest2).isEmpty)
  }

  test("prune-completed GCs checkpoints (+ chunk dirs under a published layout); rerun re-transfers cleanly") {
    // chunked layout: only the checkpoint may go (chunk dirs ARE the data)
    val (spec, _) = freshSpec(Seq(customerXform))
    TransferRunner.run(spark, spec, log = _ => ())
    assert(TableTransferJob.pruneCompleted(spec, customerXform))
    assert(Checkpoint.load(spec.migration.checkpointDir, "parquet",
      TableTransferJob.checkpointName(spec, customerXform)).isEmpty)
    val dest = TableTransferJob.readTarget(spark, spec, "customer_new")
    assert(dest.count() == expectedCustomer.count(), "data must survive the prune")
    // rerun after prune: NOT skipped (checkpoint gone) — a full clean re-transfer
    val again = TransferRunner.run(spark, spec, log = _ => ())
    assert(again.head.outcome.get == TransferOutcome.Completed)
    assert(TableTransferJob.readTarget(spark, spec, "customer_new")
      .except(expectedCustomer).isEmpty)

    // partitioned publish layout: intermediate chunk dirs go too
    val part = TableMapping("orders", targetName = Some("orders_part"),
      partitionBy = Seq("o_orderstatus"))
    val (spec2, _) = freshSpec(Seq(part))
    TransferRunner.run(spark, spec2, log = _ => ())
    val destDir = new java.io.File(s"${spec2.destination.path}/orders_part")
    assert(destDir.listFiles().exists(_.getName.startsWith("chunk-")))
    assert(TableTransferJob.pruneCompleted(spec2, part))
    assert(!destDir.listFiles().exists(_.getName.startsWith("chunk-")),
      "published layout: chunk intermediates must be pruned")
    val src = graft.sources.Tables(spark, sf, "orders")
    assert(TableTransferJob.readTarget(spark, spec2, "orders_part").count() == src.count())
    // an INTERRUPTED run refuses the prune (checkpoint is its resume point)
    val (spec3, _) = freshSpec(Seq(customerXform))
    new TableTransferJob(spark, spec3, customerXform, KillAfter(1), _ => ()).run()
    assert(!TableTransferJob.pruneCompleted(spec3, customerXform))
    assert(Checkpoint.load(spec3.migration.checkpointDir, "parquet",
      TableTransferJob.checkpointName(spec3, customerXform)).nonEmpty,
      "interrupted checkpoint must survive")
  }

  test("kill+resume invariant: resumed destination == uninterrupted (SURVEY §5.2.4)") {
    forAllN(Gen.choose(1, 4), 4) { k =>
      val (spec, _) = freshSpec(Seq(customerXform))
      val job = () => new TableTransferJob(spark, spec, customerXform,
        KillAfter(k), _ => ())
      val first = job().run()
      // with 3 chunks a kill point >= chunk count just completes
      first match {
        case TransferOutcome.Interrupted(_) =>
          val resumed = new TableTransferJob(spark, spec, customerXform,
            new TransferControl, _ => ()).run()
          assert(resumed == TransferOutcome.Completed)
        case TransferOutcome.Completed => ()
        case other => fail(s"unexpected: $other")
      }
      val dest = TableTransferJob.readTarget(spark, spec, "customer_new")
      assert(dest.count() == expectedCustomer.count())
      assert(dest.except(expectedCustomer).isEmpty)
      assert(expectedCustomer.except(dest).isEmpty)
    }
  }

  test("checkpoint bound covers every row written (no re-transfer duplicates)") {
    import org.apache.spark.sql.functions._
    // interrupted mid-run: all rows in chunks <= chunkIndex are <= lastKey
    val (spec, _) = freshSpec(Seq(customerXform))
    val r = new TableTransferJob(spark, spec, customerXform,
      KillAfter(2), _ => ()).run()
    assert(r.isInstanceOf[TransferOutcome.Interrupted])
    val cp = Checkpoint.load(spec.migration.checkpointDir, "parquet", TableTransferJob.checkpointName(spec, customerXform)).get
    val bound = cp.lastKey("c_custkey").toDouble
    val written = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"${spec.destination.path}/customer_new")
    val dirs = new java.io.File(s"${spec.destination.path}/customer_new")
      .listFiles().count(_.getName.startsWith("chunk-"))
    assert(dirs == cp.chunkIndex + 1, "checkpoint index matches written chunks")
    val overBound = written.where(col("c_custkey") > bound).count()
    assert(overBound == 0,
      s"$overBound rows above checkpoint bound $bound would duplicate on resume")
    // completed run: the recorded bound is the TRUE max of the key, so a
    // rerun's remaining-set is empty even where the quantile undershot
    val done = new TableTransferJob(spark, spec, customerXform,
      new TransferControl, _ => ()).run()
    assert(done == TransferOutcome.Completed)
    val cpDone = Checkpoint.load(spec.migration.checkpointDir, "parquet", TableTransferJob.checkpointName(spec, customerXform)).get
    val trueMax = graft.sources.Tables(spark, sf, "customer")
      .agg(max(col("c_custkey"))).head.getLong(0)
    assert(cpDone.lastKey("c_custkey").toDouble == trueMax.toDouble)
  }

  test("NULL primary keys are refused, not silently dropped") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("xfern").toString
    Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (3L, "c"))
      .toDF("id", "v").write.parquet(s"$work/src/t.parquet")
    val t = TableMapping("t", primaryKey = Some("id"))
    val spec = TransferSpec(
      EndpointSpec("parquet", path = s"$work/src", tables = Seq(t)),
      EndpointSpec("parquet", path = s"$work/dest"),
      MigrationSpec(checkpointDir = s"$work/cp", rateLimit = 100000000))
    val e = intercept[IllegalArgumentException] {
      new TableTransferJob(spark, spec, t, new TransferControl, _ => ()).run()
    }
    assert(e.getMessage.contains("NULL"))
  }

  test("orphan chunk dirs above the checkpoint are cleaned on resume") {
    val (spec, _) = freshSpec(Seq(customerXform))
    // simulate a crash that wrote an extra chunk the checkpoint never saw
    val orphan = Paths.get(spec.destination.path, "customer_new", "chunk-00099")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("junk.parquet"), "")
    TransferRunner.run(spark, spec, log = _ => ())
    assert(!Files.exists(orphan), "orphan chunk dir should be removed")
    val dest = TableTransferJob.readTarget(spark, spec, "customer_new")
    assert(dest.except(expectedCustomer).isEmpty)
  }

  test("non-numeric PK falls back to deterministic hash buckets (token analog)") {
    import spark.implicits._
    val work = Files.createTempDirectory("xferh").toString
    Seq(("a", 1.0), ("b", 2.0), ("c", 3.0), ("d", 4.0), ("e", 5.0), ("f", 6.0))
      .toDF("sku", "price").write.parquet(s"$work/src/items.parquet")
    val t = TableMapping("items", primaryKey = Some("sku"),
      columnTransformations = Seq(ColumnTransformation("price", "price * 100")))
    val spec = TransferSpec(
      EndpointSpec("parquet", path = s"$work/src", tables = Seq(t)),
      EndpointSpec("parquet", path = s"$work/dest"),
      MigrationSpec(batchSize = 2, checkpointRowThreshold = 2,
        checkpointDir = s"$work/cp", rateLimit = 100000000))
    // kill mid-run, then resume
    val first = new TableTransferJob(spark, spec, t, KillAfter(1), _ => ()).run()
    val second = new TableTransferJob(spark, spec, t, new TransferControl, _ => ()).run()
    assert(second == TransferOutcome.Completed || first == TransferOutcome.Completed)
    val dest = TableTransferJob.readTarget(spark, spec, "items")
    val expect = spark.read.parquet(s"$work/src/items.parquet")
      .withColumn("price", org.apache.spark.sql.functions.expr("price * 100"))
    assert(dest.count() == 6 && dest.except(expect).isEmpty)
  }

  test("transform rewriting the PK column does not shift chunk membership (ADVICE r2)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val work = Files.createTempDirectory("xferpk").toString
    (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.parquet(s"$work/src/t.parquet")
    // transform REWRITES the pk: id -> id * 1000. Bounds must apply to the
    // source value, so every source row lands in exactly one chunk.
    val t = TableMapping("t", primaryKey = Some("id"),
      columnTransformations = Seq(ColumnTransformation("id", "id * 1000")))
    val spec = TransferSpec(
      EndpointSpec("parquet", path = s"$work/src", tables = Seq(t)),
      EndpointSpec("parquet", path = s"$work/dest"),
      MigrationSpec(batchSize = 50, checkpointRowThreshold = 50,
        checkpointDir = s"$work/cp", rateLimit = 100000000))
    val r = new TableTransferJob(spark, spec, t, new TransferControl, _ => ()).run()
    assert(r == TransferOutcome.Completed)
    val dest = TableTransferJob.readTarget(spark, spec, "t")
    assert(dest.count() == 200, "a post-transform upper bound drops/duplicates rows")
    assert(dest.select(countDistinct(col("id"))).head.getLong(0) == 200)
    assert(dest.agg(max(col("id"))).head.getLong(0) == 200000L)
  }

  test("integral PKs above 2^53 keep exact bounds (no double rounding; ADVICE r2)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val work = Files.createTempDirectory("xfersnow").toString
    // snowflake-style ids: consecutive longs where double rounds to even
    val base = (1L << 53) + 1L
    (0L until 100L).map(i => (base + i, i)).toDF("id", "v")
      .write.parquet(s"$work/src/t.parquet")
    val t = TableMapping("t", primaryKey = Some("id"))
    val spec = TransferSpec(
      EndpointSpec("parquet", path = s"$work/src", tables = Seq(t)),
      EndpointSpec("parquet", path = s"$work/dest"),
      MigrationSpec(batchSize = 30, checkpointRowThreshold = 30,
        checkpointDir = s"$work/cp", rateLimit = 100000000))
    // kill mid-run so a resume actually consults the checkpointed bound
    new TableTransferJob(spark, spec, t, KillAfter(1), _ => ()).run()
    val cp1 = Checkpoint.load(s"$work/cp", "parquet", TableTransferJob.checkpointName(spec, t))
    cp1.flatMap(_.lastKey.get("id")).foreach { k =>
      assert(k.toLong >= base && (k.toLong - base) < 100, s"rounded bound $k")
    }
    val r = new TableTransferJob(spark, spec, t, new TransferControl, _ => ()).run()
    assert(r == TransferOutcome.Completed)
    val dest = TableTransferJob.readTarget(spark, spec, "t")
    assert(dest.count() == 100, "double-rounded resume bound duplicated/lost rows")
    assert(dest.select(countDistinct(col("id"))).head.getLong(0) == 100)
    // final checkpoint records the exact max, not a rounded neighbour
    val cp = Checkpoint.load(s"$work/cp", "parquet", TableTransferJob.checkpointName(spec, t)).get
    assert(cp.lastKey("id") == (base + 99L).toString)
  }

  test("hash-bucket resume reuses the persisted bucket count (ADVICE r2)") {
    import spark.implicits._
    val work = Files.createTempDirectory("xferbkt").toString
    (1 to 40).map(i => (s"sku$i", i.toDouble)).toDF("sku", "price")
      .write.parquet(s"$work/src/items.parquet")
    val t = TableMapping("items", primaryKey = Some("sku"))
    def spec(batch: Int) = TransferSpec(
      EndpointSpec("parquet", path = s"$work/src", tables = Seq(t)),
      EndpointSpec("parquet", path = s"$work/dest"),
      MigrationSpec(batchSize = batch, checkpointRowThreshold = batch,
        checkpointDir = s"$work/cp", rateLimit = 100000000))
    // first run with batch=5 → 8 buckets; kill early
    val first = new TableTransferJob(spark, spec(5), t, KillAfter(1), _ => ()).run()
    assert(first.isInstanceOf[TransferOutcome.Interrupted])
    val cp = Checkpoint.load(s"$work/cp", "parquet",
      TableTransferJob.checkpointName(spec(5), t)).get
    assert(cp.bucketCount == 8, s"expected 8 buckets persisted, got ${cp.bucketCount}")
    // resume with a CHANGED batch size — must keep the original 8-bucket
    // mapping, else pmod(hash(pk), n) remaps and loses/duplicates rows
    val second = new TableTransferJob(spark, spec(20), t, new TransferControl, _ => ()).run()
    assert(second == TransferOutcome.Completed)
    val dest = TableTransferJob.readTarget(spark, spec(20), "items")
    assert(dest.count() == 40)
    assert(dest.select("sku").distinct().count() == 40)
  }

  test("hash-bucket resume skips the full count scan (VERDICT r3 #8)") {
    import spark.implicits._
    val work = Files.createTempDirectory("xferbnc").toString
    (1 to 40).map(i => (s"sku$i", i.toDouble)).toDF("sku", "price")
      .write.parquet(s"$work/src/items.parquet")
    val t = TableMapping("items", primaryKey = Some("sku"))
    val spec = TransferSpec(
      EndpointSpec("parquet", path = s"$work/src", tables = Seq(t)),
      EndpointSpec("parquet", path = s"$work/dest"),
      MigrationSpec(batchSize = 5, checkpointRowThreshold = 5,
        checkpointDir = s"$work/cp", rateLimit = 100000000))
    val first = new TableTransferJob(spark, spec, t, KillAfter(1), _ => ()).run()
    assert(first.isInstanceOf[TransferOutcome.Interrupted])
    val cp = Checkpoint.load(s"$work/cp", "parquet",
      TableTransferJob.checkpointName(spec, t)).get
    assert(cp.totalRows == 40,
      s"hash checkpoint must persist the row total at plan time, got $cp")
    // record every job call-site during the resume: bucket writes only —
    // a `source.count()` would appear as "count at TableTransferJob..."
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        sites.add(Option(j.properties)
          .map(_.getProperty("callSite.short", "")).getOrElse("")); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val second = new TableTransferJob(spark, spec, t, new TransferControl, _ => ()).run()
      assert(second == TransferOutcome.Completed)
      Thread.sleep(500) // listener bus drains asynchronously
      val counted = sites.toArray.map(_.toString)
        .filter(_.contains("count at TableTransferJob"))
      assert(counted.isEmpty,
        s"resume paid a count scan: ${counted.mkString(", ")}")
    } finally spark.sparkContext.removeSparkListener(listener)
    val dest = TableTransferJob.readTarget(spark, spec, "items")
    assert(dest.count() == 40)
    assert(dest.select("sku").distinct().count() == 40)
  }

  test("register_table executes CREATE TABLE IF NOT EXISTS on the session catalog (S8)") {
    spark.sql("DROP TABLE IF EXISTS customer_new")
    try {
      val (spec, _) = freshSpec(Seq(customerXform.copy(registerTable = true)))
      TransferRunner.run(spark, spec, log = _ => ())
      assert(spark.catalog.tableExists("customer_new"), "target not in catalog")
      val viaCatalog = spark.table("customer_new")
      assert(viaCatalog.count() == expectedCustomer.count())
      assert(viaCatalog.except(expectedCustomer).isEmpty)
      // IF NOT EXISTS: a rerun with the table already registered succeeds
      Checkpoint.deleteAll(spec.migration.checkpointDir)
      TransferRunner.run(spark, spec, log = _ => ())
      assert(spark.catalog.tableExists("customer_new"))
      // external table: dropping it must NOT delete the transferred data
      spark.sql("DROP TABLE customer_new")
      assert(TableTransferJob.readTarget(spark, spec, "customer_new").count() ==
        expectedCustomer.count())
    } finally spark.sql("DROP TABLE IF EXISTS customer_new")
  }

  test("nested struct/array/map columns survive the chunked transfer intact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val work = Files.createTempDirectory("xfernst").toString
    val src = (1L to 120L).map(i => (i, (s"t$i", i * 2), Seq(i * 1.0, i * 2.0)))
      .toDF("id", "meta", "vals")
    src.write.parquet(s"$work/src/docs.parquet")
    val t = TableMapping("docs", primaryKey = Some("id"))
    val spec = TransferSpec(
      EndpointSpec("parquet", path = s"$work/src", tables = Seq(t)),
      EndpointSpec("parquet", path = s"$work/dest"),
      MigrationSpec(batchSize = 40, checkpointRowThreshold = 40,
        checkpointDir = s"$work/cp", rateLimit = 100000000))
    // kill+resume over nested data, then complete
    new TableTransferJob(spark, spec, t, KillAfter(1), _ => ()).run()
    new TableTransferJob(spark, spec, t, new TransferControl, _ => ()).run()
    val dest = TableTransferJob.readTarget(spark, spec, "docs")
    assert(dest.count() == 120)
    assert(dest.except(spark.read.parquet(s"$work/src/docs.parquet")).isEmpty)
    // nested extraction works post-transfer
    assert(dest.select(col("meta._2"), element_at(col("vals"), 2))
      .where(col("meta._2") === element_at(col("vals"), 2)).count() == 120)
  }

  test("transfer rejects a malicious transform up front (P6 wired in)") {
    val bad = TableMapping("customer", columnTransformations =
      Seq(ColumnTransformation("c_name", "reflect('java.lang.System','exit','0')")))
    val (spec, _) = freshSpec(Seq(bad))
    val out = TransferRunner.run(spark, spec, log = _ => ())
    assert(out.head.outcome.isFailure)
    assert(out.head.outcome.failed.get.getMessage.contains("allowlist"))
  }

  test("composite key with a LOW-CARDINALITY numeric leading column routes to hash buckets") {
    // l_linenumber has ≤7 distinct values: quantile bounds over it would
    // dedup to ≤7 giant chunks (the degeneracy the live path fixed with
    // full-tuple plans) — the parquet engine must pick the
    // cardinality-independent hash-bucket mode instead, and the
    // kill/resume cycle must follow the persisted mode.
    val t = TableMapping("lineitem", targetName = Some("li_lowcard"),
      primaryKey = Some("l_linenumber,l_orderkey"))
    val (spec, _) = freshSpec(Seq(t), batch = 500)
    new TableTransferJob(spark, spec, t, KillAfter(2), _ => ()).run()
    val cp = Checkpoint.load(spec.migration.checkpointDir, "parquet",
      TableTransferJob.checkpointName(spec, t)).get
    assert(cp.bucketCount > 1 && cp.bounds.isEmpty,
      s"expected the hash-bucket mode with >1 chunk, got $cp")
    val out = new TableTransferJob(spark, spec, t, new TransferControl, _ => ()).run()
    assert(out == TransferOutcome.Completed)
    val dest = TableTransferJob.readTarget(spark, spec, "li_lowcard")
    val src = graft.sources.Tables(spark, sf, "lineitem")
    assert(dest.count() == src.count())
    assert(dest.except(src).isEmpty && src.except(dest).isEmpty)
  }

  test("an interrupted run refuses to resume under a DIFFERENT key (both modes)") {
    // Chunk membership is a function of the key; resuming another key's
    // plan remaps chunks (lost or duplicated rows). v3 checkpoints carry
    // the key identity, so BOTH modes refuse any swap outright.
    // Range mode: numeric → numeric with the same width.
    val tr = TableMapping("lineitem", targetName = Some("li_swap_range"))
    val (specR, _) = freshSpec(Seq(tr), batch = 500)
    new TableTransferJob(spark, specR, tr, KillAfter(1), _ => ()).run()
    val swapR = tr.copy(primaryKey = Some("l_partkey"))
    val eR = intercept[IllegalArgumentException] {
      new TableTransferJob(spark, specR, swapR, new TransferControl, _ => ()).run()
    }
    assert(eR.getMessage.contains("planned over key"), eR.getMessage)
    // Hash mode: string → string.
    val th = TableMapping("customer", targetName = Some("c_swap_hash"),
      primaryKey = Some("c_name"))
    val (specH, _) = freshSpec(Seq(th), batch = 20)
    new TableTransferJob(spark, specH, th, KillAfter(1), _ => ()).run()
    val swapH = th.copy(primaryKey = Some("c_mktsegment"))
    val eH = intercept[IllegalArgumentException] {
      new TableTransferJob(spark, specH, swapH, new TransferControl, _ => ()).run()
    }
    assert(eH.getMessage.contains("planned over key"), eH.getMessage)
  }

  test("a legacy (pre-v3) range checkpoint under a renamed key refuses via the cursor name") {
    // v2 files carry no key_cols, but the range path's resume cursor is
    // stored under the OLD key column's name — a miss is a key swap, and
    // silently restarting the plan would duplicate the completed prefix.
    val t = TableMapping("orders", targetName = Some("o_legacy_swap"))
    val (spec, _) = freshSpec(Seq(t), batch = 500)
    new TableTransferJob(spark, spec, t, KillAfter(1), _ => ()).run()
    // rewrite the checkpoint as a v2 file (strip key_cols, keep cursor)
    val name = TableTransferJob.checkpointName(spec, t)
    val cp = Checkpoint.load(spec.migration.checkpointDir, "parquet", name).get
    assert(cp.lastKey.contains("o_orderkey"))
    Checkpoint.save(spec.migration.checkpointDir, "parquet", name,
      cp.copy(keyCols = Nil, version = 2))
    val swapped = t.copy(primaryKey = Some("o_custkey"))
    val e = intercept[IllegalArgumentException] {
      new TableTransferJob(spark, spec, swapped, new TransferControl, _ => ()).run()
    }
    assert(e.getMessage.contains("resume cursor"), e.getMessage)
  }

  test("a hash checkpoint under a now-single-numeric key refuses to resume") {
    // A single-column numeric key NEVER writes a hash checkpoint, so
    // finding one can only mean the key changed since the interrupted
    // run; resuming would remap bucket membership and silently lose
    // rows. Low cardinality of the new key is NOT an excuse (the guard
    // must not consult the probe): l_linenumber alone is exactly the
    // low-card case a probe would wave through.
    val t = TableMapping("lineitem", targetName = Some("li_keyswap"),
      primaryKey = Some("l_linenumber,l_orderkey"))
    val (spec, _) = freshSpec(Seq(t), batch = 500)
    new TableTransferJob(spark, spec, t, KillAfter(2), _ => ()).run()
    assert(Checkpoint.load(spec.migration.checkpointDir, "parquet",
      TableTransferJob.checkpointName(spec, t)).get.bucketCount > 1)
    val swapped = t.copy(primaryKey = Some("l_linenumber"))
    val e = intercept[IllegalArgumentException] {
      new TableTransferJob(spark, spec, swapped, new TransferControl, _ => ()).run()
    }
    // the v3 key-identity guard fires first (it subsumes the
    // mode-specific hash-bucket guard, which still polices legacy files)
    assert(e.getMessage.contains("planned over key") ||
      e.getMessage.contains("hash-bucket path"), e.getMessage)
  }

  test("composite key with a high-cardinality leading column keeps the range path") {
    // lineitem's real key order (l_orderkey leading) resolves the chunk
    // target fine — the probe must NOT push it onto the hash path (range
    // chunks keep parquet min/max row-group pruning).
    val t = TableMapping("lineitem", targetName = Some("li_range"))
    val (spec, _) = freshSpec(Seq(t), batch = 500)
    new TableTransferJob(spark, spec, t, KillAfter(1), _ => ()).run()
    val cp = Checkpoint.load(spec.migration.checkpointDir, "parquet",
      TableTransferJob.checkpointName(spec, t)).get
    assert(cp.bounds.nonEmpty && cp.bucketCount <= 0,
      s"expected the range mode, got $cp")
    assert(new TableTransferJob(spark, spec, t, new TransferControl, _ => ()).run()
      == TransferOutcome.Completed)
  }
}
