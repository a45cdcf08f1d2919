package graft.cli

import java.nio.file.{Files, Paths}

import graft.Sessions
import graft.core.TransferSpec
import graft.engine.{TransferControl, TransferRunner}

/** CLI entry point mirroring the reference's flag surface
  * (`main.go:215-224`): `--config`, `--type`, `--generate-template`,
  * `--template-output`, `--version`. i18n (R9) is out of scope per
  * SURVEY — messages are English-only.
  *
  * Backend autodetect (R11): the reference sniffs ports
  * (`main.go:342-363`); here the analog is scheme/extension sniffing on
  * the source path when no type is given.
  */
object Main {
  private val Version = "0.2.0"

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    if (opts.contains("version")) { println(s"graft transfer engine v$Version"); return }

    if (opts.contains("generate-template")) {
      val kind = opts.getOrElse("type", "parquet")
      val out = opts.getOrElse("template-output", "config.yaml")
      Files.writeString(Paths.get(out), TransferSpec.template(kind))
      println(s"template written to $out")
      return
    }

    val cfgPath = opts.getOrElse("config", "config.yaml")
    val spec0 = TransferSpec.fromYamlFile(cfgPath)
    val kind = opts.get("type")
      .orElse(Option(spec0.source.kind).filter(_.nonEmpty))
      .getOrElse(autodetect(spec0.source.path))
    // destination sniffs too: a dest jdbc: URL with no declared type must
    // not be treated as a parquet directory
    val destKind = Option(spec0.destination.kind).filter(_.nonEmpty)
      .getOrElse(autodetect(spec0.destination.path))
    val spec = spec0.copy(source = spec0.source.copy(kind = kind),
      destination = spec0.destination.copy(kind = destKind))
    val jdbcKinds = Map(
      "jdbc" -> graft.sinks.JdbcUpsert.Derby,
      "derby" -> graft.sinks.JdbcUpsert.Derby,
      "mysql" -> graft.sinks.JdbcUpsert.MySql,
      "postgresql" -> graft.sinks.JdbcUpsert.Postgres)
    require(kind == "parquet" || jdbcKinds.contains(kind),
      s"backend '$kind' is declared but needs its Spark connector on the " +
        "classpath; this build executes 'parquet' and JDBC backends natively")

    val spark = Sessions.builder("graft-transfer", Sessions.cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val control = new TransferControl
    val hook = TransferRunner.installShutdownHook(control)
    val t0 = System.currentTimeMillis()
    // deregister the hook and stop spark even when the run throws — a
    // crash exit must not fire the hook's misleading interrupt message
    val results =
      try {
        if (kind == "parquet") TransferRunner.run(spark, spec, control)
        // live path shares the same cooperative cancel: SIGINT flushes
        // the chunk checkpoint and the next run resumes from it
        else TransferRunner.runJdbc(spark, spec, jdbcKinds(kind), control = control)
      } finally {
        TransferRunner.removeShutdownHook(hook)
        spark.stop()
      }
    println(TransferRunner.summarize(results))
    println(f"total time: ${(System.currentTimeMillis() - t0) / 1000.0}%.1f s")
    if (results.exists(_.outcome.isFailure)) sys.exit(1)

    // --prune-completed: GC resume/intermediate artifacts of tables that
    // VERIFIABLY completed (checkpoint complete + _GRAFT_COMPLETE / live
    // complete marker). Only after a fully-completed run — an
    // interrupted run's checkpoints are its resume points.
    if (opts.contains("prune-completed") &&
        TransferRunner.allCompleted(results)) {
      if (kind == "parquet")
        spec.source.tables.foreach(t =>
          graft.engine.TableTransferJob.pruneCompleted(spec, t,
            s => println(s"[prune] $s")))
      else spec.source.tables.foreach { t =>
        // an incremental table's COMPLETED checkpoint is its delta-sync
        // base (the last synced key) — pruning it silently downgrades
        // every later scheduled run to a full re-transfer (ADVICE r6)
        if (t.incremental)
          println(s"[prune] ${t.name}: kept checkpoint " +
            "(incremental=true — it is the delta-sync base)")
        else {
          // SAME derivation as the runner (checkpointName treats null as
          // same-database) — a drifted copy here would prune nothing
          val destUrl = TransferRunner.jdbcDestUrl(spec)
          graft.engine.Checkpoint.delete(spec.migration.checkpointDir, "jdbc",
            graft.engine.JdbcTransferJob.checkpointName(spec.source.path, t, destUrl))
          println(s"[prune] ${t.name}: pruned checkpoint (live destination holds the data)")
        }
      }
      // streaming scratch (durable-sink checkpoints + out dirs) is part
      // of the product's disk footprint too; the session is stopped by
      // now, so no query can be holding one (VERDICT r6 #7)
      graft.streaming.StreamingIngest.pruneWorkDirs(
        log = s => println(s"[prune] $s"))
      ()
    }
  }

  /** `scheme://` or file-extension sniffing (R11 analog). */
  private[graft] def autodetect(path: String): String = path match {
    case p if p.startsWith("jdbc:mysql") => "mysql"
    case p if p.startsWith("jdbc:postgresql") => "postgresql"
    case p if p.startsWith("jdbc:") => "jdbc" // Derby & other ANSI-MERGE stores
    case p if p.startsWith("mongodb://") => "mongodb"
    case p if p.contains(":9042") => "cassandra"
    case _ => "parquet"
  }

  private def parseArgs(args: Array[String]): Map[String, String] = {
    val m = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      val a = args(i).dropWhile(_ == '-')
      a match {
        case "generate-template" | "version" | "prune-completed" =>
          m(a) = "true"; i += 1
        case "config" | "type" | "template-output" =>
          require(i + 1 < args.length, s"--$a requires a value")
          m(a) = args(i + 1); i += 2
        case other => sys.error(s"unknown flag: --$other")
      }
    }
    m.toMap
  }
}
