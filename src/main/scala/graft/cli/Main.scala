package graft.cli

import java.nio.file.{Files, Paths}

import graft.Sessions
import graft.core.{I18n, TransferSpec}
import graft.engine.{TransferControl, TransferRunner}

/** CLI entry point mirroring the reference's flag surface
  * (`main.go:215-224`): `--config`, `--type`, `--generate-template`,
  * `--template-output`, `--version`, `--language`. R9: messages go
  * through [[I18n.tr]]; language precedence is flag > config
  * `migration.language` > env detection (`main.go:244-258`).
  *
  * Backend autodetect (R11): the reference sniffs ports
  * (`main.go:342-363`); here the analog is scheme/extension sniffing on
  * the source path when no type is given.
  */
object Main {
  private val Version = "0.2.0"

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    opts.get("language").foreach(I18n.setLanguage(_))
    if (opts.contains("version")) {
      println(I18n.tr("graft 传输引擎 v%s", "graft transfer engine v%s", Version)); return
    }

    if (opts.contains("generate-template")) {
      val kind = opts.getOrElse("type", "parquet")
      val out = opts.getOrElse("template-output", "config.yaml")
      Files.writeString(Paths.get(out), TransferSpec.template(kind))
      println(I18n.tr("配置模板已生成: %s", "Config template generated: %s", out))
      return
    }

    val cfgPath = opts.getOrElse("config", "config.yaml")
    val spec0 = TransferSpec.fromYamlFile(cfgPath)
    // the flag wins over the config (reference main.go:244-258)
    if (!opts.contains("language")) I18n.setLanguage(spec0.migration.language)
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
    println(I18n.tr("总耗时: %.1f 秒", "total time: %.1f s",
      (System.currentTimeMillis() - t0) / 1000.0))
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
          println(I18n.tr(
            "[prune] %s: 保留检查点 (incremental=true — 它是增量同步的基准)",
            "[prune] %s: kept checkpoint (incremental=true — it is the delta-sync base)",
            t.name))
        else {
          // SAME derivation as the runner (checkpointName treats null as
          // same-database) — a drifted copy here would prune nothing
          val destUrl = TransferRunner.jdbcDestUrl(spec)
          graft.engine.Checkpoint.delete(spec.migration.checkpointDir, "jdbc",
            graft.engine.JdbcTransferJob.checkpointName(spec.source.path, t, destUrl))
          println(I18n.tr(
            "[prune] %s: 已清理检查点 (数据已在目标库中)",
            "[prune] %s: pruned checkpoint (live destination holds the data)",
            t.name))
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
        case "config" | "type" | "template-output" | "language" =>
          require(i + 1 < args.length, s"--$a requires a value")
          m(a) = args(i + 1); i += 2
        case other => sys.error(s"unknown flag: --$other")
      }
    }
    m.toMap
  }
}
