package graft

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.core.I18n
import graft.engine.ProgressStats

/** R9 — i18n surface (`internal/i18n/i18n.go`): zh/en selection,
  * printf formatting, env detection, unsupported-language fallback with
  * a translated warning, the colored console formatter, and the
  * bilingual progress line. Tests save/restore the process-global
  * language (forked test JVM runs suites sequentially). */
class I18nSpec extends AnyFunSuite {

  private def withLang[A](lang: String)(body: => A): A = {
    val saved = I18n.language
    try { I18n.setLanguage(lang); body } finally I18n.setLanguage(saved)
  }

  test("tr selects by language and printf-formats (i18n.go:148-170)") {
    withLang("en") {
      assert(I18n.tr("配置模板已生成: %s", "Config template generated: %s", "a.yaml")
        == "Config template generated: a.yaml")
      assert(I18n.tr("无参数", "no args") == "no args")
    }
    withLang("zh") {
      assert(I18n.tr("配置模板已生成: %s", "Config template generated: %s", "a.yaml")
        == "配置模板已生成: a.yaml")
      assert(I18n.tr("%d 行 (%.1f%%)", "%d rows (%.1f%%)", 250, 25.0)
        == "250 行 (25.0%)")
    }
  }

  test("detection: zh locale in LC_ALL/LC_MESSAGES/LANG or JVM language") {
    def env(m: Map[String, String]): String => Option[String] = m.get
    assert(I18n.detect(env(Map("LANG" -> "zh_CN.UTF-8")), () => None) == "zh")
    assert(I18n.detect(env(Map("LC_ALL" -> "zh_TW.Big5")), () => None) == "zh")
    assert(I18n.detect(env(Map("LANG" -> "en_US.UTF-8")), () => None) == "en")
    // LC_ALL overrides are listed first but any zh value wins — the
    // reference's substring probe accepts either (i18n.go:98-104)
    assert(I18n.detect(env(Map("LANG" -> "C", "LC_MESSAGES" -> "zh_CN")), () => None) == "zh")
    assert(I18n.detect(env(Map.empty), () => Some("zh")) == "zh")
    assert(I18n.detect(env(Map.empty), () => Some("en")) == "en")
    assert(I18n.detect(env(Map.empty), () => None) == "en")
  }

  test("setLanguage: unsupported value warns in current language and re-detects") {
    withLang("en") {
      var warned = ""
      I18n.setLanguage("fr", warn = warned = _)
      assert(warned.startsWith("Unsupported language: fr"))
      assert(I18n.language == "zh" || I18n.language == "en") // re-detected
      // empty string is a no-op pass-through for absent flag/config
      val before = I18n.language
      I18n.setLanguage("")
      assert(I18n.language == before)
    }
  }

  test("colored formatter: ts [LEVEL] msg with per-level ANSI color (i18n.go:173-210)") {
    val t0 = Instant.parse("2026-08-13T00:00:00Z")
    val plain = I18n.logLine(I18n.Info, "hello", color = false, now = () => t0)
    assert(plain.endsWith("[INFO] hello") && plain.length > "[INFO] hello".length)
    val colored = I18n.logLine(I18n.Error, "boom", color = true, now = () => t0)
    assert(colored.contains("[31m[ERROR][0m boom"))
    assert(I18n.logLine(I18n.Warn, "w", color = true, now = () => t0)
      .contains("[33m[WARN]"))
  }

  test("progress line is bilingual (migration.go:115-118)") {
    var t = 0L
    val s = new ProgressStats("t1", totalRows = 1000, now = () => t)
    s.add(250); t = 1000
    withLang("zh") {
      val r = s.report()
      assert(r.contains("进度: 250/1000 行") && r.contains("250 行/秒")
        && r.contains("(25.0%)"))
    }
  }

  test("CLI precedence: config migration.language applies when no flag (main.go:244-258)") {
    val spec = graft.core.TransferSpec.fromYaml(
      """source:
        |  type: parquet
        |  path: /tmp/x
        |destination:
        |  type: parquet
        |  path: /tmp/y
        |migration:
        |  language: "zh"
        |""".stripMargin)
    assert(spec.migration.language == "zh")
    // template round-trips the field
    assert(graft.core.TransferSpec.template("parquet").contains("language:"))
  }
}
