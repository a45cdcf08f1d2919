package graft.core

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneId}
import java.util.Locale

/** R9 — bilingual (zh/en) user-facing messages, the reference's
  * `internal/i18n/i18n.go` surface re-expressed for the JVM:
  *
  *   - `tr(zh, en, args*)`: inline message pairs selected by the current
  *     language, printf-formatted (`i18n.go:148-170` `Tr`).
  *   - `setLanguage`: accepts `zh`/`en`; anything else warns (in the
  *     current language, as the reference does) and falls back to system
  *     detection (`i18n.go:128-139` `SetLanguage`).
  *   - detection: the reference probes `LANG`/`LC_ALL` for a `zh` locale
  *     on unix and Windows code pages via `chcp` (`i18n.go:30-126`). The
  *     JVM analog reads the same env vars plus `user.language` (the
  *     JVM's own locale sniffing) — code-page probing has no JVM
  *     equivalent and single-byte GBK consoles are out of scope here.
  *   - `logLine`: the reference's colored console formatter
  *     (`i18n.go:173-210` `I18nFormatter`): `timestamp [LEVEL] message`
  *     with per-level ANSI colors and a reset suffix.
  *
  * Resolution precedence is owned by the CLI (`main.go:244-258`):
  * `--language` flag > config `migration.language` > detection. The
  * default is computed once at class load, like the reference's
  * `init()`.
  *
  * Messages carry BOTH translations at the call site (no catalog file to
  * drift out of sync) — the reference made the same choice at its ~260
  * call sites.
  */
object I18n {

  @volatile private var currentLang: String = detect()

  def language: String = currentLang

  /** Set the interface language. Unsupported values warn and re-detect
    * (reference `SetLanguage`); empty string is a no-op so callers can
    * pass an absent flag/config value straight through. */
  def setLanguage(lang: String, warn: String => Unit = Console.err.println): Unit =
    lang match {
      case "zh" | "en" => currentLang = lang
      case "" => ()
      case other =>
        warn(tr("不支持的语言: %s, 将根据系统环境选择语言",
          "Unsupported language: %s, will select language based on system environment", other))
        currentLang = detect()
    }

  /** Translate + printf-format. Verbs are java.util.Formatter's
    * (`%s`/`%d`/`%.1f`); the reference's Go verbs map 1:1 for these. */
  def tr(zh: String, en: String, args: Any*): String = {
    val text = if (currentLang == "zh") zh else en
    if (args.isEmpty) text
    else String.format(Locale.ROOT, text, args.map(_.asInstanceOf[AnyRef]): _*)
  }

  /** Language detection from the process environment. Exposed with an
    * injectable reader so specs can exercise it hermetically. */
  private[graft] def detect(
      env: String => Option[String] = k => Option(System.getenv(k)),
      jvmLanguage: () => Option[String] =
        () => Option(System.getProperty("user.language"))): String = {
    val locales = Seq("LC_ALL", "LC_MESSAGES", "LANG").flatMap(k => env(k))
    val fromEnv = locales.exists(_.toLowerCase(Locale.ROOT).startsWith("zh"))
    val fromJvm = jvmLanguage().exists(_.equalsIgnoreCase("zh"))
    if (fromEnv || fromJvm) "zh" else "en"
  }

  // ---- colored console formatter (reference I18nFormatter) -------------

  sealed abstract class Level(val name: String, val color: String)
  case object Debug extends Level("DEBUG", "[36m") // cyan
  case object Info extends Level("INFO", "[32m") // green
  case object Warn extends Level("WARN", "[33m") // yellow
  case object Error extends Level("ERROR", "[31m") // red
  case object Fatal extends Level("FATAL", "[35m") // magenta

  private val colorReset = "[0m"
  private val tsFormat =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneId.systemDefault())

  /** One formatted console line: `ts [LEVEL] msg` — level colored when
    * the sink is a color terminal (reference `i18n.go:192-208`). */
  def logLine(level: Level, msg: String, color: Boolean = false,
              now: () => Instant = () => Instant.now()): String = {
    val ts = tsFormat.format(now())
    if (color) s"$ts ${level.color}[${level.name}]$colorReset $msg"
    else s"$ts [${level.name}] $msg"
  }
}
