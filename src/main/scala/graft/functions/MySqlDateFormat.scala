package graft.functions

/** Translates MySQL `DATE_FORMAT` strftime-style patterns (`%Y-%m-%d`) to
  * Spark/JDK `DateTimeFormatter` patterns (`yyyy-MM-dd`).
  *
  * The reference forwards transform expressions verbatim to the source
  * database, so configs use MySQL's pattern dialect
  * (reference: `configs/config.yaml:17` uses `DATE_FORMAT(created_at,
  * '%Y-%m-%d')`). Our expression engine is Catalyst, whose `date_format`
  * expects JDK patterns — this mapper bridges the dialect (SURVEY §7.4.3).
  */
object MySqlDateFormat {
  private val mapping: Map[Char, String] = Map(
    'Y' -> "yyyy", // 4-digit year
    'y' -> "yy",   // 2-digit year
    'm' -> "MM",   // month 01-12
    'c' -> "M",    // month 1-12
    'd' -> "dd",   // day 01-31
    'e' -> "d",    // day 1-31
    'H' -> "HH",   // hour 00-23
    'k' -> "H",    // hour 0-23
    'h' -> "hh",   // hour 01-12
    'l' -> "h",    // hour 1-12
    'i' -> "mm",   // minutes
    's' -> "ss",   // seconds
    'S' -> "ss",   // seconds (MySQL alias)
    'f' -> "SSSSSS", // microseconds
    'p' -> "a",    // AM/PM
    'M' -> "MMMM", // month name
    'b' -> "MMM",  // abbreviated month name
    'W' -> "EEEE", // weekday name
    'a' -> "EEE",  // abbreviated weekday name
    'j' -> "DDD",  // day of year
    'T' -> "HH:mm:ss",
    'r' -> "hh:mm:ss a")

  /** `%Y-%m-%d` → `yyyy-MM-dd`. Literal text between specifiers is quoted
    * when it contains JDK pattern letters so it passes through verbatim. */
  def translate(mysqlPattern: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = {
      if (lit.nonEmpty) {
        val s = lit.toString
        if (s.exists(c => c.isLetter)) out.append("'").append(s.replace("'", "''")).append("'")
        // a lone quote in an UNQUOTED literal still starts a quoted
        // section in JDK patterns — double it here too
        else out.append(s.replace("'", "''"))
        lit.clear()
      }
    }
    var i = 0
    while (i < mysqlPattern.length) {
      val c = mysqlPattern.charAt(i)
      if (c == '%' && i + 1 < mysqlPattern.length) {
        val spec = mysqlPattern.charAt(i + 1)
        if (spec == '%') { lit.append('%'); i += 2 }
        else mapping.get(spec) match {
          case Some(jdk) => flushLit(); out.append(jdk); i += 2
          // an unmapped specifier silently became literal "%U" text in
          // every output row — silent data corruption; refuse loudly
          // like the sibling codecs (the JDK pattern language has no
          // equivalent for some MySQL week/day specifiers)
          case None => sys.error(
            s"unsupported MySQL DATE_FORMAT specifier '%$spec' in " +
              s"'$mysqlPattern' — no JDK pattern equivalent is wired")
        }
      } else { lit.append(c); i += 1 }
    }
    flushLit()
    out.toString
  }
}
