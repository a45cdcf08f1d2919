package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MySqlDateFormat

class MySqlDateFormatSpec extends AnyFunSuite {
  test("basic date pattern") {
    assert(MySqlDateFormat.translate("%Y-%m-%d") == "yyyy-MM-dd")
  }
  test("datetime pattern with minutes vs months disambiguated") {
    assert(MySqlDateFormat.translate("%Y-%m-%d %H:%i:%s") == "yyyy-MM-dd HH:mm:ss")
  }
  test("literal text is quoted") {
    assert(MySqlDateFormat.translate("day %d of %M") == "'day 'dd' of 'MMMM")
  }
  test("escaped percent") {
    // `a`/`t` are JDK pattern letters (AM/PM marker, …), so literal text
    // containing letters must come out quoted — unquoted "100% at HH"
    // would parse `a` as AM/PM.
    assert(MySqlDateFormat.translate("100%% at %H") == "'100% at 'HH")
  }
  test("round-trip through JDK formatter proves quoting") {
    val jdk = MySqlDateFormat.translate("100%% at %H")
    val f = java.time.format.DateTimeFormatter.ofPattern(jdk)
    val out = f.format(java.time.LocalDateTime.of(2024, 1, 2, 13, 4, 5))
    assert(out == "100% at 13")
  }
  test("unmapped specifiers refuse loudly instead of emitting literal %X text") {
    val e = intercept[RuntimeException](MySqlDateFormat.translate("%Y-%U"))
    assert(e.getMessage.contains("%U"), e.getMessage)
    intercept[RuntimeException](MySqlDateFormat.translate("%w"))
  }

  test("12-hour clock") {
    assert(MySqlDateFormat.translate("%h:%i %p") == "hh:mm a")
  }
}
