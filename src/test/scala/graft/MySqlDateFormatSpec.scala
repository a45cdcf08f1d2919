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
    assert(MySqlDateFormat.translate("100%% at %H") == "100% at HH")
  }
  test("12-hour clock") {
    assert(MySqlDateFormat.translate("%h:%i %p") == "hh:mm a")
  }
}
