package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for Reader helpers that the no-live-PG sandbox can't
  * drive end-to-end. */
class ReaderHelpersSpec extends AnyFunSuite {

  test("intBound: fractional bounds floor/ceil to enclosing integers") {
    assert(JdbcReader.intBound("12.3", up = false) == "12")
    assert(JdbcReader.intBound("12.3", up = true) == "13")
    assert(JdbcReader.intBound("-12.3", up = false) == "-13")
    assert(JdbcReader.intBound("-12.3", up = true) == "-12")
    assert(JdbcReader.intBound("42", up = true) == "42")
  }

  test("intBound: out-of-Long-range finite bounds clamp instead of overflowing") {
    // PG emits wide float8 as scientific notation; BigDecimal expands it
    assert(JdbcReader.intBound("1e+30", up = true) == Long.MaxValue.toString)
    assert(JdbcReader.intBound("-1e+30", up = false) == Long.MinValue.toString)
    // in-range values pass through untouched
    assert(JdbcReader.intBound(Long.MaxValue.toString, up = true)
      == Long.MaxValue.toString)
  }

  test("intBound: NaN/Infinity raise NumberFormatException for the fallback path") {
    intercept[NumberFormatException](JdbcReader.intBound("NaN", up = true))
    intercept[NumberFormatException](JdbcReader.intBound("Infinity", up = true))
    intercept[NumberFormatException](JdbcReader.intBound("-Infinity", up = false))
  }

  test("mentions: whole-identifier match only") {
    assert(DirListing.mentions("SELECT * FROM lineitem WHERE x=1", "lineitem"))
    assert(DirListing.mentions("select l.a from LINEITEM l", "lineitem"))
    // substring of a longer identifier must NOT match
    assert(!DirListing.mentions("SELECT * FROM lineitem_old", "lineitem"))
    assert(!DirListing.mentions("SELECT * FROM old_lineitem", "lineitem"))
    assert(!DirListing.mentions("SELECT * FROM items", "item"))
    // punctuation/quoting boundaries still match
    assert(DirListing.mentions("SELECT * FROM (lineitem)", "lineitem"))
    assert(DirListing.mentions("SELECT lineitem.a FROM lineitem", "lineitem"))
  }
}
