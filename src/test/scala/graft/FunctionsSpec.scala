package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.{Cleansing, Occ, YearAttach}

/** OCC decode (P2), trunc/sentinel cleansing (§2.6), year attachment —
  * the spec tables come straight from the reference
  * (transform-load.rkt:49-71; transform-load.2025-08-19.rkt:228-240,
  * 327-417). */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("OCC decode: underlying/expiration/side/strike") {
    val df = Seq("AAPL  240119C00185000", "BRK.B 251219P00410500")
      .toDF("code")
      .select(Occ.underlying($"code").as("u"), Occ.expiration($"code").as("e"),
        Occ.side($"code").as("s"), Occ.strike($"code").as("k"))
    val r = rows(df)
    assert(r(0).getString(0) == "AAPL")
    assert(r(0).getDate(1) == d("2024-01-19"))
    assert(r(0).getString(2) == "Call")
    assertDecEq(r(0).getDecimal(3), "185")
    assert(r(1).getString(0) == "BRK.B")
    assert(r(1).getDate(1) == d("2025-12-19"))
    assert(r(1).getString(2) == "Put")
    assertDecEq(r(1).getDecimal(3), "410.5")
  }

  test("truncTo truncates toward zero, not half-up") {
    val df = Seq("1.23456", "-1.23456", "0.99999", "-0.99999")
      .toDF("s").select(Cleansing.truncTo($"s".cast(DecimalType(18, 5)), 4)
        .cast(DecimalType(18, 4)).as("t"))
    val r = rows(df).map(_.getDecimal(0))
    assertDecEq(r(0), "1.2345")
    assertDecEq(r(1), "-1.2345")
    assertDecEq(r(2), "0.9999")
    assertDecEq(r(3), "-0.9999")
  }

  test("null sentinels: N/A and 0.00 null out; comma/pct stripped") {
    val df = Seq("N/A", "0.00", "1,234.56%", "12.5")
      .toDF("s").select(Cleansing.nullSentinels($"s", Seq("N/A", "0.00"))
        .cast(DecimalType(18, 4)).as("v"))
    val r = rows(df).map(_.getDecimal(0))
    assert(r(0) == null && r(1) == null)
    assertDecEq(r(2), "1234.56")
    assertDecEq(r(3), "12.5")
  }

  test("symbol remap: BRKB/RDSA hard cases, / becomes .") {
    val df = Seq("BRKB", "RDSA", "BRK/B", "AAPL").toDF("s")
      .select(Cleansing.remapSymbol($"s").as("r"))
    assert(rows(df).map(_.getString(0)) == Seq("BRK.B", "RDS.A", "BRK.B", "AAPL"))
  }

  test("year attachment: (target-1y, target] binds this year, else prior") {
    val df = Seq(
      ("05-Mar", "2024-01-15"), // Mar 5 this year is after target → prior
      ("05-Jan", "2024-01-15"), // Jan 5 this year ≤ target → this year
      ("15-Jan", "2024-01-15"), // exactly target → this year
      ("29-Feb", "2024-03-15"), // 29-Feb always coerced to 28-Feb
      ("29-Feb", "2024-01-15")  // …and bound to prior (non-leap) year
    ).toDF("dm", "t")
      .select(YearAttach.attachYear($"dm", to_date($"t")).as("r"))
    val r = rows(df).map(_.getDate(0))
    assert(r == Seq(d("2023-03-05"), d("2024-01-05"), d("2024-01-15"),
      d("2024-02-28"), d("2023-02-28")))
  }

  test("sentinel page detection") {
    val df = Seq("all good <table>", "... No Options found ...",
      "Server too busy. Try it later.").toDF("page")
      .select(Cleansing.isSentinelPage($"page").as("b"))
    assert(rows(df).map(_.getBoolean(0)) == Seq(false, true, true))
  }
}
