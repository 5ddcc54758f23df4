package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session via getOrCreate). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def res(path: String): String =
    getClass.getClassLoader.getResource(path).getPath

  def d(s: String): java.sql.Date = java.sql.Date.valueOf(s)

  def dec(s: String): java.math.BigDecimal = new java.math.BigDecimal(s)

  def assertDecEq(got: java.math.BigDecimal, exp: String): Unit = {
    assert(got != null && got.compareTo(dec(exp)) == 0,
      s"expected $exp, got $got")
  }

  def rows(df: DataFrame): Seq[org.apache.spark.sql.Row] =
    df.collect().toSeq
}
