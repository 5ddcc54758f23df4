package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** OCC option-symbol encode/decode (reference: transform-load.rkt:49-56
  * patterns; decode at :69-71). An OCC code is
  * `UNDERLYING yyMMdd C|P strike×1000 (8 digits)` e.g.
  * `AAPL  240119C00185000`.
  */
object Occ {

  /** The reference's pattern, transform-load.rkt:49-56. */
  val pattern = "([0-9A-Z.]+) *([0-9]{6})([CP])([0-9]{8})"

  def underlying(c: Column): Column = regexp_extract(c, pattern, 1)

  /** Expiration date. The reference parses `yyMMdd` (transform-load.rkt:69);
    * listed options always expire 20xx so we pin the century explicitly
    * rather than relying on a parser's pivot year. */
  def expiration(c: Column): Column = {
    val d = regexp_extract(c, pattern, 2)
    make_date(substring(d, 1, 2).cast("int") + 2000,
      substring(d, 3, 2).cast("int"), substring(d, 5, 2).cast("int"))
  }

  def side(c: Column): Column =
    Cleansing.sideDecode(regexp_extract(c, pattern, 3))

  /** Strike = code / 1000 exactly (reference: transform-load.rkt:70). */
  def strike(c: Column): Column =
    (regexp_extract(c, pattern, 4).cast(DecimalType(18, 0)) /
      lit(BigDecimal(1000))).cast(DecimalType(38, 4))

  /** Decode to a struct of all four fields. */
  def decode(c: Column): Column =
    struct(underlying(c).as("underlying"), expiration(c).as("expiration"),
      side(c).as("side"), strike(c).as("strike"))
}
