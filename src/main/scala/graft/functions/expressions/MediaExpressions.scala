package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface form of the media-header codec
  * ([[graft.ext.Multimodal.MediaCodec]]): parse a binary payload's
  * container header into a struct
  * (format, width, height, sample_rate, channels).
  *
  * Deliberately `CodegenFallback`: a byte-level segment scan has no
  * useful codegen form — the per-row cost IS the parse, exactly as in
  * the `mapPartitions` path ([[graft.ext.Multimodal.decodeMeta]]), but
  * as an expression it composes into any projection without the
  * serialize/deserialize fence a typed map needs. Null payloads parse
  * as "unknown" (the quarantine contract, FIXTURES.md §C).
  */
case class MediaMetaExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_media_meta expects BINARY, got ${child.dataType.sql}")
  override def prettyName: String = "graft_media_meta"
  override def nullable: Boolean = false

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType)))

  // null payload → "unknown" row, not a null struct: a corrupt blob is
  // a classified row, never a silent gap
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val bytes =
      if (v == null) Array.emptyByteArray else v.asInstanceOf[Array[Byte]]
    val m = graft.ext.Multimodal.MediaCodec.parseHeader(bytes)
    InternalRow(UTF8String.fromString(m.format),
      m.width.map(Int.box).orNull, m.height.map(Int.box).orNull,
      m.sampleRate.map(Int.box).orNull, m.channels.map(Int.box).orNull)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
