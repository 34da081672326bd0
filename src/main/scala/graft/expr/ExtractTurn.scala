package graft.expr

import graft.kernel.Extractor
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel bridge: UTF8String payload -> InternalRow of the
  * extraction result. Kept as a plain static call so ExtractTurn's
  * doGenCode can invoke it from inside whole-stage codegen — the
  * reference's compiled fast path (db_postprocess_fast/__init__.py:7-22,
  * C++ boxes_from_bitmap) recast as a codegen-reachable JVM kernel
  * instead of JNI.
  */
object ExtractTurnKernel {

  val spanType: StructType = StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false),
    StructField("kind", StringType, nullable = false)))

  val blockType: StructType = StructType(Seq(
    StructField("span", spanType, nullable = false),
    StructField("btype", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("text", StringType, nullable = false)))

  val outType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("spans", ArrayType(spanType, containsNull = false), nullable = false),
    StructField("blocks", ArrayType(blockType, containsNull = false), nullable = false),
    StructField("ok", BooleanType, nullable = false)))

  // kind/btype values come from a tiny closed set — intern the UTF8String
  // constants instead of re-encoding per row (hot path)
  private val interned: Map[String, UTF8String] =
    Seq("html", "pdf", "json", "plain", "empty", "main", "title", "code",
      "boiler").map(s => s -> UTF8String.fromString(s)).toMap
  private def u8(s: String): UTF8String =
    interned.getOrElse(s, UTF8String.fromString(s))

  def eval(payload: UTF8String): InternalRow = eval(payload, 0)

  def eval(payload: UTF8String, variant: Int): InternalRow = {
    val r = Extractor.extract(
      if (payload == null) null else payload.toString,
      graft.kernel.ExtractParams.forVariant(variant))
    val spans = new GenericArrayData(r.spans.map { s =>
      InternalRow(s.start, s.end, u8(s.kind))
    }.asInstanceOf[Array[Any]])
    val blocks = new GenericArrayData(r.blocks.map { b =>
      InternalRow(
        InternalRow(b.span.start, b.span.end, u8(b.span.kind)),
        u8(b.btype),
        b.score,
        UTF8String.fromString(b.text))
    }.asInstanceOf[Array[Any]])
    InternalRow(
      u8(r.kind),
      UTF8String.fromString(r.text),
      spans,
      blocks,
      r.ok)
  }
}

/** extract_turn(text) — the whole per-turn extractor (sniff -> tokenize ->
  * segment -> classify -> decode -> reading order) as ONE Catalyst
  * expression over StringType, returning a nested struct
  * (kind, text, spans, blocks). Registered in graft.expr.Functions so it
  * is usable from both the Column API and SQL. doGenCode emits a direct
  * static call, keeping the surrounding projection in whole-stage codegen.
  */
case class ExtractTurn(child: Expression, variant: Int = 0)
    extends UnaryExpression {

  override def dataType: DataType = ExtractTurnKernel.outType
  override def nullable: Boolean = false
  override def prettyName: String =
    if (variant == 0) "extract_turn" else s"extract_turn_v$variant"

  override def eval(input: InternalRow): Any =
    ExtractTurnKernel.eval(
      child.eval(input).asInstanceOf[UTF8String], variant)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val rowCls = classOf[InternalRow].getName
    val utf8Cls = classOf[UTF8String].getName
    val kernel = "graft.expr.ExtractTurnKernel$.MODULE$"
    val resultCode =
      code"""
        ${childGen.code}
        $rowCls ${ev.value} = $kernel.eval(
          ${childGen.isNull} ? ($utf8Cls) null : ${childGen.value}, $variant);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
