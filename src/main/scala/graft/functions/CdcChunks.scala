package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** `cdc_chunks(text)` — content-defined chunking in one codegen'd pass:
  * splits the string wherever the Karp–Rabin polynomial of the trailing
  * 4-gram (base 131) ≡ 0 (mod 16) and returns the chunk array.
  *
  * This is q165's cut rule as a native expression: the higher-order
  * filter/transform formulation runs its lambda interpreted (~0.7 µs
  * per position — the whole-corpus scan was lambda-bound), while this
  * expression is one fused byte loop inside WholeStageCodegen. Byte-
  * oriented like the SQL `ord(substr(…))` oracle is char-oriented —
  * identical on the ASCII fixture corpus (asserted in
  * BoundaryMarginSpec's ASCII guard); multi-byte text would chunk on
  * byte grams, which is still a valid CDC rule, just a different one.
  *
  * Empty input yields a single empty chunk (matching the SQL
  * formulation's `[0] ∥ bounds ∥ [len]` cut list).
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("cdc_chunks requires STRING")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    val out = new java.util.ArrayList[UTF8String]()
    var prev = 0
    var i = 4
    while (i <= b.length - 1) { // 1-based boundary position i in [4, len-1]
      val h = (b(i - 4) & 0xff) * 2248091 + (b(i - 3) & 0xff) * 17161 +
        (b(i - 2) & 0xff) * 131 + (b(i - 1) & 0xff)
      if (h % 16 == 0) { out.add(UTF8String.fromBytes(b, prev, i - prev)); prev = i }
      i += 1
    }
    out.add(UTF8String.fromBytes(b, prev, b.length - prev))
    new GenericArrayData(out.toArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      val prev = ctx.freshName("prev")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $b = $str.getBytes();
         |java.util.ArrayList $out = new java.util.ArrayList();
         |int $prev = 0;
         |for (int $i = 4; $i <= $b.length - 1; $i++) {
         |  int $h = ($b[$i - 4] & 0xff) * 2248091 + ($b[$i - 3] & 0xff) * 17161
         |         + ($b[$i - 2] & 0xff) * 131 + ($b[$i - 1] & 0xff);
         |  if ($h % 16 == 0) {
         |    $out.add(org.apache.spark.unsafe.types.UTF8String.fromBytes($b, $prev, $i - $prev));
         |    $prev = $i;
         |  }
         |}
         |$out.add(org.apache.spark.unsafe.types.UTF8String.fromBytes($b, $prev, $b.length - $prev));
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}
