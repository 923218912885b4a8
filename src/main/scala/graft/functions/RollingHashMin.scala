package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** `rolling_hash_min(text, k)` — minimum Rabin-Karp window hash over
  * all k-byte windows of a string: the classic winnowing document
  * fingerprint (bottom-1 sketch of the window-hash set).
  *
  * Window hash of bytes c_0..c_{k-1} (oldest highest power):
  * Σ_j c_j · B^(k-1-j) mod P, with B = 257, P = 1_000_003. The
  * expression computes it with the O(1) rolling update
  * h ← (h − c_out·B^(k-1))·B + c_in mod P — one pass over the string
  * per row, codegen'd; an equivalent SQL oracle can recompute each
  * window independently (O(len·k), same values).
  *
  * Strings shorter than k hash their full length (single window).
  * k must be a foldable positive integer.
  */
case class RollingHashMin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!(left.dataType == StringType && right.dataType == IntegerType && right.foldable))
      TypeCheckResult.TypeCheckFailure(
        "rolling_hash_min requires (STRING, foldable INT)")
    else right.eval() match {
      // enforce the documented contract at analysis time instead of
      // silently clamping at eval time
      case k: Int if k > 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "rolling_hash_min requires k to be a positive non-null INT literal")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash_min"

  private val B = 257L
  private val P = 1000003L

  override def nullSafeEval(s: Any, kAny: Any): Any = {
    val bytes = s.asInstanceOf[UTF8String].getBytes
    val k = math.max(1, math.min(kAny.asInstanceOf[Int], bytes.length))
    if (bytes.isEmpty) return 0L
    // B^(k-1) mod P
    var bk = 1L
    var t = 0
    while (t < k - 1) { bk = bk * B % P; t += 1 }
    var h = 0L
    var minH = Long.MaxValue
    var i = 0
    while (i < bytes.length) {
      h = (h * B + (bytes(i) & 0xff)) % P
      if (i >= k) {
        // remove the byte that just left the window (already scaled by
        // B^k after this step's multiply → subtract c_out·B^k ≡ (c_out·bk·B)
        h = (h - (bytes(i - k) & 0xff) * bk % P * B % P + P * B) % P
      }
      if (i >= k - 1 && h < minH) minH = h
      i += 1
    }
    if (minH == Long.MaxValue) h else minH
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (str, kVal) => {
      val bytes = ctx.freshName("bytes")
      val k = ctx.freshName("k")
      val bk = ctx.freshName("bk")
      val h = ctx.freshName("h")
      val minH = ctx.freshName("minH")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      s"""
         |byte[] $bytes = $str.getBytes();
         |int $k = java.lang.Math.max(1, java.lang.Math.min($kVal, $bytes.length));
         |long $bk = 1L;
         |for (int $t = 0; $t < $k - 1; $t++) { $bk = $bk * 257L % 1000003L; }
         |long $h = 0L;
         |long $minH = java.lang.Long.MAX_VALUE;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 257L + ($bytes[$i] & 0xff)) % 1000003L;
         |  if ($i >= $k) {
         |    $h = ($h - ($bytes[$i - $k] & 0xff) * $bk % 1000003L * 257L % 1000003L
         |          + 1000003L * 257L) % 1000003L;
         |  }
         |  if ($i >= $k - 1 && $h < $minH) { $minH = $h; }
         |}
         |${ev.value} = ($bytes.length == 0) ? 0L : (($minH == java.lang.Long.MAX_VALUE) ? $h : $minH);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingHashMin =
    copy(left = newLeft, right = newRight)
}
