package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level kernel for the portable 32-bit hash: first 4 bytes of the md5
  * digest, big-endian — numerically identical to parsing the first 8 hex
  * chars of the md5 string (`('0x' || substr(md5(x),1,8))::BIGINT` in
  * DuckDB), without materializing the 32-char hex string, the substring,
  * or conv's base-16 parse. */
object H32Digest {
  private val md = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  def h32(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
  }
}

/** Native codegen form of Portable.h32 (same preference-order-(b) rationale
  * as DotI64): the hash sits in the per-row hot path of every dedup /
  * LSH / fingerprint / split operator, and the built-in composition
  * `conv(substring(md5(x),1,8),16,10)` allocates three strings per row.
  * This emits one static call on the raw UTF-8 bytes. */
case class H32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"h32 requires a string input, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "h32"

  override def nullSafeEval(input: Any): Any =
    H32Digest.h32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H32Digest.h32($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object H32 {
  /** Column API entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(H32(ColumnBridge.expression(c)))
}
