package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bit-parallel Levenshtein distance (Hyyrö's bit-vector formulation of
  * Myers' algorithm — "A Bit-Vector Algorithm for Computing Levenshtein
  * and Damerau Edit Distances", Hyyrö 2003; public literature). For
  * pattern length m ≤ 64 the whole dynamic-programming column packs
  * into one machine word and each text character costs ~a dozen bitwise
  * ops — ~20 word-ops total for d08's 20-char prefixes, where the
  * classic O(m·n) cell loop (Spark's built-in, ~3 µs/pair measured at
  * threshold 10) dominates that operator's runtime. Distances are over
  * CODE POINTS, matching Spark's and DuckDB's `levenshtein` exactly
  * (spec-pinned against the built-in on random + unicode strings);
  * strings beyond 64 code points fall back to the built-in kernel. */
object LevenshteinBpKernel {

  private def codePoints(s: UTF8String): Array[Int] = {
    val str = s.toString
    val out = new Array[Int](str.codePointCount(0, str.length))
    var i = 0
    var j = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    out
  }

  def dist(a: UTF8String, b: UTF8String): Int = {
    // Pattern = the shorter side (distance is symmetric); fall back to
    // the built-in cell DP when even the shorter side overflows a word.
    val (p, t) =
      if (a.numChars() <= b.numChars()) (a, b) else (b, a)
    val pa = codePoints(p)
    val m = pa.length
    if (m == 0) return codePoints(t).length
    if (m > 64) return a.levenshteinDistance(b)
    val ta = codePoints(t)
    // Peq: per distinct pattern code point, the bitmask of its positions.
    val peq = new java.util.HashMap[Integer, java.lang.Long](m * 2)
    var i = 0
    while (i < m) {
      peq.merge(pa(i), java.lang.Long.valueOf(1L << i),
        (x, y) => java.lang.Long.valueOf(x.longValue() | y.longValue()))
      i += 1
    }
    var vp = if (m == 64) -1L else (1L << m) - 1L
    var vn = 0L
    var dist = m
    val msb = 1L << (m - 1)
    var j = 0
    while (j < ta.length) {
      val pmBox = peq.get(ta(j))
      val pm = if (pmBox == null) 0L else pmBox.longValue()
      val d0 = (((pm & vp) + vp) ^ vp) | pm | vn
      var hp = vn | ~(d0 | vp)
      val hn = d0 & vp
      if ((hp & msb) != 0L) dist += 1
      if ((hn & msb) != 0L) dist -= 1
      hp = (hp << 1) | 1L
      val hnS = hn << 1
      vp = hnS | ~(d0 | hp)
      vn = d0 & hp
      j += 1
    }
    dist
  }
}

/** `levenshtein_bp(a, b)` — the full (unbounded) code-point Levenshtein
  * distance via the bit-parallel kernel. d08 computes it and filters at
  * the threshold; ≤-threshold distances equal the built-in's 3-arg
  * thresholded form by definition, so the oracle's plain levenshtein +
  * WHERE is unchanged. */
case class LevenshteinBp(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"levenshtein_bp requires two string inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "levenshtein_bp"

  override def nullSafeEval(a: Any, b: Any): Any =
    LevenshteinBpKernel.dist(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.LevenshteinBpKernel.dist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LevenshteinBp {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(LevenshteinBp(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
