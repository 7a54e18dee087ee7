package graft.plans

import graft.functions.H32
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression,
  IntegerLiteral, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** Catalyst optimizer rule: rewrite the built-in "portable 32-bit hash"
  * composition `CAST(conv(substring(md5(x), 1, 8), 16, 10) AS BIGINT)` into
  * the native codegen kernel [[graft.functions.H32]] (value-identical —
  * H32Spec; three fewer per-row string allocations).
  *
  * This is the SparkSessionExtensions integration path (SURVEY §7.4
  * preference (c)): a user writing the hash in plain SQL — e.g. ported
  * verbatim from the DuckDB oracle dialect — gets the native kernel
  * without changing their query. The match is deliberately exact; any
  * other conv/md5 use is left untouched.
  */
object NativeHashRewrite extends Rule[LogicalPlan] {

  private object StringInput {
    /** md5's analyzer-inserted cast to binary, over a string child. */
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(child, BinaryType, _, _) if child.dataType.isInstanceOf[StringType] =>
        Some(child)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case original @ Cast(conv: Conv, LongType, _, _)
          if isLit(conv.fromBaseExpr, 16) && isLit(conv.toBaseExpr, 10) =>
        conv.numExpr match {
          case Substring(Md5(StringInput(str)), IntegerLiteral(1), IntegerLiteral(8)) =>
            H32(str)
          case _ => original
        }
    }

  private def isLit(e: Expression, v: Int): Boolean = e match {
    case IntegerLiteral(x) => x == v
    case _ => false
  }
}

/** Entry point for `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Installs (a) the NativeHashRewrite optimizer rule and (b) the native
  * kernels as SQL-callable functions — `SELECT h32(text)`,
  * `SELECT dot_i64(qa, qb)` — so pure-SQL users (spark-sql shell, JDBC,
  * views) reach the codegen Expressions without any Scala import. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => NativeHashRewrite)
    extensions.injectFunction((
      new FunctionIdentifier("h32"),
      new ExpressionInfo(classOf[H32].getName, "h32"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "h32(str) takes exactly one argument")
        H32(args.head)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("dot_i64"),
      new ExpressionInfo(classOf[graft.functions.DotI64].getName, "dot_i64"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_i64(a, b) takes exactly two arguments")
        graft.functions.DotI64(args.head, args.last)
      }))
  }
}
