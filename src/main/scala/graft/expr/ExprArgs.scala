package graft.expr

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Shared guard for scalar-literal function arguments (grid sizes,
  * shingle widths, sketch parameters): the function-builder lambdas
  * evaluate these at resolution time, so an unguarded
  * `eval().asInstanceOf[Number]` surfaces a column reference or a
  * string literal as a raw ClassCastException/NullPointerException
  * mid-analysis. These helpers check foldability and integral type
  * FIRST and raise the typed AnalysisException (with the function and
  * parameter names) analysis is supposed to produce.
  */
private[graft] object ExprArgs {

  // NON_FOLDABLE_ARGUMENT is the standard class built-ins raise for
  // exactly this shape (QueryCompilationErrors is private[sql], so the
  // exception is constructed with the same class + parameters here)
  private def bad(fn: String, name: String, e: Expression): Nothing = {
    // an UNRESOLVED argument (analyzer hasn't bound the reference yet)
    // throws from dataType itself — still report the typed error
    val tpe = try e.dataType.catalogString catch { case _: Exception => "unresolved" }
    throw new AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map(
        "funcName" -> s"`$fn`",
        "paramName" -> s"`$name`",
        "paramType" -> s""""$tpe""""))
  }

  private def eval(fn: String, name: String, e: Expression): Long = {
    val ok = try {
      (e.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }) && e.foldable
    } catch { case _: Exception => false } // unresolved argument
    if (!ok) bad(fn, name, e)
    e.eval() match {
      case n: Number => n.longValue()
      case _ => bad(fn, name, e) // a foldable NULL literal of integral type
    }
  }

  def intLit(fn: String, name: String, e: Expression): Int = {
    val v = eval(fn, name, e)
    if (v < Int.MinValue || v > Int.MaxValue) bad(fn, name, e)
    v.toInt
  }

  def longLit(fn: String, name: String, e: Expression): Long =
    eval(fn, name, e)
}
