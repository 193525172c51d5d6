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

  // Two distinct failure shapes get the two error classes built-ins
  // raise for them (QueryCompilationErrors is private[sql], so the
  // exceptions are constructed with the same class + parameters here):
  // a non-foldable argument (column reference) → NON_FOLDABLE_ARGUMENT
  // with the REQUIRED type; a foldable argument of the wrong type (a
  // string or fractional literal, a NULL, an out-of-range long) →
  // DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE naming required vs actual.
  private def bad(fn: String, name: String, e: Expression): Nothing = {
    // an UNRESOLVED argument (analyzer hasn't bound the reference yet)
    // throws from dataType/foldable themselves — still report typed
    val foldable = try e.foldable catch { case _: Exception => false }
    val tpe = try e.dataType.catalogString catch { case _: Exception => "unresolved" }
    if (!foldable)
      throw new AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> s"`$fn`",
          "paramName" -> s"`$name`",
          "paramType" -> "\"INT\""))
    val inputSql = try e.sql catch { case _: Exception => e.toString }
    throw new AnalysisException(
      errorClass = "DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE",
      messageParameters = Map(
        "sqlExpr" -> s""""$fn"""",
        "paramIndex" -> s"`$name`",
        "requiredType" -> "\"INT\"",
        "inputSql" -> s""""$inputSql"""",
        "inputType" -> s""""$tpe""""))
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
