package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the wide language ID — the composed Column form
  * (26 per-script regexp_replace counts + 36 array_intersect stopword
  * hits + two 62-way CASE chains in one projection) exceeds janino's
  * method limits, so whole-stage codegen SILENTLY fell back to
  * interpreted evaluation with no subexpression reuse: 13 s for 5 000
  * docs. This expression does the same arithmetic the obvious way —
  * ONE pass over the characters classifying all 26 scripts at once,
  * ONE token-set build probed by all 360 stopwords — and returns in
  * milliseconds. Semantics are IDENTICAL to
  * [[graft.functions.TextAnalysis]]'s constants and rules (script
  * dominance `sMax·10 ≥ nonWs·3` on integer counts, stopword argmax
  * with lang-ascending ties, confidence = round(ratio, 4) exactly like
  * Spark's `round`), which the composed form and the generated DuckDB
  * oracle both replay — the spec asserts native ≡ composed.
  *
  * Inputs: (text string, toks array<string>) — the token array comes
  * from the shared tokenizer EXPRESSION so tokenization stays
  * bit-identical to every other text operator. Whitespace for the
  * non-whitespace denominator is Java regex `\s` = [ \t\n\x0B\f\r],
  * matching the column form it replaces. Null text → null struct.
  */
case class LangIdWide(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LangIdWide.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"${LangIdWide.FunctionName} expects (string, array<string>), " +
          s"got ${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(t: Any, tk: Any): Any =
    LangIdWide.evalLang(t.asInstanceOf[UTF8String], tk.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, tk) => {
      s"""
         |${ev.value} = graft.expr.LangIdWide.evalLang($t, $tk);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LangIdWide =
    copy(left = newLeft, right = newRight)
}

object LangIdWide {
  val FunctionName = "graft_lang_id_wide"

  val Schema: StructType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("confidence", DoubleType, nullable = false)))

  // Single source of truth: the tables compile from TextAnalysis's
  // public constants, so the column form, this kernel and the
  // generated oracle can never drift.
  private lazy val scriptLangs: Array[String] =
    graft.functions.TextAnalysis.ScriptRanges.map(_._1).toArray
  private lazy val scriptLo: Array[Char] =
    graft.functions.TextAnalysis.ScriptRanges.map(_._2.charAt(0)).toArray
  private lazy val scriptHi: Array[Char] =
    graft.functions.TextAnalysis.ScriptRanges.map(_._2.charAt(2)).toArray
  private lazy val stopLangs: Array[String] =
    graft.functions.TextAnalysis.WideStopwordLists.map(_._1).toArray
  private lazy val stopWords: Array[Array[String]] =
    graft.functions.TextAnalysis.WideStopwordLists
      .map(_._2.toArray).toArray

  /** EXACTLY Spark's `round(col, 4)` on DoubleType (RoundBase). */
  private def round4(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Java regex \s: [ \t\n\x0B\f\r] — the set the column form used. */
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 11 || cp == '\f' ||
      cp == '\r'

  /** Named evalLang, NOT eval: the companion CLASS inherits
    * Expression.eval(InternalRow), and scalac suppresses a static
    * forwarder whenever the class has ANY member of the same name —
    * generated code calling `LangIdWide.eval(t, tk)` then fails
    * janino compilation and the whole stage silently drops to
    * interpreted evaluation (the exact failure mode this kernel
    * exists to avoid, rediscovered one level down).
    */
  def evalLang(text: UTF8String, toks: ArrayData): InternalRow = {
    val s = text.toString
    // one pass BY CODE POINT: the composed form's counts come from
    // Spark length()/regexp (code-point semantics), so a surrogate
    // pair must count as ONE non-ws character, not two — a
    // charAt-based loop diverges from the composed form and the
    // oracle on any emoji/astral-CJK text. Script ranges are BMP, so
    // supplementary code points can only feed the denominator.
    val sc = new Array[Int](scriptLangs.length)
    var nonWs = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (!isWs(cp)) nonWs += 1
      if (cp <= 0xFFFF) {
        val c = cp.toChar
        var k = 0
        var hit = false
        while (k < sc.length && !hit) {
          if (c >= scriptLo(k) && c <= scriptHi(k)) { sc(k) += 1; hit = true }
          k += 1
        }
      }
      i += Character.charCount(cp)
    }
    var sMax = 0; var sArg = -1
    var k = 0
    while (k < sc.length) {
      // strictly greater keeps the FIRST (lang-ascending) winner —
      // ScriptRanges is ordered by language code
      if (sc(k) > sMax) { sMax = sc(k); sArg = k }
      k += 1
    }
    if (sMax > 0 && sMax.toLong * 10 >= nonWs.toLong * 3)
      return new GenericInternalRow(Array[Any](
        UTF8String.fromString(scriptLangs(sArg)),
        round4(sMax.toDouble / nonWs)))
    // stopword tier: one token-set build, 360 probes. DISTINCT
    // stopword hits (array_intersect semantics) — set membership per
    // listed word, each word counted once.
    val n = toks.numElements()
    val set = new java.util.HashSet[String](math.max(n * 2, 4))
    i = 0
    while (i < n) { set.add(toks.getUTF8String(i).toString); i += 1 }
    var hMax = 0; var hArg = -1
    k = 0
    while (k < stopLangs.length) {
      val ws = stopWords(k)
      var hits = 0
      var j = 0
      while (j < ws.length) { if (set.contains(ws(j))) hits += 1; j += 1 }
      if (hits > hMax) { hMax = hits; hArg = k } // first wins ties (asc)
      k += 1
    }
    if (hMax == 0)
      new GenericInternalRow(Array[Any](UTF8String.fromString("und"), 0.0))
    else
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(stopLangs(hArg)),
        round4(hMax.toDouble / math.max(n, 1))))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, exprs => LangIdWide(exprs(0), exprs(1)), "built-in")
}
