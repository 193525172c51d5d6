package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Micro-probe for the language-ID kernel's per-doc cost (dev tool,
  * the Mp3Probe pattern) — built to attribute q117's round-13
  * regression (0.43 → 0.60 s full-suite) after the 134 → 167
  * language widening. The kernel has two cost components:
  *
  *  1. a per-CHARACTER script-range scan (linear in text length,
  *     constant ∝ ranges scanned before the first hit);
  *  2. for Latin text (no script dominance) a per-DOC stopword
  *     sweep — fixed cost ∝ total stopwords across all listed
  *     languages, independent of text length.
  *
  * The widening grew both tables, so the probe separates the two:
  * latin-text timings across lengths give the linear slope and the
  * fixed intercept; a CJK arm (script tier exits before stopwords)
  * isolates the scan.
  */
object LangIdProbe {
  def main(args: Array[String]): Unit = {
    def latin(words: Int): (UTF8String, GenericArrayData) = {
      val ws = Array.tabulate(words)(i =>
        Seq("the", "quick", "brown", "fox", "jumped", "over", "lazy",
          "dogs", "while", "seven")(i % 10))
      (UTF8String.fromString(ws.mkString(" ")),
        new GenericArrayData(ws.map(UTF8String.fromString(_)
          .asInstanceOf[Any])))
    }
    def cjk(chars: Int): (UTF8String, GenericArrayData) = {
      val s = new StringBuilder
      var i = 0
      while (i < chars) { s.append((0x4E00 + i % 512).toChar); i += 1 }
      (UTF8String.fromString(s.toString),
        new GenericArrayData(Array[Any](UTF8String.fromString("x"))))
    }
    def bench(name: String, t: UTF8String, toks: GenericArrayData,
        n: Int): Double = {
      var i = 0
      while (i < n / 5) { graft.expr.LangIdWide.evalLang(t, toks); i += 1 }
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { graft.expr.LangIdWide.evalLang(t, toks); i += 1 }
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"[langid] $name%-28s ${us}%9.2f us/doc ($n reps)")
      us
    }
    val (t1, k1) = latin(5)
    val (t2, k2) = latin(50)
    val (t3, k3) = latin(500)
    val a = bench("latin 5 words (~30 ch)", t1, k1, 20000)
    val b = bench("latin 50 words (~300 ch)", t2, k2, 20000)
    val c = bench("latin 500 words (~3000 ch)", t3, k3, 4000)
    val (c1, ck1) = cjk(300)
    val d = bench("cjk 300 chars (script tier)", c1, ck1, 20000)
    // linear slope from the latin lengths; intercept ≈ the fixed
    // stopword sweep the widening grew
    val slopePerChar = (c - b) / (3000 - 300)
    val intercept = b - slopePerChar * 300
    println(f"[langid] slope ${slopePerChar * 1000}%.2f ns/char, " +
      f"fixed (stopword sweep + setup) ≈ $intercept%.2f us/doc; " +
      f"cjk fixed-free arm $d%.2f us/doc")
  }
}
