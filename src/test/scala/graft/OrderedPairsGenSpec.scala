package graft

import org.apache.spark.sql.functions._

/** Focused equivalence spec for the r16 lazy pair generator
  * (expr/OrderedPairsGen): `graft_pairs_gen(xs)` must generate exactly
  * the rows `explode(graft_pairs(xs))` produced — same pairs, same
  * order semantics (order is only observable through collect here;
  * every engine consumer aggregates) — while yielding through a reused
  * mutable row. The buffering-consumer contract (operators that buffer
  * must copy) is exercised explicitly with distinct/groupBy/sort
  * downstreams, which is where a broken row-reuse would corrupt
  * results.
  */
class OrderedPairsGenSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(77)

  test("graft_pairs_gen ≡ explode(graft_pairs) on random id lists") {
    for (_ <- 1 to 20) {
      val n = rnd.nextInt(10)
      val ids = Seq.fill(n)(rnd.nextInt(6).toLong)
      val df = Seq(Tuple1(ids)).toDF("_ids")
      val viaGen = df.select(call_function(
          graft.expr.OrderedPairsGen.FunctionName, col("_ids")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val viaEager = df.select(explode(call_function(
          graft.expr.OrderedPairs.FunctionName, col("_ids"))).as("_p"))
        .select(col("_p.id1"), col("_p.id2"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(viaGen == viaEager, s"ids=$ids")
    }
  }

  test("null and short arrays generate nothing; null slots are skipped") {
    val df = Seq(
      (1L, null.asInstanceOf[Seq[java.lang.Long]]),
      (2L, Seq.empty[java.lang.Long]),
      (3L, Seq[java.lang.Long](7L)),
      (4L, Seq[java.lang.Long](null, 5L, null, 9L))
    ).toDF("k", "_ids")
    val out = df.select(col("k"), call_function(
        graft.expr.OrderedPairsGen.FunctionName, col("_ids")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((4L, 5L, 9L)))
  }

  test("buffering consumers see distinct values, not one reused row") {
    // one 6-element list → 15 distinct pairs; a broken reused-row
    // yield would collapse them to one repeated value under distinct
    val df = Seq(Tuple1((1L to 6L))).toDF("_ids")
    val pairs = df.select(call_function(
        graft.expr.OrderedPairsGen.FunctionName, col("_ids")))
    assert(pairs.distinct().count() == 15)
    val grouped = pairs.groupBy("id1").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(grouped == Map(1L -> 5L, 2L -> 4L, 3L -> 3L, 4L -> 2L, 5L -> 1L))
    val sorted = pairs.orderBy(col("id1").desc, col("id2").desc)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sorted.head == ((5L, 6L)) && sorted.last == ((1L, 2L)))
  }
}
