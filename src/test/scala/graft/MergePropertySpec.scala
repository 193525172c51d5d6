package graft

import graft.operators.Merges
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized invariants for the merge family (SURVEY §5.3): key
  * uniqueness after SCD1, exactly-one-current after SCD2, idempotence.
  * Seeded generation (no scalatestplus bridge in the offline cache).
  */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def randomRows(n: Int): List[(String, String, String)] =
    List.fill(n)((s"k${rnd.nextInt(8) + 1}", s"v${rnd.nextInt(100)}",
      Seq("", "note-a", "note-b")(rnd.nextInt(3))))

  private def dedup(rows: List[(String, String, String)]): DataFrame =
    Merges.dedupKeepLatest(rows.toDF("link", "payload", "notes"), "link",
      Seq(col("payload")))

  test("scd1 output has unique keys and loses no keys (10 random trials)") {
    for (_ <- 1 to 10) {
      val histRows = randomRows(12)
      val newRows = randomRows(12)
      val out = Merges.scd1(dedup(histRows), dedup(newRows), "link",
        Seq("payload")).cache()
      assert(out.groupBy("link").count().filter($"count" > 1).isEmpty)
      val outKeys = out.select("link").as[String].collect().toSet
      assert(outKeys == (histRows.map(_._1) ++ newRows.map(_._1)).toSet)
      out.unpersist()
    }
  }

  test("scd2 keeps at most one current per key; same-batch re-merge stable") {
    val batchTs = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    for (_ <- 1 to 10) {
      val histRows = randomRows(12)
      val newRows = randomRows(12)
      val hist = dedup(histRows)
        .withColumn("effective_start",
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
        .withColumn("effective_end", lit(null).cast("timestamp"))
        .withColumn("current_flag", lit(1))
      val nw = dedup(newRows)
      val out = Merges.scd2(hist, nw, "link", Seq("payload"), batchTs).cache()
      assert(out.filter($"current_flag" === 1)
        .groupBy("link").count().filter($"count" > 1).isEmpty)
      val currents = out.filter($"current_flag" === 1)
        .select("link").as[String].collect().toSet
      assert(newRows.map(_._1).toSet.subsetOf(currents))
      // re-merging the SAME batch is a no-op modulo nothing-changed rows
      val again = Merges.scd2(out, nw, "link", Seq("payload"),
        java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))
      assert(again.count() == out.count())
      out.unpersist()
    }
  }
}
