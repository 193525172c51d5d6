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

  test("streaming scd2 incremental batches match a driver model, replays inert (5 trials)") {
    import graft.streaming.StreamingIngest
    for (trial <- 1 to 5) {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft-scd2prop$trial").toString
      val path = s"$tmp/table"
      val nBatches = 3 + rnd.nextInt(3)
      // per-batch unique keys (the sink's documented precondition)
      val batches = List.fill(nBatches)(
        randomRows(6).groupBy(_._1).map(_._2.head).toList)
      val tss = (1 to nBatches).map(i =>
        java.sql.Timestamp.valueOf(f"2024-01-0$i%d 00:00:00"))

      // driver model: key -> versions (value, start, end, current)
      val model = scala.collection.mutable.Map
        .empty[String, List[(String, java.sql.Timestamp,
          Option[java.sql.Timestamp], Int)]]
      batches.zipWithIndex.foreach { case (batch, i) =>
        val ts = tss(i)
        // notesCol=None: no notes-carrying, so the driver model is a
        // pure last-writer-wins version history
        StreamingIngest.scd2MergeBatch(path,
          batch.toDF("link", "payload", "notes"), "link",
          Seq("payload", "notes"), ts, notesCol = None)
        batch.foreach { case (k, v, n) =>
          val versions = model.getOrElse(k, Nil)
          versions.find(_._4 == 1) match {
            case Some(cur @ (value, start, _, _)) =>
              if (value != s"$v|$n") // change: expire + new current
                model(k) = (s"$v|$n", ts, None, 1) ::
                  (value, start, Some(ts), 0) :: versions.filterNot(_ == cur)
            case None => model(k) = List((s"$v|$n", ts, None, 1))
          }
        }
        // a foreachBatch retry replays the SAME batch + ts: inert
        if (rnd.nextBoolean()) {
          StreamingIngest.scd2MergeBatch(path,
            batch.toDF("link", "payload", "notes"), "link",
            Seq("payload", "notes"), ts, notesCol = None)
        }
      }
      val got = spark.read.parquet(path)
        .select($"link", concat_ws("|", $"payload", $"notes"),
          $"effective_start", $"effective_end", $"current_flag")
        .as[(String, String, java.sql.Timestamp, Option[java.sql.Timestamp], Int)]
        .collect().toList
        .map { case (k, v, s, e, c) => (k, v, s, e, c) }.sorted
      val expected = model.toList.flatMap { case (k, versions) =>
        versions.map { case (v, s, e, c) => (k, v, s, e, c) }
      }.sorted
      assert(got == expected, s"trial $trial:\ngot      $got\nexpected $expected")
    }
  }
}
