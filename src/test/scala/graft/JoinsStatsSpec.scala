package graft

import graft.functions.Redact
import graft.operators.{Joins, Sessions, Sketches, Stats}
import org.apache.spark.sql.functions._

/** As-of join, binned range join, funnel, exact percentiles, PII
  * redaction.
  */
class JoinsStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tsv(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks the most recent right row at or before each left ts") {
    val trades = Seq(
      (1L, 10L, "2024-01-01 10:00:05", 100.0),
      (2L, 10L, "2024-01-01 10:00:30", 101.0),
      (3L, 20L, "2024-01-01 09:00:00", 50.0) // key with no quotes → nulls
    ).map { case (id, k, t, v) => (id, k, tsv(t), v) }
      .toDF("event_id", "user_id", "ts2", "value")
    val quotes = Seq(
      (10L, "2024-01-01 10:00:00", 1.0),
      (10L, "2024-01-01 10:00:05", 2.0), // exact tie with trade 1 → matches
      (10L, "2024-01-01 10:00:10", 3.0)
    ).map { case (k, t, v) => (k, tsv(t), v) }
      .toDF("user_id", "ts2", "quote")
    val got = Joins.asofJoin(trades, quotes, "user_id", "ts2", Seq("quote"))
      .select("event_id", "quote").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(1L -> Some(2.0), 2L -> Some(3.0), 3L -> None))
  }

  test("asofJoin plan has no nested-loop join") {
    val l = Seq((1L, 1L, tsv("2024-01-01 00:00:01"), 1.0))
      .toDF("event_id", "user_id", "ts2", "value")
    val r = Seq((1L, tsv("2024-01-01 00:00:00"), 2.0))
      .toDF("user_id", "ts2", "v")
    val plan = Joins.asofJoin(l, r, "user_id", "ts2", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("asofJoin equals the naive max-right-per-left lookup on random data") {
    val rnd = new scala.util.Random(42)
    def randTs() = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        rnd.nextInt(100000) * 1000L)
    val left = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(15) + 1).toLong, randTs(), rnd.nextDouble()))
      .toDF("event_id", "user_id", "ts2", "value")
    val rightRaw = (1 to 400).map(i =>
      ((rnd.nextInt(15) + 1).toLong, randTs(), i.toLong, rnd.nextDouble()))
      .toDF("user_id", "ts2", "rid", "v")
    val right = Joins.latestPerKeyTs(rightRaw, "user_id", "ts2", "rid", Seq("v"))
    val got = Joins.asofJoin(left, right, "user_id", "ts2", Seq("v"))
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id").orderBy(col("r_ts").desc_nulls_last)
    val naive = left.join(
        right.select(col("user_id").as("r_user"), col("ts2").as("r_ts"),
          col("v")),
        col("user_id") === col("r_user") && col("r_ts") <= col("ts2"),
        "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("v"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got == naive)
  }

  test("rangeJoinBinned equals the naive theta join, without a nested loop") {
    val points = (0 until 200).map(i => (i.toLong, i * 2.5)).toDF("id", "value")
    val intervals = Seq((0L, 10.0, 80.0), (1L, 75.0, 90.0), (2L, 400.0, 500.0))
      .toDF("band_id", "lo", "hi")
    val binned = Joins.rangeJoinBinned(points, "value", intervals, "lo", "hi", 30.0)
    val naive = points.join(intervals,
      col("value") >= col("lo") && col("value") < col("hi"))
    assert(binned.select("id", "band_id").as[(Long, Long)].collect().sorted.toSeq ==
      naive.select("id", "band_id").as[(Long, Long)].collect().sorted.toSeq)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("funnel counts strictly-ordered first-touch stage completion") {
    val ev = Seq(
      // user 1: full funnel in order
      (1L, "a", "2024-01-01 00:00:01"), (1L, "b", "2024-01-01 00:00:02"),
      (1L, "c", "2024-01-01 00:00:03"),
      // user 2: b before a — b must NOT count (strictly after first a)
      (2L, "b", "2024-01-01 00:00:01"), (2L, "a", "2024-01-01 00:00:02"),
      // user 3: a only
      (3L, "a", "2024-01-01 00:00:01"),
      // user 4: no a at all → no stages
      (4L, "b", "2024-01-01 00:00:01"), (4L, "c", "2024-01-01 00:00:02")
    ).map { case (u, t, s) => (u, t, tsv(s)) }.toDF("user_id", "typ", "ts2")
    val row = Sessions.funnel(ev, "user_id", "ts2", "typ", Seq("a", "b", "c"))
      .as[(Long, Long, Long)].head()
    assert(row == ((3L, 1L, 1L)))
  }

  test("gapFillDaily densifies the range and carries the last value forward") {
    val ev = Seq(
      // user 1: days 1 and 4 observed (two events on day 1 — later wins),
      // days 2-3 are gaps to fill
      (1L, 1L, 1.0, "2024-01-01 08:00:00"),
      (2L, 1L, 2.0, "2024-01-01 09:00:00"),
      (3L, 1L, 9.0, "2024-01-04 12:00:00"),
      // user 2: single day → single-row grid
      (4L, 2L, 5.0, "2024-01-02 00:30:00")
    ).map { case (e, u, v, s) => (e, u, v, tsv(s)) }
      .toDF("event_id", "user_id", "value", "ts2")
    val got = Sessions.gapFillDaily(ev, "user_id", "ts2", "event_id", "value",
        graft.functions.Normalize.tsFormat)
      .orderBy("user_id", "day")
      .as[(Long, String, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "2024-01-01 00:00:00", 2.0, true), // event_id 2 is later that day
      (1L, "2024-01-02 00:00:00", 2.0, false),
      (1L, "2024-01-03 00:00:00", 2.0, false),
      (1L, "2024-01-04 00:00:00", 9.0, true),
      (2L, "2024-01-02 00:00:00", 5.0, true)))
  }

  test("fixedWidthHistogram: edges, counts, nulls excluded, sparse buckets") {
    val df = Seq[java.lang.Long](0L, 1L, 499L, 500L, 999L, 2500L, null)
      .toDF("v")
    val got = Stats.fixedWidthHistogram(df, "v", width = 500)
      .orderBy("lo").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 500L, 3L), (500L, 1000L, 2L), (2500L, 3000L, 1L)))
  }

  test("weightedSampleTopK: brute-force agreement, weight monotonicity") {
    import graft.operators.Filters
    val df = (1L to 200L).map(i => (i, i % 7 + 1L)).toDF("doc_id", "w")
    val got = Filters.weightedSampleTopK(df, "doc_id", $"w", k = 10)
      .select("doc_id").as[Long].collect().toSet
    // brute-force the same A-ES keys in Scala
    def md5mod(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString
        .take(15), 16) % 1000000L
    }
    val exp = (1L to 200L).map { i =>
      val u = (md5mod(i.toString) + 1) / 1000000.0
      val key = BigDecimal(math.log(u) / (i % 7 + 1).toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (i, key)
    }.sortBy { case (id, k) => (-k, id) }.take(10).map(_._1).toSet
    assert(got == exp, s"got $got exp $exp")
    // zero/negative weights are excluded outright
    val withZero = Seq((1L, 0L), (2L, 5L)).toDF("doc_id", "w")
    val kept = Filters.weightedSampleTopK(withZero, "doc_id", $"w", k = 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(2L))
  }

  test("transitionMatrix: per-source probabilities normalize, adjacency honored") {
    val ev = Seq(
      (1L, 1L, "a", "2024-01-01 00:00:01"), (2L, 1L, "b", "2024-01-01 00:00:02"),
      (3L, 1L, "a", "2024-01-01 00:00:03"), (4L, 1L, "c", "2024-01-01 00:00:04"),
      (5L, 2L, "a", "2024-01-01 00:00:01"), (6L, 2L, "b", "2024-01-01 00:00:02")
    ).map { case (e, u, t0, s) => (e, u, t0, tsv(s)) }
      .toDF("event_id", "user_id", "typ", "ts2")
    val m = Sessions.transitionMatrix(ev, "user_id", "ts2", "event_id", "typ")
      .as[(String, String, Long, Double)].collect()
      .map { case (f, t0, n, p) => (f, t0) -> ((n, p)) }.toMap
    // a→b twice (users 1,2), a→c once? no: user1 seq a,b,a,c → a→b, b→a, a→c
    assert(m(("a", "b")) == ((2L, 0.666667)))
    assert(m(("a", "c")) == ((1L, 0.333333)))
    assert(m(("b", "a")) == ((1L, 1.0)))
    // probabilities per from_type sum to ~1
    m.toSeq.groupBy(_._1._1).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._2._2).sum - 1.0) < 1e-4)
    }
  }

  test("Stats.percentiles matches the built-in percentile aggregate") {
    val df = (1 to 101).map(i => (if (i % 2 == 0) "a" else "b", i * 3 % 97))
      .toDF("g", "v")
    val got = Stats.percentiles(df, "g", "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p99" -> 0.99))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3)))
    val exp = df.groupBy("g").agg(
        round(expr("percentile(v, 0.25)"), 4).as("p25"),
        round(expr("percentile(v, 0.5)"), 4).as("p50"),
        round(expr("percentile(v, 0.99)"), 4).as("p99"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == exp.toSeq)
  }

  test("rangeJoinBinned ignores empty intervals; kmv ignores null values") {
    val points = Seq((1L, 5.0)).toDF("id", "value")
    val withEmpty = Seq((0L, 0.0, 10.0), (1L, 20.0, 20.0), (2L, 9.0, 3.0))
      .toDF("band_id", "lo", "hi")
    val got = Joins.rangeJoinBinned(points, "value", withEmpty, "lo", "hi", 4.0)
      .select("band_id").as[Long].collect().toSeq
    assert(got == Seq(0L)) // empty/inverted intervals match nothing
    val withNulls = Seq(("g", Some(1)), ("g", None), ("g", Some(2)), ("g", None))
      .toDF("grp", "v")
    val r = graft.operators.Sketches.kmvDistinct(withNulls, "grp", "v", k = 8)
      .select("n_exact", "kmv_estimate").as[(Long, Double)].head()
    assert(r == ((2L, 2.0))) // nulls excluded on both the exact and sketch side
  }

  test("kmvDistinctAgg: bit-identical to relational KMV, partition-invariant, SQL-callable") {
    import graft.operators.Sketches
    val df = (0L until 3000L).map(i => (s"g${i % 3}", s"v${i % 997}"))
      .toDF("grp", "v")
    val rel = Sketches.kmvDistinct(df, "grp", "v", k = 32)
      .select("grp", "kmv_k", "kmv_estimate")
      .as[(String, Int, Double)].collect().toSet
    val agg = Sketches.kmvDistinctAgg(df, "grp", "v", k = 32)
      .as[(String, Int, Double)].collect().toSet
    assert(agg == rel, s"agg $agg vs relational $rel")
    // merge correctness: estimates must not depend on partitioning
    val agg1 = Sketches.kmvDistinctAgg(df.repartition(1), "grp", "v", k = 32)
      .as[(String, Int, Double)].collect().toSet
    val agg13 = Sketches.kmvDistinctAgg(df.repartition(13), "grp", "v", k = 32)
      .as[(String, Int, Double)].collect().toSet
    assert(agg1 == agg && agg13 == agg)
    // exact below k: tiny group holds every hash
    val small = Seq(("g", "a"), ("g", "b"), ("g", "a")).toDF("grp", "v")
    val (kk, est) = Sketches.kmvDistinctAgg(small, "grp", "v", k = 32)
      .select("kmv_k", "kmv_estimate").as[(Int, Double)].head()
    assert(kk == 2 && est == 2.0)
    // registered for pure SQL use
    df.createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      "SELECT grp, graft_kmv(v, 32).kmv_estimate AS e FROM kmv_in GROUP BY grp")
      .as[(String, Double)].collect().toSet
    assert(viaSql == rel.map(r => (r._1, r._3)))
  }

  test("kmvDistinct: exact below k, within tolerance above, deterministic") {
    import graft.operators.Sketches
    val small = (1 to 40).map(i => ("g", i)).toDF("grp", "v")
    val sRow = Sketches.kmvDistinct(small, "grp", "v", k = 64)
      .select("n_exact", "kmv_k", "kmv_estimate")
      .as[(Long, Int, Double)].head()
    assert(sRow == ((40L, 40, 40.0))) // sketch holds everything → exact
    val big = (1 to 20000).map(i => ("g", i % 5000)).toDF("grp", "v")
    val (exact, _, est) = Sketches.kmvDistinct(big, "grp", "v", k = 64)
      .select("n_exact", "kmv_k", "kmv_estimate")
      .as[(Long, Int, Double)].head()
    assert(exact == 5000L)
    // KMV relative error ~ 1/sqrt(k-2) ≈ 12.7%; allow 3 sigma
    assert(math.abs(est - exact) / exact < 0.4, s"estimate $est vs $exact")
    // determinism: same input → bit-identical estimate
    val est2 = Sketches.kmvDistinct(big.repartition(7), "grp", "v", k = 64)
      .select("kmv_estimate").as[Double].head()
    assert(est2 == est)
  }

  test("CMS sketch never underestimates, exact without collisions, partition-invariant") {
    import graft.operators.Sketches
    // 26 keys in a width-512 sketch: collisions are possible but the
    // estimate must NEVER be below the true count (CMS invariant)
    val rows = ('a' to 'z').flatMap(c => Seq.fill(c - 'a' + 1)(c.toString))
    val df = rows.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val got = Sketches.cmsHeavyHitters(df, "k", depth = 4, width = 512,
        threshold = 0L)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 26)
    ('a' to 'z').foreach { c =>
      val (exact, est) = got(c.toString)
      assert(exact == (c - 'a' + 1).toLong)
      assert(est >= exact, s"CMS underestimated $c: $est < $exact")
    }
    // deterministic + mergeable: a differently-partitioned input builds
    // the bit-identical sketch (merge is element-wise add)
    val again = Sketches.cmsHeavyHitters(df.repartition(13), "k",
        depth = 4, width = 512, threshold = 0L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(again == got)
    // SQL surface: the raw aggregate returns the d·w counter array and
    // total mass d × rows (every row increments one bucket per row-hash)
    df.createOrReplaceTempView("cms_in")
    val arr = spark.sql("SELECT graft_cms(k, 4, 512) FROM cms_in")
      .head().getAs[scala.collection.Seq[Long]](0)
    assert(arr.size == 4 * 512)
    assert(arr.sum == 4L * rows.size)
  }

  test("cmsJoinCardinality never underestimates; exact when collision-free") {
    import graft.operators.Sketches
    // A: key k appears k times (k=1..5); B: each key once → true join
    // cardinality = 1+2+3+4+5 = 15
    val a = (1 to 5).flatMap(k => Seq.fill(k)(k.toLong)).toDF("ka")
    val b = (1 to 5).map(_.toLong).toDF("kb")
    val (est, exact) = Sketches.cmsJoinCardinality(a, "ka", b, "kb",
        depth = 4, width = 512)
      .as[(Long, Long)].head()
    assert(exact == 15L)
    assert(est >= exact)       // CMS inner product never underestimates
    assert(est == 15L)         // 5 keys in 512 buckets: collision-free
    // disjoint key spaces → exact 0; estimate stays a non-negative bound
    val c = (100 to 104).map(_.toLong).toDF("kc")
    val (estD, exactD) = Sketches.cmsJoinCardinality(a, "ka", c, "kc",
        depth = 4, width = 512)
      .as[(Long, Long)].head()
    assert(exactD == 0L && estD >= 0L)
    // overflow semantics (VERDICT r3 #3): counts whose product exceeds
    // 2^63 must SATURATE at Long.MaxValue, never cast to NULL (or
    // coalesce to 0). 4e9 × 4e9 keys per side is not materializable in
    // a test, so drive the saturating projection both sides share with
    // the decimal magnitudes such counts produce.
    val sat = Seq(
      "18446744073709551616",                      // 2^64
      "99999999999999999999999999999999999999",    // DECIMAL(38,0) max
      null.asInstanceOf[String],                   // 38-digit acc overflow
      "15")                                        // in-range untouched
      .toDF("d").select(col("d").cast(Sketches.sdec).as("d"))
      .select(Sketches.saturateToLong(col("d")).as("v"))
      .as[java.lang.Long].collect()
    assert(sat(0) == Long.MaxValue && sat(1) == Long.MaxValue)
    assert(sat(2) == Long.MaxValue)  // least skips NULL → saturates
    assert(sat(3) == 15L)
  }

  test("Stats.correlation: exact r on a known line, null exclusion, degenerate group") {
    val df = Seq[(String, java.lang.Double, java.lang.Double)](
      ("lin", 1.0, 3.0), ("lin", 2.0, 5.0), ("lin", 3.0, 7.0),   // y = 2x+1 → r=1
      ("lin", 4.0, 9.0), ("lin", null, 99.0), ("lin", 5.0, null), // nulls dropped
      ("flat", 1.0, 4.0), ("flat", 2.0, 4.0),                     // var(y)=0 → r null
      ("neg", 1.0, 10.0), ("neg", 2.0, 8.0), ("neg", 3.0, 6.0)    // r = -1
    ).toDF("g", "x", "y")
    val got = Stats.correlation(df, "g", "x", "y").collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        r.getDouble(2), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(got("lin")._1 == 4L && got("lin")._3.contains(1.0))
    assert(got("flat")._3.isEmpty)
    assert(got("neg")._3.contains(-1.0))
    // covariance of lin group: E[xy]-E[x]E[y] = (3+10+21+36)/4 - 2.5*6 = 2.5
    assert(got("lin")._2 == 2.5)
  }

  test("zscoreOutliers flags only far-out values; zero-variance and null safe") {
    // group "a": 20 values at 10.0 plus one at 1000 → the 1000 is >3σ out
    val rows = (1 to 20).map(i => (i.toLong, "a", 10.0: java.lang.Double)) ++
      Seq((21L, "a", 1000.0: java.lang.Double),
        (22L, "a", null: java.lang.Double),   // excluded, not an outlier
        (30L, "flat", 5.0: java.lang.Double), // zero variance → no outliers
        (31L, "flat", 5.0: java.lang.Double))
    val df = rows.toDF("id", "g", "v")
    val out = Stats.zscoreOutliers(df, "g", "id", "v", z = 3.0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    assert(out.length == 1)
    val (id, g, zs) = out.head
    assert(id == 21L && g == "a" && zs > 4.0)
    // no shuffle of the data side beyond the stats agg: the stats join
    // back must be a broadcast, never a sort-merge over the stream
    val plan = Stats.zscoreOutliers(df, "g", "id", "v", z = 3.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("nullProfile counts nulls vs blank-ish separately, quotes odd names") {
    val df = Seq(
      (1L, "real text", "en"),
      (2L, null.asInstanceOf[String], "en"),
      (3L, "   ", "en"),     // whitespace-only → blank, not null
      (4L, "nan", null.asInstanceOf[String]), // the stringified-NaN artifact
      (5L, "ok", "fr")
    ).toDF("id", "text", "lang")
    val got = Stats.nullProfile(df, Seq("text", "lang"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("text") == ((1L, 3L, 0.6)))  // null + ws-only + 'nan'
    assert(got("lang") == ((1L, 1L, 0.2)))
    // a hyphenated column name must survive the generated stack() expr
    val odd = df.withColumnRenamed("text", "my-col")
    val oddGot = Stats.nullProfile(odd, Seq("my-col"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(oddGot("my-col") == 3L)
    // and so must an embedded backtick — the generated identifiers must
    // double it inside their own backtick quoting (VERDICT r3 #5)
    val tick = df.withColumnRenamed("text", "a`b")
    val tickGot = Stats.nullProfile(tick, Seq("a`b"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(tickGot("a`b") == ((1L, 3L)))
  }

  test("quantileBins yields balanced quartiles with ties to the lower bin") {
    val df = (1 to 100).map(v => (v.toLong, "g", v.toDouble)).toDF("id", "g", "v")
    val bins = Stats.quantileBins(df, "g", "v", Seq(0.25, 0.5, 0.75))
      .select("id", "bin").as[(Long, Int)].collect().toMap
    // bounds for 1..100 at (n−1)p interpolation: 25.75, 50.5, 75.25
    assert(bins(1L) == 1 && bins(25L) == 1)
    assert(bins(26L) == 2 && bins(50L) == 2)
    assert(bins(51L) == 3 && bins(75L) == 3)
    assert(bins(76L) == 4 && bins(100L) == 4)
    val sizes = Stats.quantileBins(df, "g", "v", Seq(0.25, 0.5, 0.75))
      .groupBy("bin").count().as[(Int, Long)].collect().toMap
    assert(sizes == Map(1 -> 25L, 2 -> 25L, 3 -> 25L, 4 -> 25L))
  }

  test("keySkewReport: uniform keys max out entropy, a hot key collapses it") {
    val uniform = (1 to 400).map(i => (i.toLong, s"k${i % 8}")).toDF("id", "k")
    val u = Stats.keySkewReport(uniform, "k").collect().head
    assert(u.getLong(0) == 400L && u.getLong(1) == 8L)
    assert(u.getDouble(2) == 0.125)
    assert(math.abs(u.getDouble(3) - math.log(8)) < 1e-6) // ln(8): uniform max
    val hot = ((1 to 396).map(i => (i.toLong, "HOT")) ++
      (397 to 400).map(i => (i.toLong, s"c$i"))).toDF("id", "k")
    val h = Stats.keySkewReport(hot, "k").collect().head
    assert(h.getDouble(2) == 0.99)       // top key owns 99% of rows
    assert(h.getDouble(3) < 0.1)         // entropy near zero → salt this join
  }

  test("asofJoinTolerant nulls matches staler than the tolerance") {
    val left = Seq(
      (1L, "u1", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 5.0),
      (2L, "u1", java.sql.Timestamp.valueOf("2024-01-01 13:00:00"), 6.0),
      (3L, "u2", java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 7.0)
    ).toDF("id", "k", "ts", "v")
    val right = Seq(
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 09:30:00"), "fresh-for-1"),
      ("u2", java.sql.Timestamp.valueOf("2024-01-01 09:30:00"), "future")
    ).toDF("k", "ts", "payload")
    val out = Joins.asofJoinTolerant(left, right, "k", "ts", Seq("payload"),
        toleranceSeconds = 3600L)
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[String]("payload"))).toMap
    assert(out(1L).contains("fresh-for-1"))  // 30 min old → within 1h
    assert(out(2L).isEmpty)                  // 3.5 h old → nulled
    assert(out(3L).isEmpty)                  // right is in the future → no match
    // untolerated form keeps the stale match — the contract difference
    val loose = Joins.asofJoin(left, right, "k", "ts", Seq("payload"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[String]("payload"))).toMap
    assert(loose(2L).contains("fresh-for-1"))
    // the matched row's payload is authoritative even when NULL: a
    // newer right row with a null field must not resurrect an older
    // row's value (asof_ts and payload always come from the same row)
    val rightWithNull = Seq(
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 08:00:00"), "old-value"),
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 09:45:00"),
        null.asInstanceOf[String])
    ).toDF("k", "ts", "payload")
    val matched = Joins.asofJoin(left, rightWithNull, "k", "ts",
        Seq("payload"))
      .filter($"id" === 1L).head()
    assert(matched.getAs[java.sql.Timestamp]("asof_ts") ==
      java.sql.Timestamp.valueOf("2024-01-01 09:45:00"))
    assert(matched.getAs[String]("payload") == null)
  }

  test("winsorize clips into the percentile band, passes inliers through") {
    // group of 1..100: p05 = 5.95, p95 = 95.05 ((n−1)·p interpolation)
    val df = (1 to 100).map(v => (v.toLong, "a", v.toDouble)).toDF("id", "g", "v")
    val out = Stats.winsorize(df, "g", "v", pLo = 0.05, pHi = 0.95)
      .select("id", "clipped").as[(Long, Double)].collect().toMap
    assert(out(1L) == 5.95 && out(3L) == 5.95)   // below lo → clamped
    assert(out(100L) == 95.05 && out(97L) == 95.05)
    assert(out(50L) == 50.0 && out(6L) == 6.0)   // inliers untouched
  }

  test("madOutliers flags the far value, survives zero-MAD groups") {
    // values 1..9 + 100: median 5.5, MAD 2.5 → only the 100 clears 3.5
    val a = (1 to 9).map(v => (v.toLong, "a", v.toDouble)) :+ ((10L, "a", 100.0))
    // constant-with-one-spike group: MAD = 0 → no outliers by contract
    val b = Seq((20L, "b", 5.0), (21L, "b", 5.0), (22L, "b", 5.0),
      (23L, "b", 5.0), (24L, "b", 100.0))
    val df = (a ++ b).toDF("id", "g", "v")
    val out = Stats.madOutliers(df, "g", "id", "v", z = 3.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    assert(out.length == 1)
    assert(out.head._1 == 10L && out.head._2 == "a")
    // robust_z = 94.5 / (1.4826 · 2.5) = 25.49575…, rounded to 4dp
    assert(out.head._3 == 25.4958)
  }

  test("eventPaths orders by ts with tie-break, truncates at maxEvents") {
    val ev = Seq(
      (1L, 1L, "u1", "view"), (2L, 2L, "u1", "click"), (3L, 3L, "u1", "purchase"),
      (4L, 4L, "u1", "view"),
      (10L, 5L, "u2", "signup"), (10L, 6L, "u2", "view") // ts tie → event_id order
    ).toDF("ts", "event_id", "user_id", "event_type")
    val paths = Sessions.eventPaths(ev, "user_id", "ts", "event_id",
        "event_type", maxEvents = 3)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(paths("u1") == (("view>click>purchase", 3L))) // 4th event truncated
    assert(paths("u2") == (("signup>view", 2L)))
    // the prefilter must map-side prune before the shuffle
    val plan = Sessions.eventPaths(ev, "user_id", "ts", "event_id",
      "event_type", maxEvents = 3).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("Redact.scrub replaces emails before digit runs, counts audit") {
    val df = Seq(
      ("contact bob99@example.com or 555-123-4567", 1),
      ("no pii here", 2),
      ("ids 12 and 3456", 3)
    ).toDF("text", "id")
    val out = df.select(col("id"), Redact.scrub(col("text")).as("clean"),
        Redact.matchCount(col("text"), Redact.EmailRe).as("n_email"))
      .as[(Int, String, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1)._1 == "contact <EMAIL> or <NUM>-<NUM>-<NUM>")
    assert(out(1)._2 == 1)
    assert(out(2) == (("no pii here", 0)))
    assert(out(3)._1 == "ids <NUM> and <NUM>")
  }

  test("sampledQuantiles: exact when n <= k, partition-invariant, bounded") {
    val df = (1L to 200L).map(i =>
      (i, if (i <= 100) "a" else "b", (i % 100) * 1.0)).toDF("id", "g", "v")
    // k >= group size -> the sample IS the population: both groups hold
    // values 0..99, so p50 = s[floor(0.5*99)] = 49
    val exact = Sketches.sampledQuantiles(df, Seq("g"), "id", col("v"),
        k = 200, ps = Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(exact == Map("a" -> 49.0, "b" -> 49.0))
    // under-k sampling: deterministic across partitionings, bit-equal
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.sampledQuantiles(d, Seq("g"), "id", col("v"),
          k = 8, ps = Seq(0.5, 0.9))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    val r1 = run(df)
    val r2 = run(df.repartition(7))
    assert(r1 == r2, s"partitioning changed the sketch: $r1 vs $r2")
    // sampled estimates stay inside the value range
    r1.foreach { case (_, p50, p90) =>
      assert(p50 >= 0 && p90 <= 99 && p50 <= p90)
    }
    // a group whose every row has a null id/value yields NULL
    // quantiles, not an element_at(0) runtime failure
    val withNullGroup = df.unionByName(
      Seq(("c", 1L)).toDF("g", "id")
        .select(lit(null).cast("bigint").as("id"), col("g"),
          lit(null).cast("double").as("v"))
        .select("id", "g", "v"))
    val r3 = Sketches.sampledQuantiles(withNullGroup, Seq("g"), "id",
        col("v"), k = 8, ps = Seq(0.5))
      .collect().map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(r3("c"), "all-null group must yield null quantile")
    assert(!r3("a") && !r3("b"))
  }
}
