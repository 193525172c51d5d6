package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream — the batch form of the
  * classic event-analytics operator (its streaming sibling is
  * `session_window` / `flatMapGroupsWithState` in
  * `streaming/StreamingIngest`).
  *
  * Scale shape: one shuffle on the user key, then a per-user ordered
  * window (lag + running sum) — no self-joins, no driver state. Skewed
  * power users are bounded by per-user event counts; AQE skew handling
  * applies to the exchange.
  *
  * Determinism: ordering ties broken by `tieCol` (unique event id), so
  * session numbering is total-ordered and engine-reproducible.
  */
object Sessions {

  /** Tag every event with its per-user `session_seq` (1-based): a new
    * session starts when the gap to the previous event exceeds
    * `gapSeconds`.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(order)
    val isNew = when(prev.isNull ||
      (unix_timestamp(col(tsCol)) - unix_timestamp(prev)) > gapSeconds, 1L)
      .otherwise(0L)
    events.withColumn("session_seq",
      sum(isNew).over(order.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** Per-session rollup: event count, start/end, duration in seconds. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long,
      tsFormat: Column => Column): DataFrame =
    sessionize(events, userCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        tsFormat(min(col(tsCol))).as("session_start"),
        tsFormat(max(col(tsCol))).as("session_end"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("duration_sec"))

  /** Daily resample + forward fill: collapse events to one value per
    * (entity, day) — the LAST observation of the day by (ts, tie) —
    * then expand each entity's [first day, last day] range into a
    * dense daily grid and carry the last observed value forward across
    * the gaps. The standard time-series regularization step before
    * joining event data against daily reference tables.
    *
    * Scale shape: one aggregation to the daily granularity (map-side
    * combined), a per-entity MIN/MAX to size the grid, a generator to
    * densify (output bounded by entities × days, independent of event
    * volume), and one per-entity ordered window for the fill — no
    * self-joins, values pass through untouched (no float arithmetic),
    * so output is engine-exact.
    */
  def gapFillDaily(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, valueCol: String,
      tsFormat: Column => Column): DataFrame = {
    val day = date_trunc("day", col(tsCol))
    val daily = events
      .withColumn("_day", day)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(userCol), col("_day"))
          .orderBy(col(tsCol).desc, col(tieCol).desc)))
      .filter(col("_rn") === 1)
      .select(col(userCol), col("_day"), col(valueCol).as("_v"))
    val grid = daily.groupBy(col(userCol))
      .agg(min(col("_day")).as("_lo"), max(col("_day")).as("_hi"))
      .select(col(userCol),
        explode(sequence(col("_lo"), col("_hi"),
          expr("INTERVAL 1 DAY"))).as("_day"))
    val fillW = Window.partitionBy(col(userCol)).orderBy(col("_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(userCol, "_day"), "left_outer")
      .select(col(userCol),
        tsFormat(col("_day")).as("day"),
        last(col("_v"), ignoreNulls = true).over(fillW).as("filled_value"),
        col("_v").isNotNull.as("observed"))
  }

  /** First-order Markov transition matrix over per-entity event
    * sequences: P(next = b | current = a) from adjacent event pairs in
    * (ts, tie) order. One shuffle on the entity key for the lead
    * window, one map-side-combined aggregation to the (from, to)
    * matrix — output bounded by event-type cardinality squared, so the
    * normalizing window runs over the tiny matrix, never the events.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val norm = Window.partitionBy(col("from_type"))
    events
      .withColumn("_next", lead(col(typeCol), 1).over(order))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n").cast(org.apache.spark.sql.types.DoubleType) /
          sum(col("n")).over(norm), 6))
  }

  /** Per-entity ordered event-type path (trajectory extraction): the
    * first `maxEvents` events' types joined into one `sep`-delimited
    * string — the sequence-mining / behavior-model input shape
    * ("view>click>purchase").
    *
    * Scale shape: the `row_number <= maxEvents` prefilter rewrites to
    * WindowGroupLimit (each map task keeps maxEvents rows per entity
    * BEFORE the shuffle), so the later `collect_list` aggregates a
    * provably bounded group — never "all events of a hot user" —
    * and sorts ≤ maxEvents structs per entity in memory.
    */
  def eventPaths(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, maxEvents: Int,
      sep: String = ">"): DataFrame = {
    require(maxEvents > 0, s"maxEvents must be positive: $maxEvents")
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("_rn", row_number().over(order))
      .filter(col("_rn") <= maxEvents)
      .groupBy(col(userCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("_rn"), col(typeCol)))),
          x => x.getField(typeCol)),
        sep).as("path"),
        count(lit(1)).cast(org.apache.spark.sql.types.LongType).as("path_len"))
  }

  /** Strict ordered funnel over an event stream: how many entities
    * reached each stage, where stage k requires an event of type
    * `stages(k)` STRICTLY AFTER the timestamp that completed stage
    * k−1 (first-touch semantics: the earliest qualifying event is the
    * one that counts).
    *
    * One conditional min-aggregation per stage, each a single shuffle
    * on the entity key with map-side combine — no self-joins of the
    * event table against itself, so the cost is stages × one pass,
    * independent of per-user event counts. Returns one row:
    * (n_stage_1, ..., n_stage_k).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // first-stage time per user
    var reached = events
      .groupBy(col(userCol))
      .agg(min(when(col(typeCol) === stages.head, col(tsCol))).as("_t1"))
    var i = 1
    while (i < stages.length) {
      val prev = s"_t$i"
      // stage-k time: earliest event of type k strictly after the
      // stage-(k−1) time; null prev propagates to null (user never
      // advanced). Earlier stage times ride along as min-of-constant.
      val carries = (1 to i).map(k => min(col(s"_t$k")).as(s"_t$k"))
      val nextT = min(when(col(typeCol) === stages(i) &&
        col(tsCol) > col(prev), col(tsCol))).as(s"_t${i + 1}")
      reached = events.join(reached, Seq(userCol))
        .groupBy(col(userCol))
        .agg(carries.head, (carries.tail :+ nextT): _*)
      i += 1
    }
    reached.agg(
      count(col("_t1")).as("n_stage_1"),
      (2 to stages.length).map(k =>
        count(col(s"_t$k")).as(s"n_stage_$k")): _*)
  }
}
