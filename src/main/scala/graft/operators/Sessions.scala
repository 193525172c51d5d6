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
}
