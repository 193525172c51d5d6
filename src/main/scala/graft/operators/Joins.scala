package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Join operators Spark has no built-in physical form for: as-of
  * (point-in-time) joins and interval/range joins. Both are expressed
  * as compositions that keep Catalyst in equi-join land — the naive
  * formulations (`l.ts >= r.ts` theta-joins) degenerate to
  * broadcast-nested-loop / cartesian plans, which die at scale.
  *
  * Scale notes (the 100 TB story):
  *  - As-of join: tag both sides, union, ONE shuffle on the entity key,
  *    then a per-key ordered window carries the most recent right-side
  *    row forward (`last(..., ignoreNulls)`). Cost is a sort within
  *    each key partition — no range explosion, no per-row probing, and
  *    Spark's range-partitioned sort handles skewed keys via AQE.
  *    This is how kdb/Flink-style temporal joins map onto a shuffle
  *    engine.
  *  - Range join: bin both sides by a fixed width; an interval
  *    replicates to each bin it overlaps (`explode(sequence(...))`),
  *    the probe side computes its single bin, and the join becomes an
  *    EQUI-join on the bin plus a residual predicate. Replication
  *    factor = interval width / bin width (bounded, chosen), turning
  *    an O(n·m) nested loop into a hash join with bounded fan-out.
  */
object Joins {

  /** Point-in-time (as-of) left join: for each left row, attach the
    * most recent right row with `right.tsCol <= left.tsCol` for the
    * same `keyCol` (nulls when none exists).
    *
    * Determinism: callers must pre-deduplicate the right side to one
    * row per (key, ts) — see [[latestPerKeyTs]] — otherwise "the" most
    * recent right row at an exactly-tied timestamp is ill-defined.
    * Left ties with right (equal ts) MATCH (non-strict <=), mirroring
    * the ASOF JOIN convention.
    *
    * `rightCols` are the right-side payload columns to carry; they are
    * emitted under the same names (prefix them upstream on collision).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    require(!leftCols.contains("asof_ts"),
      "left side may not already have an 'asof_ts' column")
    require(rightCols.forall(c => !leftCols.contains(c)),
      s"right payload ${rightCols.mkString(",")} collides with a left column" +
        " — rename upstream")
    // kind orders right rows BEFORE a left row at the same (key, ts):
    // the window then includes the tied right row in the lookback.
    // The whole right payload travels as ONE struct: `last(ignoreNulls)`
    // must skip the null slots contributed by LEFT rows but still pick
    // the newest RIGHT row even when that row's payload FIELDS are
    // null — per-column carries would resurrect an older row's value
    // and disagree with the matched `asof_ts`.
    val taggedRight = right.select(
        col(keyCol), col(tsCol),
        lit(0).as("_kind"),
        struct(col(tsCol).as("_ts") +:
          rightCols.map(c => col(c).as(s"_r_$c")): _*).as("_r"))
      .withColumn("_asof_ts", col(tsCol)).drop(tsCol)
    val rStructType = taggedRight.schema("_r").dataType
    val taggedLeft = left.select(
      Seq(col(keyCol), col(tsCol).as("_asof_ts"), lit(1).as("_kind")) ++
        leftCols.filter(c => c != keyCol).map(col) :+
        lit(null).cast(rStructType).as("_r"): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_asof_ts"), col("_kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedLeft.unionByName(taggedRight,
        allowMissingColumns = true)
      .withColumn("_c", last(col("_r"), ignoreNulls = true).over(w))
    carried.filter(col("_kind") === 1)
      .select(
        col(keyCol) +: col("_asof_ts").as(tsCol) +:
          (leftCols.filter(c => c != keyCol && c != tsCol).map(col) ++
            Seq(col("_c._ts").as("asof_ts")) ++
            rightCols.map(c => col(s"_c._r_$c").as(c))): _*)
  }

  /** [[asofJoin]] with a max-staleness tolerance — the feature-store
    * point-in-time contract: a right-side match older than
    * `toleranceSeconds` at the left row's timestamp is treated as NO
    * match (payload and `asof_ts` null out) rather than serving an
    * arbitrarily stale feature. Same single-shuffle tagged-union
    * window; the tolerance is a pure post-projection, so the plan is
    * unchanged. Second-granularity comparison (epoch floor), matching
    * SQL `date_diff('second', …)`.
    */
  def asofJoinTolerant(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightCols: Seq[String],
      toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds >= 0, s"tolerance must be >= 0: $toleranceSeconds")
    val joined = asofJoin(left, right, keyCol, tsCol, rightCols)
    val stale = col("asof_ts").isNull ||
      (col(tsCol).cast(LongType) - col("asof_ts").cast(LongType)) >
        toleranceSeconds
    val masked = rightCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(stale, lit(null)).otherwise(col(c)))
    }
    masked.withColumn("asof_ts",
      when(stale, lit(null).cast(joined.schema("asof_ts").dataType))
        .otherwise(col("asof_ts")))
  }

  /** Reduce a frame to one row per (key, ts): the payload of the row
    * with the greatest `tieCol` — the deterministic right-side prep
    * for [[asofJoin]].
    */
  def latestPerKeyTs(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, payload: Seq[String]): DataFrame =
    df.groupBy(col(keyCol), col(tsCol))
      .agg(max_by(col(payload.head), col(tieCol)).as(payload.head),
        payload.tail.map(c => max_by(col(c), col(tieCol)).as(c)): _*)

  /** Interval (range) join via binning: rows of `points` whose
    * `valueCol` falls in [loCol, hiCol) of `intervals`. Intervals
    * replicate to every bin they overlap; points compute one bin; the
    * join is an equi-join on the bin with the range as residual.
    * Inner-join semantics; a point in k overlapping intervals emits k
    * rows.
    */
  def rangeJoinBinned(points: DataFrame, valueCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    val binnedPoints = points.withColumn("_bin",
      floor(col(valueCol) / binWidth).cast("long"))
    // drop empty intervals FIRST: sequence(a, b) with b < a would
    // generate a DESCENDING range and replicate into wrong bins
    val binnedIntervals = intervals.filter(col(hiCol) > col(loCol))
      .withColumn("_bin",
        explode(sequence(
          floor(col(loCol) / binWidth).cast("long"),
          // hi is exclusive: a bin starting exactly at hi never matches
          floor((col(hiCol) - lit(1e-9)) / binWidth).cast("long"))))
    binnedPoints.join(binnedIntervals, Seq("_bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("_bin")
  }
}
