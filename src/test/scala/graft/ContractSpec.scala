package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract self-consistency (no Spark session needed). */
class ContractSpec extends AnyFunSuite {

  test("every oracle key names an implemented query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("every query has oracle SQL (q34's stub decode is SQL-exact too)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected rows-only queries: $rowsOnly")
  }

  test("query names are stable snake_case identifiers") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("q\\d+_[a-z0-9_]+"), s"bad query name: $k")
    }
  }

  test("withTs2 adapts to every events.ts physical schema generation") {
    // the driver has regenerated testdata with events.ts as
    // TIMESTAMP(NANOS)-read-as-long in some rounds and
    // TIMESTAMP(MICROS)/NTZ in others; the same instant must come out
    // of withTs2 whichever generation is on disk
    val spark = SparkSpec.session
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val wall = "2024-01-07 12:34:56.789012"
    val micros = java.time.LocalDateTime
      .parse(wall.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
      .toEpochMilli * 1000L + 12L
    def ts2Of(df: org.apache.spark.sql.DataFrame): java.sql.Timestamp = {
      val out = Graft.withTs2(df)
      assert(out.schema("ts2").dataType == TimestampType)
      out.select(col("ts2")).head().getTimestamp(0)
    }
    val one = spark.range(1)
    val fromNanos = ts2Of(one.select((lit(micros) * 1000L).as("ts")))
    val fromNtz = ts2Of(one.select(
      lit(wall).cast(TimestampNTZType).as("ts")))
    val fromLtz = ts2Of(one.select(lit(wall).cast(TimestampType).as("ts")))
    assert(fromNanos == fromNtz && fromNtz == fromLtz,
      s"generations disagree: nanos=$fromNanos ntz=$fromNtz ltz=$fromLtz")
    assert(fromLtz.toInstant.toString == "2024-01-07T12:34:56.789012Z")
    val bad = intercept[IllegalArgumentException] {
      Graft.withTs2(one.select(lit("x").as("ts")))
    }
    assert(bad.getMessage.contains("unsupported events.ts type"))
  }

  test("every query's output schema is unambiguous for the driver compare") {
    // the driver sorts columns BY NAME before hashing — duplicate or
    // unstable names would silently scramble the comparison
    val spark = SparkSpec.session
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val cols = fn(spark, dir).columns.toSeq
      assert(cols.distinct.size == cols.size, s"$name duplicate columns: $cols")
      cols.foreach(c => assert(c.matches("[A-Za-z0-9_]+"), s"$name bad column: $c"))
    }
  }
}
