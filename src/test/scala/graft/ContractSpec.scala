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
