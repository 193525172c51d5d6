package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract self-consistency (no Spark session needed). */
class ContractSpec extends AnyFunSuite {

  test("every oracle key names an implemented query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("queries without oracle SQL are the known imperative ones") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q34_multimodal_features"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("query names are stable snake_case identifiers") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("q\\d+_[a-z0-9_]+"), s"bad query name: $k")
    }
  }
}
