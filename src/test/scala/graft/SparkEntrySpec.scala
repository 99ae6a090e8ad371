package graft

/** Driver-contract smoke: entry() returns rows; every query name has either
  * an oracle or an intentional rows-only disposition. */
class SparkEntrySpec extends SparkSpec {

  test("entry() flagship returns rows on sf0.001 (driver t1 smoke)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("__row_id__"))
  }

  test("oracleSql keys are a subset of queries; rows-only set is intentional") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    // every driver query has an exact DuckDB oracle mirror
    assert(q == o, s"rows-only queries remain: ${q -- o}")
  }
}
