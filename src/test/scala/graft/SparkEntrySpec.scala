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
    val rowsOnly = q -- o
    // hash/LSH-based ops whose internals aren't SQL-expressible
    assert(rowsOnly == Set("dd_minhash", "dd_simhash", "dd_jaccard",
      "sim_lsh", "sim_ivf", "txt_rolling"),
      s"unexpected rows-only queries: $rowsOnly")
  }
}
