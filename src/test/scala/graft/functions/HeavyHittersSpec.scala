package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Misra–Gries heavy-hitters aggregate: exactness on bounded domains,
  * error bounds over capacity, and partition-independence of the exact
  * mode (merge correctness). */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  private def summarize(df: org.apache.spark.sql.DataFrame,
                        capacity: Int): (Map[String, Long], Long) = {
    val row = df
      .agg(HeavyHitters.heavy_hitters(col("s"), capacity).as("hh"))
      .select(col("hh.items").as("items"), col("hh.err").as("err"))
      .collect().head
    (row.getMap[String, Long](0).toMap, row.getLong(1))
  }

  test("exact when distinct <= capacity: equals groupBy counts, err = 0") {
    val df = Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ Seq.fill(3)("c")
    val (items, err) = summarize(df.toDF("s").repartition(7), 8)
    assert(items == Map("a" -> 100L, "b" -> 60L, "c" -> 3L))
    assert(err == 0L)
  }

  test("over capacity: lower bounds hold and the heavy item survives") {
    // one heavy item (40% of stream) among 20 light ones
    val stream = Seq.fill(400)("heavy") ++
      (0 until 600).map(i => s"light${i % 20}")
    val (items, err) = summarize(stream.toDF("s").repartition(5), 10)
    assert(items.contains("heavy"),
      s"item at 40% frequency must survive capacity 10: $items")
    // count is a lower bound; true count within [cnt, cnt + err]
    assert(items("heavy") <= 400L && 400L <= items("heavy") + err)
    // every surviving light item's bound holds too (true count = 30)
    items.keys.filter(_.startsWith("light")).foreach { k =>
      assert(items(k) <= 30L && 30L <= items(k) + err, s"$k: ${items(k)} err=$err")
    }
  }

  test("exact mode is partition-independent") {
    val df = (0 until 500).map(i => s"k${i % 4}").toDF("s")
    val summaries = (1 to 3).map(p => summarize(df.repartition(p), 6))
    assert(summaries.distinct.size == 1, summaries.toString)
    assert(summaries.head._1("k0") == 125L && summaries.head._2 == 0L)
  }

  test("an input item equal to the old sentinel is just an item") {
    // "__err__" as DATA must count like any other value and stay
    // distinguishable from the error bound (now its own struct field)
    val df = (Seq.fill(5)("__err__") ++ Seq.fill(2)("x")).toDF("s")
    val (items, err) = summarize(df, 8)
    assert(items == Map("__err__" -> 5L, "x" -> 2L))
    assert(err == 0L)
  }
}
