package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Misra–Gries heavy-hitters aggregate: exactness on bounded domains,
  * error bounds over capacity, and partition-independence of the exact
  * mode (merge correctness). */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  test("exact when distinct <= capacity: equals groupBy counts, err = 0") {
    val df = Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ Seq.fill(3)("c")
    val out = df.toDF("s").repartition(7)
      .agg(HeavyHitters.heavy_hitters(col("s"), 8).as("hh"))
      .select(explode(col("hh")).as(Seq("item", "cnt")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 100L, "b" -> 60L, "c" -> 3L, "__err__" -> 0L))
  }

  test("over capacity: lower bounds hold and the heavy item survives") {
    // one heavy item (40% of stream) among 20 light ones
    val stream = Seq.fill(400)("heavy") ++
      (0 until 600).map(i => s"light${i % 20}")
    val out = stream.toDF("s").repartition(5)
      .agg(HeavyHitters.heavy_hitters(col("s"), 10).as("hh"))
      .select(explode(col("hh")).as(Seq("item", "cnt")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val err = out("__err__")
    assert(out.contains("heavy"),
      s"item at 40% frequency must survive capacity 10: $out")
    // count is a lower bound; true count within [cnt, cnt + err]
    assert(out("heavy") <= 400L && 400L <= out("heavy") + err)
    // every surviving light item's bound holds too (true count = 30)
    out.keys.filter(_.startsWith("light")).foreach { k =>
      assert(out(k) <= 30L && 30L <= out(k) + err, s"$k: ${out(k)} err=$err")
    }
  }

  test("exact mode is partition-independent") {
    val df = (0 until 500).map(i => s"k${i % 4}").toDF("s")
    val counts = (1 to 3).map { p =>
      df.repartition(p)
        .agg(HeavyHitters.heavy_hitters(col("s"), 6).as("hh"))
        .select(explode(col("hh")).as(Seq("item", "cnt")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(counts.distinct.size == 1, counts.toString)
    assert(counts.head("k0") == 125L && counts.head("__err__") == 0L)
  }
}
