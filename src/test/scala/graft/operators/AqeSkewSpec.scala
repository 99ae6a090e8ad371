package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The other half of the skew playbook: `Skew.saltedJoin` is the manual
  * fix; Spark's AQE skew-join is the automatic one. This pins that on a
  * skewed shuffle join AQE actually splits the hot partition (so the
  * engine's guidance — salt only when AQE can't see the skew, e.g. under
  * aggregation or bucketed exchange reuse — stays true on this Spark
  * version), and that the result equals the unskewed-path answer. Own
  * session: the thresholds must be tiny for a test-sized corpus. */
class AqeSkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-aqe-skew-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // make a ~KB-scale hot partition count as skewed
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // keep it a sort-merge join: broadcast would hide the skew entirely
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("AQE splits the hot key's partition and the join result is exact") {
    import spark.implicits._
    // 90% of the left rows share one key; right side is uniform
    val left = spark.range(20000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 50)
        .as("k"), col("id").as("v"))
    val right = spark.range(50).select(col("id").as("k"),
      concat(lit("r"), col("id")).as("tag"))
    val joined = left.join(right, "k")
    // execute THIS dataset: AQE's final (skew-split) plan only exists
    // after the query actually runs — count() would plan a separate query
    val n = joined.collect().length.toLong
    // exact expectation: every left row matches exactly one right row
    val expect = left.join(broadcast(right), "k").count()
    assert(n == expect && n == 20000L)
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("skew=true") || plan.contains("skewed"),
      s"AQE must mark the hot partition as skewed on this Spark version:\n$plan")
  }
}
