package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Graph analytics over edge lists. The repo already builds graphs
  * (Similarity.knnGraph) and resolves connectivity (Dedup.duplicateGroups);
  * this adds centrality — deterministic damped PageRank — the ranking
  * primitive under graph-based curation (pick the most central document of
  * a duplicate cluster, weight a kNN neighborhood).
  *
  * Determinism: per-edge contributions are rounded to 12 places and summed
  * as DECIMAL(28,12) (exact, order-independent), and each iteration's rank
  * is re-rounded to 12 places — the iteration trajectory is bit-identical
  * in any engine, so a DuckDB oracle can unroll the iterations as CTEs
  * (the clu_kmeans convention).
  *
  * Scale: each iteration is ONE join (ranks → edges on src, partial-agg
  * absorbed map-side) + ONE aggregate (sum by dst) + a left join back to
  * the vertex set — all shuffles on the edge keys, nothing driver-side
  * except the vertex count. Simplified PR: dangling-node mass is dropped,
  * not redistributed (documented divergence from the matrix formulation —
  * avoids a per-iteration global aggregate barrier).
  */
object Graph {

  /** `iters` rounds of damped PageRank. `vertices`: one `id` column;
    * `edges`: `src`, `dst`. Returns (id, rank).
    *
    * `teleport` is passed explicitly (not derived as `1 - damping`): the
    * IEEE double `1.0 - 0.85` differs from the literal `0.15` in the last
    * bit, and an oracle writes the literal — deriving it would make the
    * two engines disagree at the 12th rounded digit. */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int,
               damping: Double = 0.85, teleport: Double = 0.15): DataFrame = {
    val n = vertices.count()
    val base = teleport / n
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("__odeg"))
    // edges ⋈ outdeg is reused every iteration: materialize it once
    val withDeg = edges.join(outdeg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = vertices.select(col("id"),
      lit(BigDecimal(1.0 / n).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = withDeg.join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"),
          round(col("rank") / col("__odeg"), 12)
            .cast(DecimalType(28, 12)).as("__c"))
      val sums = contrib.groupBy(col("dst")).agg(sum(col("__c")).as("__s"))
      ranks = vertices.join(sums, vertices("id") === sums("dst"), "left")
        .select(vertices("id"),
          round(lit(base) + lit(damping) *
            coalesce(col("__s").cast(DoubleType), lit(0.0)), 12).as("rank"))
    }
    ranks
  }
}
