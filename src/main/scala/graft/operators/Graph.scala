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
    * All iteration state is FIXED-POINT INTEGER (picoranks, 1e-12): the
    * per-edge split is a floor division, the damping step is
    * `(sum * dampNum) div 100`, and the teleport base is an integer
    * constant — every update is bit-identical in any engine. An earlier
    * double-based variant rounded each step to 12 decimals, and 2/500
    * vertices landed on a round-to-12 half-way boundary where JVM
    * `BigDecimal.setScale(HALF_UP)` and libm `nearbyint`-based rounding
    * disagree; integers have no such boundary. `damping`/`teleport` must
    * carry at most 2 decimal digits so their scaled forms are exact. */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int,
               damping: Double = 0.85, teleport: Double = 0.15): DataFrame = {
    val n = vertices.count()
    val Scale = 1000000000000L // 1e12 picoranks
    val dampNum = math.round(damping * 100) // e.g. 85
    val teleNum = math.round(teleport * 100) // e.g. 15
    require(math.abs(dampNum / 100.0 - damping) < 1e-15 &&
      math.abs(teleNum / 100.0 - teleport) < 1e-15,
      "damping/teleport must have at most 2 decimal digits")
    val baseP = teleNum * (Scale / 100) / n // exact: Scale/100 is integral
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("__odeg"))
    // edges ⋈ outdeg is reused every iteration: materialize it once
    val withDeg = edges.join(outdeg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = vertices.select(col("id"), lit(Scale / n).as("__rp"))
    for (i <- 1 to iters) {
      val contrib = withDeg.join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"), expr("__rp div __odeg").as("__c"))
      val sums = contrib.groupBy(col("dst")).agg(sum(col("__c")).as("__s"))
      val next = vertices.join(sums, vertices("id") === sums("dst"), "left")
        .select(vertices("id"),
          (lit(baseP) + expr(s"(coalesce(__s, 0L) * $dampNum) div 100"))
            .as("__rp"))
      // pin every 4th round (the Dedup.duplicateGroups pattern): without a
      // cut the logical plan deepens by a join+agg per iteration and a
      // long run re-plans a compounding DAG; the checkpointed frame is a
      // flat (id, long) relation whose ACTUAL size feeds later join stats.
      // Pinning EVERY round paid an eager materialization job per
      // iteration — 4.6× on the 3-iteration benchmark — so short runs
      // stay one lazy chain and only long runs amortize the cuts
      ranks = if (i % 4 == 0) next.localCheckpoint() else next
    }
    // release the cached edge join once the final ranks no longer reach
    // through its lineage (last round pinned); otherwise it stays cached
    // for the consumer's first job — the price of keeping short runs lazy
    if (iters % 4 == 0) withDeg.unpersist(blocking = false)
    ranks.select(col("id"),
      (col("__rp").cast(DoubleType) / lit(Scale.toDouble)).as("rank"))
  }

  /** Per-vertex triangle participation counts over an edge list (direction
    * and duplicates ignored) — the local-clustering primitive: in a
    * near-dup kNN graph, a vertex in many triangles sits inside a dense
    * duplicate cluster, one in none is an isolated near-miss.
    *
    * The algorithm is the degree-ordered join (Suri & Vassilvitskii,
    * "Counting triangles and the curse of the last reducer", WWW 2011):
    * orient every canonical edge from its (degree, id)-smaller endpoint to
    * the larger, making the graph a DAG where each triangle {x,y,z}
    * materializes EXACTLY once as the path x→y→z closed by x→z — and,
    * crucially for 100 TB graphs, each vertex's oriented out-degree is
    * O(√m) even for celebrity vertices, so the wedge join's per-key fanout
    * (the "last reducer") is bounded. Three hash joins + one aggregate;
    * no driver-side state. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // canonical undirected edges (a < b), self-loops dropped
    val ce = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = ce.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // orient by the (degree, id) total order
    val oriented = ce
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("w")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.w") === col("e2.u"))
      .select(col("e1.u").as("x"), col("e1.w").as("y"), col("e2.w").as("z"))
    val tris = wedges.join(oriented.as("e3"),
      col("x") === col("e3.u") && col("z") === col("e3.w"))
    tris.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
  }

  /** Synchronous label-propagation communities over an undirected edge
    * list (`src`, `dst`) — the near-linear community-detection baseline
    * (Raghavan et al. 2007), made DETERMINISTIC: every vertex starts
    * labeled with its own id and each round simultaneously adopts the
    * most frequent label among its neighbors, ties broken by SMALLEST
    * label (the rounded-score + id tie-break convention, so any engine
    * reproduces the trajectory and an oracle can unroll the rounds as
    * CTEs). Unlike [[connectedComponents]] (pure reachability), LPA
    * splits a connected graph into densely-linked groups.
    *
    * Scale shape per round: ONE equi-join of the label table onto the
    * symmetric edge list (shuffle on the vertex key; AQE broadcasts when
    * the label table is small) + two map-side-combined aggregates
    * ((v, label) counts, then the per-vertex argmax as a struct-min fold
    * — no window, no sort). The label table is pinned each round, the
    * duplicateGroups discipline, so round r never re-executes rounds
    * 1..r−1. Isolated vertices don't appear in the edge list and are not
    * returned. Returns (id, community). */
  def labelPropagation(edges: DataFrame, iters: Int,
                       checkpointEvery: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 32, "iters must be in [1,32]")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val sym = edges
      .select(col("src").as("v"), col("dst").as("nbr"))
      .union(edges.select(col("dst").as("v"), col("src").as("nbr")))
      .filter(col("v") =!= col("nbr"))
      .distinct()
      .localCheckpoint() // read once per round
    // the seed labels are read exactly once (the first round's join) —
    // only ROUND OUTPUTS pin, each being read once by the next round and
    // carrying the cumulative lineage worth cutting. Cadence: every-4th
    // round measured fastest, the same optimum as pageRank (PROBE_r7.json
    // `lpa_cadence`, 10× kNN graph: iters=8 3.44 s vs 4.62 s every-round,
    // iters=16 5.37 s vs 6.67 s — Catalyst replays the ≤3 un-pinned
    // rounds' joins cheaper than eagerly materializing each round). The
    // final round always pins, so short runs (gr_lpa's iters=2) are
    // unaffected and results are cadence-invariant by construction.
    var lbl = sym.select(col("v").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
    for (r <- 1 to iters) {
      val counts = sym
        .join(lbl.withColumnRenamed("id", "nbr"), "nbr")
        .groupBy(col("v"), col("lbl")).agg(count(lit(1)).as("c"))
      val next = counts
        .groupBy(col("v"))
        .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("m"))
        .select(col("v").as("id"), col("m.l").as("lbl"))
      lbl = if (r % checkpointEvery == 0 || r == iters) next.localCheckpoint()
            else next
    }
    lbl.select(col("id"), col("lbl").as("community"))
  }

  /** k-core decomposition by synchronous peeling (r9 session 3): after
    * `rounds` peels, the vertices still alive with their degree counted
    * against the PREVIOUS round's survivor set — the textbook iterate
    * (repeatedly drop vertices of degree < k) made deterministic for an
    * oracle by pinning the round count, exactly the pageRank/LPA/kmeans
    * discipline (a fixed iterate is portable to any engine; DuckDB
    * unrolls the same rounds as CTEs, `kcoreCtesFor`). Convergence is
    * OBSERVABLE in the result: a converged peel has every output degree
    * ≥ k (the spec and the catalog row both run to convergence).
    *
    * Scale shape per round: the symmetric edge list (read-once
    * localCheckpoint) is filtered by TWO semi-joins against the shrinking
    * survivor set (keyed shuffles, no broadcast assumption — the survivor
    * table is data-scaled on adversarial graphs) and one map-side-
    * combined degree aggregate; survivor tables pin per round (each read
    * twice by the next round). Never an all-pairs anything; O(rounds)
    * linear passes. */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1 && rounds <= 16, "rounds must be in [1,16]")
    val sym = edges
      .select(col("src").as("v"), col("dst").as("nbr"))
      .union(edges.select(col("dst").as("v"), col("src").as("nbr")))
      .filter(col("v") =!= col("nbr"))
      .distinct()
      .localCheckpoint()
    var alive = sym.select(col("v")).distinct()
    var deg: DataFrame = null
    // r14: stop peeling at the observable fixpoint. Each round's survivor
    // set is an inner-join filter of the previous one (alive_r ⊆
    // alive_{r−1}, monotone shrinking), so EQUAL COUNTS between
    // consecutive rounds imply EQUAL SETS — and once alive_r = alive_{r−1}
    // every further round recomputes the identical (deg, alive) pair. The
    // result after `rounds` rounds is therefore bit-identical with or
    // without the early exit (the 10-round oracle CTE unroll still
    // matches); what the exit saves is full passes over the edge list —
    // at sf0.1 the catalog's k=2 peel converges in 4 of its 10 rounds,
    // and at 100 TB each skipped round is two semi-joins plus an
    // aggregate over the corpus-scaled symmetric edge list. The per-round
    // count() is a cheap job over the just-checkpointed survivor table.
    var prevAlive = -1L
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      deg = sym
        .join(alive, "v")
        .join(alive.withColumnRenamed("v", "nbr"), "nbr")
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      alive = deg.filter(col("deg") >= k).select(col("v"))
        .localCheckpoint()
      val c = alive.count()
      converged = c == prevAlive
      prevAlive = c
      r += 1
    }
    // the final survivors with their last-round degree (counted against
    // the previous survivor set — equal to the in-core degree once
    // converged)
    deg.filter(col("deg") >= k).select(col("v").as("id"), col("deg"))
  }

  /** Connected components of an undirected edge list (`src`, `dst`).
    * Returns (id, group_id) for every vertex that appears as an endpoint,
    * where group_id is the component's MINIMUM vertex id — the same label
    * convention as [[Dedup.duplicateGroups]], whose size-adaptive core this
    * delegates to: pairs that fit on the driver resolve through
    * path-compressed union-find (zero iterative Spark rounds, one broadcast
    * join back), larger graphs through doubling label propagation
    * (O(log diameter) rounds, each a label-table join thousands of times
    * smaller than the corpus).
    *
    * This is the general-graph face of the machinery: duplicateGroups
    * answers "which docs are copies", this answers connectivity over ANY
    * edge set — kNN cluster extraction, citation components, session
    * stitching. */
  def connectedComponents(edges: DataFrame,
                          driverMaxPairs: Long = 10000000L): DataFrame = {
    val verts = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
    Dedup.duplicateGroups(verts,
        edges.select(col("src").as("id1"), col("dst").as("id2")),
        idCol = "id", driverMaxPairs = driverMaxPairs)
  }
}
