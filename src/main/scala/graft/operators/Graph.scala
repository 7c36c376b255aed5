package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation. Web-scale quality filtering
  * weighs documents by the authority of their source (the
  * CommonCrawl-lineage pipelines rank hosts by link centrality before
  * sampling), and [[graft.text.HtmlLib]]'s `html_links` already surfaces
  * the raw edges — this is the aggregation that turns them into a signal.
  */
object Graph {

  /** Lineage truncation for the iterative loops: executor-local
    * checkpoint blocks by default (fast, the right call on local[k]);
    * `checkpointDir` opts into RELIABLE checkpoints so an executor loss
    * mid-iteration on a real cluster recomputes from storage instead of
    * killing the job. Results are identical either way (spec-pinned). */
  private def truncator(any: DataFrame, checkpointDir: Option[String])
      : (DataFrame, Boolean) => DataFrame = {
    checkpointDir.foreach(any.sparkSession.sparkContext.setCheckpointDir)
    // layout-preserving (AQE's stock checkpoint reports
    // UnknownPartitioning — see SparkInternals.checkpointKeepLayout): the
    // pre-partitioned edge list keeps its hash layout across iterations.
    // pin = false for first materializations whose layout the caller
    // re-pins right after (their stages stay AQE-coalesced).
    (df, pin) => org.apache.spark.sql.graft.SparkInternals
      .checkpointKeepLayout(df, reliable = checkpointDir.isDefined,
        pinLayout = pin)
  }

  /** HITS (Kleinberg 1999): mutually-reinforcing hub and authority
    * scores — `a = Aᵀh`, `h = Aa`, L2-normalized each half-step. Where
    * PageRank measures global endorsement, HITS separates "links to good
    * pages" (hub — a crawl frontier signal) from "is linked by good hubs"
    * (authority — a content-quality signal).
    *
    * Scale shape per iteration: two equality joins against the
    * pre-partitioned edge list + two combinable sums + two 1-row norm
    * aggregates; lineage truncated per iteration ([[pageRank]]'s
    * discipline). Nodes with no in-links get authority 0, no out-links
    * hub 0 — the standard convention. */
  def hits(edges: DataFrame, iters: Int = 3,
      srcCol: String = "src", dstCol: String = "dst",
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val truncate = truncator(edges, checkpointDir)
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    // NO layout pinning here (unlike pageRank/labelPropagation): the two
    // half-step joins key on src and dst ALTERNATELY, so no single hash
    // layout is reusable, and pinning the loop to a few partitions
    // serializes the norm-aggregate branches (measured 1.9 -> 3.0 s at
    // sf0.1) — AQE coalescing is the right default for this loop.
    val e = truncate(e0, false)
    val nodes = truncate(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct(), false)
    var scores = truncate(nodes
      .withColumn("hub", lit(1.0)).withColumn("auth", lit(1.0)), false)
    var it = 0
    while (it < iters) {
      // authority update: sum of in-neighbor hubs, then L2 normalize
      val aRaw = nodes.join(
        e.join(scores.select(col("id").as("src"), col("hub")), Seq("src"))
          .groupBy(col("dst").as("id")).agg(sum(col("hub")).as("ar")),
        Seq("id"), "left").na.fill(0.0, Seq("ar"))
      val aNorm = aRaw.agg(sqrt(sum(col("ar") * col("ar"))).as("n"))
      val withAuth = aRaw.crossJoin(aNorm)
        .withColumn("auth", when(col("n") > 0, col("ar") / col("n"))
          .otherwise(0.0))
        .select(col("id"), col("auth"))
      // hub update: sum of out-neighbor authorities, normalize
      val hRaw = nodes.join(
        e.join(withAuth.select(col("id").as("dst"), col("auth")), Seq("dst"))
          .groupBy(col("src").as("id")).agg(sum(col("auth")).as("hr")),
        Seq("id"), "left").na.fill(0.0, Seq("hr"))
      val hNorm = hRaw.agg(sqrt(sum(col("hr") * col("hr"))).as("n"))
      scores = truncate(hRaw.crossJoin(hNorm)
        .withColumn("hub", when(col("n") > 0, col("hr") / col("n"))
          .otherwise(0.0))
        .select(col("id"), col("hub"))
        .join(withAuth, Seq("id")), false)
      it += 1
    }
    scores.select(col("id"), col("hub"), col("auth"))
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007), determinized: labels start as vertex ids; each round every
    * vertex adopts the MOST FREQUENT label among its neighbors, ties
    * broken by the smallest label (classic LPA breaks ties randomly —
    * that, and asynchronous update order, are exactly the two
    * nondeterminism sources this pins down so an oracle can replay the
    * run). Fixed `iters` rounds, no convergence test: synchronous LPA
    * can 2-cycle on bipartite structure, so a fixed-round contract is
    * the honest one (GraphX's LabelPropagation ships the same caveat).
    *
    * Scale shape per round: one equality join of the symmetric edge list
    * (pre-partitioned by src, layout reused every round) against the
    * k→label map, a combinable (dst, label) count, and a two-pass
    * argmax collapse (primitive max, vertex-scale join-back, min-label
    * tie-break) — every aggregate map-side combinable, lineage truncated
    * per round. Isolated vertices never appear (edges define the vertex
    * set); a vertex keeps its label only through self-reinforcement.
    * Returns `(id, label)` for every vertex incident to an edge. */
  def labelPropagation(edges: DataFrame, iters: Int = 2,
      srcCol: String = "src", dstCol: String = "dst",
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    val truncate = truncator(edges, checkpointDir)
    val spark = edges.sparkSession
    val raw = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
    // observed edge count pins the loop's shuffle layout (LoopLayout)
    val undObs = raw
      .union(raw.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src"))
      .observe("__graft_lp_edges", count(lit(1)).as("n"))
    var und = truncate(undObs, false)
    val nEdges = undObs.queryExecution
      .observedMetrics("__graft_lp_edges").getLong(0)
    val p = LoopLayout.partitionsFor(spark, nEdges)
    LoopLayout.withShufflePartitions(spark, p) {
    // re-pin UNCONDITIONALLY (not only when p < confN): the first
    // checkpoint is unpinned (its claim is UnknownPartitioning — pinning
    // it would disable AQE coalescing for the whole upstream pipeline),
    // so at cluster scale skipping the re-pin left the loop re-exchanging
    // 2|E| per round. One sorted re-exchange of the checkpointed RDD buys
    // every round's layout (and, on the no-broadcast fallback, the
    // merge-join ordering) — the clusters() fix, applied here too.
    und = truncate(und.repartition(col("src"))
      .sortWithinPartitions("src"), true)
    var labels = truncate(und.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")), true)
    var it = 0
    while (it < iters) {
      // neighbor labels arrive over the reused src-partitioned layout;
      // two-pass argmax: a struct-ordered max/max_by would SortAggregate
      // the edge-scale neighbor-label table (struct buffers are not
      // hash-aggregable in Spark 4.1); primitive max + join-back + min
      // keeps every aggregate a combinable HashAggregate, with the
      // join-back at vertex scale on the partitioning the count
      // aggregate already established
      // cnt feeds BOTH the max pass and the join-back — materialize it
      // per round, or the edge-scale join+aggregate runs twice (exchange
      // reuse only dedups the shuffle, not the probe)
      val cnt = truncate(und
        .join(labels.select(col("id").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("_c")), true)
      val top = cnt.groupBy(col("id")).agg(max(col("_c")).as("_mc"))
      val next = cnt.join(top, Seq("id"))
        .filter(col("_c") === col("_mc"))
        .groupBy(col("id"))
        .agg(min(col("label")).as("label"))
      labels = truncate(next, true)
      it += 1
    }
    labels.select(col("id"), col("label"))
    } // withShufflePartitions
  }

  /** Per-vertex triangle counting by degree-ordered edge orientation
    * (Cohen 2009, "Graph twiddling in a MapReduce world"; the same
    * orientation GraphX's TriangleCount and Trino's graph extensions
    * use). A triangle's link-graph reading: mutually-citing page triples,
    * the unit of the local clustering coefficient that separates organic
    * link neighborhoods from link-farm stars (stars have none).
    *
    * Scale shape — the naive 3-way edge self-join explodes on the
    * high-degree vertices every web graph has (a hub of degree d yields
    * d² wedges). Orienting each undirected edge from its (degree, id)-
    * smaller endpoint to its larger caps every oriented out-degree at
    * O(√m), so the wedge join materializes O(m^{3/2}) rows worst case —
    * the sort-by-degree bound of Schank & Wagner 2005 — and each triangle
    * is generated EXACTLY once (its vertices totally ordered by
    * (degree, id), the wedge pivots at the smallest). Three shuffles
    * total: degree aggregate, wedge self-join on the pivot, existence
    * semi-join on the closing edge.
    *
    * Input edges are read as undirected (direction, duplicates, and
    * self-loops are normalized away). Returns `(id, tri_count)` for every
    * vertex incident to an edge, zeros included. */
  def triangles(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val raw = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
    // symmetric closure so degree = undirected degree and each endpoint
    // sees every incident edge exactly once
    val und = raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    // orient u→v iff (deg_u, u) < (deg_v, v): one direction per edge
    val oriented = und
      .join(deg.select(col("id").as("src"), col("deg").as("du")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("deg").as("dv")), Seq("dst"))
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("src") < col("dst")))
      .select(col("src").as("u"), col("dst").as("v"),
        col("dv").as("degv"))
    // wedges pivoted at u with the two far ends themselves ordered, so
    // the closing edge (v,w) is oriented exactly v→w
    val wedges = oriented.select(col("u"), col("v"), col("degv"))
      .join(oriented.select(col("u"), col("v").as("w"),
        col("degv").as("degw")), Seq("u"))
      .filter(col("degv") < col("degw") ||
        (col("degv") === col("degw") && col("v") < col("w")))
      .select(col("u"), col("v"), col("w"))
    val tris = wedges.join(oriented.select(col("u").as("v"),
      col("v").as("w")), Seq("v", "w"), "left_semi")
    val perVertex = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("_tc"))
    deg.select(col("id"))
      .join(perVertex, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("_tc"), lit(0L)).as("tri_count"))
  }

  /** k-hop reachability counts on a DIRECTED graph: for every vertex
    * with at least one out-edge, the number of DISTINCT vertices
    * reachable in 1..k hops, the origin itself always excluded (a cycle
    * back to it does not count). The neighborhood-size profile is the standard
    * link-graph feature for hub/spam scoring a crawl pipeline computes
    * next to PageRank.
    *
    * Scale shape: k−1 frontier-expansion equality joins on the edge
    * list, each followed by a distinct on (origin, reached) — the honest
    * cost of exact neighborhoods, bounded by keeping k small (2..3 in
    * practice; the frontier table is O(Σ |N_k(v)|), which is what you
    * asked to count). The per-round distinct keeps the frontier a SET,
    * so multiplicity never compounds across rounds — paths are
    * deduplicated as they form, not at the end. Lineage is truncated per
    * round on a cluster via `checkpointDir` ([[pageRank]] discipline). */
  def kHopReach(edges: DataFrame, k: Int,
      srcCol: String = "src", dstCol: String = "dst",
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val truncate = truncator(edges, checkpointDir)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
    // reached(origin, v): v reachable from origin in <= current hops.
    // The first frontier checkpoint observes its size and pins the
    // remaining hops' shuffle layout (LoopLayout).
    var reached = e.select(col("src").as("origin"), col("dst").as("v"))
    val spark = edges.sparkSession
    var pinned: Option[Int] = None
    var hop = 1
    try {
      while (hop < k) {
        val expanded = reached
          .join(e.select(col("src").as("v"), col("dst").as("v2")), Seq("v"))
          .select(col("origin"), col("v2").as("v"))
          .filter(col("origin") =!= col("v")) // self via cycle: drop
        val obsName = s"__graft_khop_$hop"
        val nextObs = reached.union(expanded).distinct()
          .observe(obsName, count(lit(1)).as("n"))
        reached = truncate(nextObs, false)
        if (pinned.isEmpty && hop + 1 < k) {
          val nReached = nextObs.queryExecution
            .observedMetrics(obsName).getLong(0)
          val p = LoopLayout.partitionsFor(spark, nReached)
          pinned = Some(org.apache.spark.sql.graft.SparkInternals
            .sqlConf(spark).numShufflePartitions)
          spark.conf.set("spark.sql.shuffle.partitions", p.toString)
        }
        hop += 1
      }
    } finally pinned.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    reached.groupBy(col("origin").as("id"))
      .agg(count(lit(1)).as("reach_count"))
  }

  /** PageRank (Page et al. 1999) by power iteration.
    *
    * Scale shape: out-degrees are one map-side-combinable aggregate,
    * joined back once and CHECKPOINTED with the edge list pre-partitioned
    * by source — each iteration is then one equality join (contribution
    * scatter, reusing the edge layout), one combinable sum by dst, and a
    * left join back to the node set; `localCheckpoint` truncates lineage
    * so plan depth stays O(1) across iterations (the [[Dedup.clusters]]
    * discipline). Dangling mass (nodes with no out-links) is summed in a
    * 1-row aggregate per iteration and redistributed uniformly, keeping
    * Σ rank = 1 exactly — the invariant the spec pins.
    *
    * Returns `(id, rank)` over every node appearing as source OR target. */
  def pageRank(edges: DataFrame, iters: Int = 3, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst",
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(damping > 0 && damping < 1, s"damping in (0,1): $damping")
    val truncate = truncator(edges, checkpointDir)
    val spark = edges.sparkSession
    // edge count rides the edge checkpoint's job and pins the loop's
    // shuffle layout (LoopLayout); node count rides the node checkpoint
    // (no standalone count() action); the dangling probe rides the ranks
    // init — three driver round-trips fold into jobs that ran anyway
    val eObs = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .repartition(col("src"))
      .observe("__graft_pr_edges", count(lit(1)).as("n"))
    var e = truncate(eObs, false)
    val nEdges = eObs.queryExecution
      .observedMetrics("__graft_pr_edges").getLong(0)
    val p = LoopLayout.partitionsFor(spark, nEdges)
    LoopLayout.withShufflePartitions(spark, p) {
    // unconditional sorted re-pin — see labelPropagation: the unpinned
    // first checkpoint claims no layout, so at p == conf-N the loop would
    // re-exchange the edges every iteration without this
    e = truncate(e.repartition(col("src"))
      .sortWithinPartitions("src"), true)
    // the node count comes from the node checkpoint's own count() action
    // (exact by construction — it feeds every rank), not a standalone
    // count() job and not an observe metric
    val (nodes, nNodes) = org.apache.spark.sql.graft.SparkInternals
      .checkpointKeepLayoutCounted(
        e.select(col("src").as("id"))
          .union(e.select(col("dst").as("id")))
          .distinct(),
        reliable = checkpointDir.isDefined)
    val n = nNodes.toDouble
    val odeg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("odeg"))
    // graphs with no dangling nodes (every node links out — common for
    // synthetic/link-complete graphs) skip the per-iteration dangling-mass
    // aggregate entirely: the probe rides the ranks-init checkpoint
    val ranksObs = nodes.join(odeg, Seq("id"), "left")
      .na.fill(0L, Seq("odeg"))
      .withColumn("rank", lit(1.0 / n))
      .observe("__graft_pr_dangling",
        sum(when(col("odeg") === 0, 1L).otherwise(0L)).as("nd"))
    var ranks = truncate(ranksObs, true)
    val dRow = ranksObs.queryExecution.observedMetrics("__graft_pr_dangling")
    val hasDangling = !dRow.isNullAt(0) && dRow.getLong(0) > 0L
    var it = 0
    while (it < iters) {
      // odeg-0 (dangling) rows never survive the inner join on src, but
      // the projection can evaluate BEFORE the join depending on plan
      // shape (a sort/exchange below the join materializes it) and ANSI
      // division then aborts on the 0 — guard it; value-identical for
      // every surviving row (all have odeg >= 1)
      val contrib = e.join(ranks.select(col("id").as("src"),
          when(col("odeg") =!= 0, col("rank") / col("odeg")).as("c")),
          Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("c")).as("inflow"))
      val base = ranks.select(col("id"), col("odeg"))
        .join(contrib, Seq("id"), "left")
      val withDm =
        if (hasDangling) {
          val dangling = ranks.filter(col("odeg") === 0)
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
          base.crossJoin(dangling)
        } else base.withColumn("dm", lit(0.0))
      val next = withDm
        .withColumn("rank",
          lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("inflow"), lit(0.0)) + col("dm") / n))
        .select(col("id"), col("odeg"), col("rank"))
      ranks = truncate(next, true)
      it += 1
    }
    ranks.select(col("id"), col("rank"))
    } // withShufflePartitions
  }
}
