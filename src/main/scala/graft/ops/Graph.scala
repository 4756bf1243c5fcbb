package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph operators as DataFrame programs.
  *
  * Connected components uses the alternating large-star/small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14): every round is two shuffle-on-key aggregations, the
  * edge set only shrinks toward per-component stars, and convergence takes
  * O(log n) rounds even on pathological chains — the property that makes
  * it the 100 TB choice over naive min-label propagation (O(diameter)
  * rounds) or anything driver-side.
  */
object Graph {

  /** Connected components of an undirected edge list (cols `u`, `v`, any
    * integral type). Returns one row per distinct vertex: (u, root) where
    * root is the component's minimum vertex id — deterministic, so the
    * result is oracle-checkable against a transitive-closure twin.
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 25): DataFrame = {
    val spark = edges.sparkSession

    // large-star: for each u, m = min(Γ(u) ∪ {u}); connect every LARGER
    // neighbor to m. Operates on both edge directions.
    def largeStar(e: DataFrame): DataFrame = {
      val b = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val m = b.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      b.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // small-star: orient every edge (larger → smaller); for each u,
    // m = min of its smaller neighbors; connect u and all its smaller
    // neighbors to m.
    def smallStar(e: DataFrame): DataFrame = {
      val d = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
      val m = d.groupBy("u").agg(min(col("v")).as("m"))
      d.join(m, "u")
        .select(col("v").as("x"), col("m"))
        .union(m.select(col("u").as("x"), col("m")))
        .filter(col("x") =!= col("m"))
        .select(col("x").as("u"), col("m").as("v"))
        .distinct()
    }

    // Lineage truncation is load-bearing: each star phase references `e`
    // four times (both directions + the min side of its join), so without
    // truncation the logical plan grows ~16× PER ROUND — measured 24 MB of
    // plan / 1200 repeated scan leaves after two rounds, with every action
    // paying tens of seconds of driver-side analysis over it. Eager
    // localCheckpoint materializes the round's edges and replaces the plan
    // with a leaf, keeping per-round driver cost constant — the standard
    // iterative-DataFrame discipline (MLlib does the same). On a real
    // cluster a reliable `checkpoint` (HDFS-backed) would be used so
    // executor loss cannot drop blocks; local mode has no such loss.
    var e = edges.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    var eCount = e.count()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      // fixpoint test on canonicalized sets (both sides are (larger,
      // smaller)-oriented and distinct): set equality ⇔ same count AND
      // empty difference; the exceptAll runs only on count-stable rounds.
      val nextCount = next.count()
      converged = nextCount == eCount && next.exceptAll(e).isEmpty
      e = next
      eCount = nextCount
      rounds += 1
    }
    // A round-capped exit would silently emit PARTIAL components (the
    // star-forest extraction below assumes a fixpoint) — fail loudly
    // instead. O(log n) convergence makes the default cap generous: 25
    // rounds covers component chains far beyond any real corpus.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxRounds rounds " +
          s"($eCount edges remain); raise maxRounds")
    // converged edge set is a star forest: (member, root) with root = the
    // component min; roots map to themselves
    e.select(col("u"), col("v").as("root"))
      .union(e.select(col("v").as("u"), col("v").as("root")))
      .distinct()
  }

  /** PageRank over a directed edge list (cols `src`, `dst`, integral
    * type) in exact int64 fixed-point: total mass 10⁹, per-edge share
    * `pr DIV outdeg`, damping 0.85 as `(x·85) DIV 100`, dangling mass
    * redistributed `DIV n` per node. Integer sums are order-independent,
    * so the result is BIT-EXACT across engines, partitionings, and
    * reruns — unlike float PageRank — which is what makes the unrolled
    * SQL oracle twin (q115) possible. Truncation bleeds ~1 ppb of mass
    * per DIV; deterministic, and irrelevant to ranking.
    *
    * Scale shape: per iteration ONE shuffle (the contribution
    * groupBy(dst)); the dangling total is a one-row broadcast cross; the
    * per-iteration eager localCheckpoint is the same lineage-truncation
    * discipline as [[connectedComponents]] (a reliable checkpoint on a
    * real cluster). At 100 TB ranks and edges pre-bucket on the node key
    * so the ranks⋈edges join is shuffle-free.
    *
    * Returns one row per distinct vertex: (node, pr).
    */
  def pageRank(edgesIn: DataFrame, iters: Int = 5): DataFrame = {
    val scale = 1000000000L
    val edges = edgesIn.select(col("src"), col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge list")
    val eo = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint(true)
    val dangling = nodes
      .join(edges.select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
      .localCheckpoint(true)
    val tele = (scale * 15 / 100) / n // exact long math = 150000000 // n
    var pr = nodes.select(col("node"), lit(scale / n).as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val inSum = eo.join(pr, eo("src") === pr("node"))
        .select(col("dst").as("node"), expr("pr DIV outdeg").as("share"))
        .groupBy("node").agg(sum("share").as("in_sum"))
      val dangSum = pr.join(dangling, Seq("node"), "left_semi")
        .agg(coalesce(sum("pr"), lit(0L)).as("dang"))
      pr = nodes.join(inSum, Seq("node"), "left")
        .crossJoin(org.apache.spark.sql.functions.broadcast(dangSum))
        .select(col("node"),
          expr(s"CAST($tele AS BIGINT) + ((coalesce(in_sum, CAST(0 AS BIGINT))" +
            s" + dang DIV CAST($n AS BIGINT)) * 85) DIV 100").as("pr"))
        .localCheckpoint(true)
    }
    pr
  }
}
