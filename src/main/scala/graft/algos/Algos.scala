package graft.algos

import org.apache.spark.graphx.{Edge, EdgeTriplet, Graph, VertexId, PartitionStrategy}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** Graph algorithms — the Spark re-expression of fermor graph/algo.clj.
  *
  * Iterative whole-graph algorithms (CC, SCC, BFS, PageRank, triangles,
  * label propagation) run on GraphX/Pregel: vertex-parallel, partitioned,
  * and checkpoint-friendly — the right execution model for 100 TB graphs,
  * where fermor's single-heap recursion (algo.clj walks Java arrays) cannot
  * go. Order-dependent compiler analyses (dominators, DFS numberings —
  * algo.clj:immediate-dominators, post-order-numbering) are inherently
  * sequential on DFS order; like the reference we run them single-node, but
  * behind an API that first *distributedly* extracts + filters the CFG-scale
  * subgraph (program CFGs are ~10³-10⁶ vertices — driver-sized by nature).
  */
object Algos {

  private def edgeRdd(edges: DataFrame): RDD[Edge[Int]] =
    edges.select("src", "dst").rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))

  /** Path-halving min-root union-find over long labels (shared by the
    * guarded CC replay and kruskalAccept): union points the LARGER root at
    * the smaller, so every tree's root is its component's minimum member —
    * find() IS the min-id component label. */
  private final class MinUnionFind {
    private val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(z: Long): Long = {
      var p = z
      while (parent.getOrElse(p, p) != p) {
        val gp = parent.getOrElse(parent(p), parent(p))
        parent(p) = gp; p = gp
      }
      p
    }
    /** true iff the two were in different components (an edge was accepted). */
    def union(a: Long, b: Long): Boolean = {
      val ra = find(a); val rb = find(b)
      if (ra == rb) false
      else { parent(math.max(ra, rb)) = math.min(ra, rb); true }
    }
  }

  /** true iff every named column is an integral type — the precondition for
    * a guarded local replay's typed long collect. A string id would
    * cast('long') to NULL (silent corruption) and a float would truncate;
    * such inputs stay on the distributed path, which treats them exactly as
    * before the replays existed. */
  private def integralCols(df: DataFrame, names: String*): Boolean = {
    import org.apache.spark.sql.types._
    names.forall { n =>
      df.schema(n).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }
  }

  private def buildGraph(vertices: DataFrame, edges: DataFrame): Graph[Long, Int] = {
    val vs = vertices.select(vertices.columns.head).rdd.map(r => (r.getLong(0), r.getLong(0)))
    Graph(vs, edgeRdd(edges))
  }

  /** Connected components (fermor algo.clj `connected-components`):
    * component id = min vertex id — a UNIQUE answer, so both regimes agree
    * bit-for-bit (parity-spec'd):
    *
    *  - below the guard, a local min-root union-find over the collected
    *    edge list (the kCore/MIS/matching guarded-replay pattern): one
    *    linear pass replaces GraphX's per-superstep scheduling latency.
    *    The 50k default is MEASURED (sf0.1 local[32], warm): at 5k edges
    *    local wins ~3× (0.7 vs 2.0-2.3 s — the dedup-cluster pair-graph
    *    shape), at 50k ~2× (1.1 vs 2.3 s), at 165k it is a tie (~0.9 s
    *    both — output materialization dominates), so larger inputs stay
    *    on GraphX;
    *  - distributed, GraphX Pregel min-id propagation. Pregel costs one
    *    superstep per hop — the right trade on the small-diameter graphs
    *    this serves (FK stars, near-dup pair graphs, where it converges in
    *    ~3 cheap iterations and beats the alternating algorithm's per-round
    *    fixed costs measured 2-3× here). For diameter-unbounded inputs
    *    (chains, long paths) use [[ccAlternating]], whose round count is
    *    O(log² n) regardless of depth.
    *
    * Output universe matches GraphX's graph: `vertices` ∪ edge endpoints
    * (endpoints absent from `vertices` still get a component; isolated
    * vertices are their own). */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      localMaxEdges: Long = 50000L)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val headV = vertices.columns.head
    // one narrow lazy materialization shared by the guard probe, the local
    // collect, and the GraphX conversion — a derived edge graph evaluates
    // its upstream once, not once per consumer (the kTruss probe rule)
    val e0 = edges.select(col("src"), col("dst")).localCheckpoint(eager = false)
    val vs0 = vertices.select(col(headV).as("id")).localCheckpoint(eager = false)
    if (integralCols(e0, "src", "dst") && integralCols(vs0, "id")) {
      // probe + collect fused into one action per frame (collectAtMost);
      // null ids make the Opts empty and fall through — GraphX's typed
      // conversion raises the same loud failure it always has for them
      val eOpt = collectPairsAtMost(
        e0.select(col("src").cast("long"), col("dst").cast("long")), localMaxEdges)
      val vOpt = if (eOpt.isEmpty) None
        else collectLongsAtMost(vs0.select(col("id").cast("long")), localMaxEdges)
      if (eOpt.isDefined && vOpt.isDefined) {
        val uf = new MinUnionFind
        eOpt.get.foreach { case (s, d) => uf.union(s, d) }
        val universe = scala.collection.mutable.LinkedHashSet[Long]()
        vOpt.get.foreach(universe += _)
        eOpt.get.foreach { case (s, d) => universe += s; universe += d }
        return universe.iterator.map(v => (v, uf.find(v))).toSeq.toDF("id", "component")
      }
    }
    buildGraph(vs0, e0).connectedComponents()
      .vertices.toDF("id", "component")
  }

  /** Strongly connected components (fermor algo.clj
    * `strongly-connected-components`): component id = min member id.
    *
    * Hybrid trim + residual design (the standard scale recipe from the
    * FW-BW/coloring SCC literature): repeatedly TRIM vertices whose in- or
    * out-degree is zero within the remaining subgraph — such vertices cannot
    * lie on a cycle, so they are singleton SCCs (component = own id). Each
    * trim round is two semi-joins on a shrinking vertex set, all distributed.
    * On real data (FK hierarchies, mostly-acyclic web/link graphs) trimming
    * removes the overwhelming majority of vertices in a handful of rounds;
    * the small cyclic residual is solved exactly with driver-side Tarjan
    * (the same CFG-scale hybrid as [[immediateDominators]]). A residual too
    * large to collect falls back to GraphX's Pregel SCC on just the residual
    * subgraph — strictly less work than running it on the whole graph. */
  def stronglyConnectedComponents(vertices: DataFrame, edges: DataFrame, numIter: Int = 20,
      residualMax: Long = 2000000)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val vs0 = vertices.select(col(vertices.columns.head).as("id"))
    // guarded WHOLE-GRAPH Tarjan before any distributed trimming: the trim
    // loop exists to shrink a graph too big to collect, but below the
    // residual guard the ~2 actions/round it schedules ARE the query's cost
    // (q_cycles: 29 jobs of trim for 1.5 s of task time). SCC labels are a
    // unique integer fact (min member id), so skipping the trim cannot
    // change them; edges are restricted to the vs0-induced subgraph exactly
    // like the trim loop's keep-semijoins restrict e. LongType-only gate:
    // the distributed path preserves vs0's id type in its output schema,
    // and the local toDF emits longs — narrower int ids stay distributed.
    // Raw-pair guard (counting before the dedup skips that shuffle; the
    // local succ-build dedups anyway); null ids fall back (the distributed
    // join semantics are the definition). The residualMax=0 parity spec
    // forces the old path and pins equality.
    val allLong = {
      import org.apache.spark.sql.types.LongType
      vs0.schema.head.dataType == LongType &&
        edges.schema(edges.schema.fieldIndex("src")).dataType == LongType &&
        edges.schema(edges.schema.fieldIndex("dst")).dataType == LongType
    }
    if (allLong) {
      val eOpt = collectPairsAtMost(
        edges.select(col("src"), col("dst")).where(col("src") =!= col("dst")),
        residualMax)
      val vOpt = if (eOpt.isEmpty) None else collectLongsAtMost(vs0, residualMax)
      if (eOpt.isDefined && vOpt.isDefined) {
        val ids = vOpt.get
        val vset = ids.toSet
        // Gate, don't filter: both pre-existing paths let a cycle run
        // THROUGH endpoints absent from `vertices` (GraphX's Graph()
        // auto-adds them; the converged-without-trim residual Tarjan
        // collects e unfiltered), so silently dropping their edges here
        // could split an SCC and change labels vs the old behavior.
        // Inputs with edge-only pass-through vertices fall back to the
        // distributed path, whose semantics are the definition
        // (parity-spec'd in AlgosSpec).
        if (eOpt.get.forall { case (s, d) => vset.contains(s) && vset.contains(d) })
          return tarjanScc(ids, eOpt.get).toSeq.toDF("id", "component")
      }
    }
    // self-loops make a vertex cyclic but never a multi-member SCC; drop them
    // so trimming sees the true cross-vertex cycle structure
    val e0 = edges.select("src", "dst").where(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
    var remaining = vs0.localCheckpoint(eager = false)
    var e = e0.localCheckpoint(eager = false)
    var prev = remaining.count()
    var converged = prev == 0
    var round = 0
    while (!converged && round < 100) {
      val srcs = e.select(col("src").as("id")).dropDuplicates("id")
      val dsts = e.select(col("dst").as("id")).dropDuplicates("id")
      val keep = remaining
        .join(srcs, Seq("id"), "left_semi")
        .join(dsts, Seq("id"), "left_semi")
        .localCheckpoint(eager = false)
      val n = keep.count()
      if (n == prev) converged = true
      else {
        remaining = keep
        e = e
          .join(keep.select(col("id").as("src")), Seq("src"), "left_semi")
          .join(keep.select(col("id").as("dst")), Seq("dst"), "left_semi")
          .localCheckpoint(eager = false)
        prev = n
        converged = n == 0
      }
      round += 1
    }
    val residualComps: DataFrame =
      if (prev == 0) Seq.empty[(Long, Long)].toDF("id", "component")
      // gate on BOTH vertex and edge count before collecting: a dense cyclic
      // residual under the vertex cap can still hold edge counts that OOM the
      // driver; the edge count is one cheap agg on the already-materialized
      // residual edge table
      else if (prev <= residualMax && e.count() <= residualMax) {
        val es = e.as[(Long, Long)].collect()
        val ids = remaining.as[Long].collect()
        tarjanScc(ids, es).toSeq.toDF("id", "component")
      } else {
        buildGraph(remaining, e).stronglyConnectedComponents(numIter)
          .vertices.toDF("id", "component")
      }
    vs0.join(residualComps.withColumnRenamed("component", "__rc"), Seq("id"), "left")
      .select(col("id"), coalesce(col("__rc"), col("id")).as("component"))
  }

  /** Iterative Tarjan SCC; component label = min member id. */
  private def tarjanScc(ids: Array[Long], es: Array[(Long, Long)]): Array[(Long, Long)] = {
    val succ = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.sorted }
    val index = scala.collection.mutable.HashMap[Long, Int]()
    val lowlink = scala.collection.mutable.HashMap[Long, Int]()
    val onStack = scala.collection.mutable.HashSet[Long]()
    val tstack = scala.collection.mutable.Stack[Long]()
    val comp = scala.collection.mutable.HashMap[Long, Long]()
    var counter = 0
    ids.sorted.foreach { root =>
      if (!index.contains(root)) {
        val work = scala.collection.mutable.Stack[(Long, Iterator[Long])]()
        index(root) = counter; lowlink(root) = counter; counter += 1
        tstack.push(root); onStack += root
        work.push((root, succ.getOrElse(root, Array.empty[Long]).iterator))
        while (work.nonEmpty) {
          val (u, it) = work.top
          if (it.hasNext) {
            val v = it.next()
            if (!index.contains(v)) {
              index(v) = counter; lowlink(v) = counter; counter += 1
              tstack.push(v); onStack += v
              work.push((v, succ.getOrElse(v, Array.empty[Long]).iterator))
            } else if (onStack(v)) lowlink(u) = math.min(lowlink(u), index(v))
          } else {
            work.pop()
            if (work.nonEmpty) {
              val (p, _) = work.top
              lowlink(p) = math.min(lowlink(p), lowlink(u))
            }
            if (lowlink(u) == index(u)) {
              val members = scala.collection.mutable.ArrayBuffer[Long]()
              var done = false
              while (!done) {
                val w = tstack.pop(); onStack -= w; members += w
                if (w == u) done = true
              }
              val label = members.min
              members.foreach(m => comp(m) = label)
            }
          }
        }
      }
    }
    ids.map(v => (v, comp.getOrElse(v, v)))
  }

  /** SCCs with >1 member = the cycle skeleton (fermor `cycles` /
    * `strongly-connected-subgraphs`). */
  def nontrivialSccs(vertices: DataFrame, edges: DataFrame, numIter: Int = 20)(
      implicit spark: SparkSession): DataFrame = {
    val scc = stronglyConnectedComponents(vertices, edges, numIter)
    val big = scc.groupBy("component").agg(count(lit(1)).as("n")).where(col("n") > 1)
    scc.join(big.select("component"), Seq("component"), "left_semi")
      .select("id", "component") // a USING join reorders the key first
  }

  /** Unweighted BFS distances from a source set (fermor algo.clj
    * `shortest-path`, `breadth-first-nodes`). `reverse` follows edges
    * dst→src (e.g. down a FK hierarchy). Returns reachable (id, dist).
    *
    * Level-synchronous DataFrame delta BFS: each round expands only the
    * newest frontier (semi-join on the deduped edge table) and anti-joins
    * the visited set, so per-round work tracks frontier size — the same
    * shape GraphX Pregel computes, without the RDD conversion and
    * vertex-state machinery, and AQE-planned per round. */
  /** Memoized per (session, edge plan, source plan, direction, bound) under
    * scan sharing: different queries over the same graph genuinely reuse the
    * same BFS tree (q_between's backward pass IS q_sssp's distance table).
    * Keys hash the CALLER's plans — pre-checkpoint, so they repeat. */
  private val bfsCache =
    scala.collection.concurrent.TrieMap[(SparkSession, Int, Int, Boolean, Int), DataFrame]()

  def bfsDistances(vertices: DataFrame, edges: DataFrame, sources: DataFrame,
      reverse: Boolean = false, maxIter: Int = 1000)(implicit spark: SparkSession): DataFrame = {
    def run(): DataFrame = {
      val (from, to) = if (reverse) ("dst", "src") else ("src", "dst")
      // duplicate edges are harmless (per-round dropDuplicates on ids): no
      // dedup shuffle, just one narrow materialization shared by the rounds
      val e = edges.select(col(from).as("__from"), col(to).as("__to"))
        .localCheckpoint(eager = false)
      bfsOnPrepared(e, sources, maxIter)
    }
    if (!graft.graph.Tpch.shareScans) run()
    else {
      if (bfsCache.size > 64) bfsCache.clear() // bound: never pin plans forever
      bfsCache.getOrElseUpdate(
      (spark, edges.queryExecution.analyzed.semanticHash(),
        sources.queryExecution.analyzed.semanticHash(), reverse, maxIter),
        run().localCheckpoint(eager = false))
    }
  }

  /** BFS over an already-materialized (__from, __to) edge frame — lets
    * callers running several passes over the same graph (verticesBetween)
    * share ONE narrow edge materialization instead of one per pass. */
  private def bfsOnPrepared(e: DataFrame, sources: DataFrame, maxIter: Int): DataFrame = {
    var dist = sources.select(col(sources.columns.head).as("id")).dropDuplicates("id")
      .withColumn("dist", lit(0)).localCheckpoint(eager = false)
    var frontier = dist
    var d = 0
    var done = false
    while (!done && d < maxIter) {
      // lazy checkpoint + count = ONE action per round: count scans every
      // partition, completing the checkpoint the round's joins then read
      val next = e.join(frontier.select(col("id").as("__from")), Seq("__from"), "left_semi")
        .select(col("__to").as("id")).dropDuplicates("id")
        .join(dist, Seq("id"), "left_anti")
        .withColumn("dist", lit(d + 1))
        .localCheckpoint(eager = false)
      if (next.count() == 0L) done = true
      else { dist = dist.unionByName(next).localCheckpoint(eager = false); frontier = next }
      d += 1
    }
    dist
  }

  /** Weighted shortest path by distributed delta-relaxation (fermor
    * algo.clj:92 `shortest-path`, which takes a per-edge cost fn and an
    * accept predicate). `cost` is a Column over the edge row (must evaluate
    * to a strictly positive long — the exactness convention: integer costs
    * hash-match across engines). Each round relaxes only edges out of the
    * newest improved frontier: a keyed join + min-merge against the distance
    * table, the Bellman-Ford/delta-stepping shape that scales (per-round work
    * tracks frontier size; no priority queue, no driver state). Returns every
    * reachable (id, cost) with cost = minimal path cost from any source. */
  def weightedShortestPath(edges: DataFrame, sources: DataFrame, cost: Column,
      reverse: Boolean = false, maxIter: Int = 50,
      localMaxEdges: Long = 50000L)(implicit spark: SparkSession): DataFrame =
    relaxLoop(edges, sources, cost, reverse, maxIter, accept = None, localMaxEdges)

  /** [[weightedShortestPath]] + PARENT POINTERS — the reference's
    * shortest-path returns the actual path; distributed, the path tree IS
    * the parent column (walk it back with k joins, or emit it to callers
    * as-is). Deterministic: per vertex the lexicographically least
    * (cost, parent) pair — parent = the least-id predecessor among those on
    * a minimal-cost path. Sources carry a null parent. */
  def weightedShortestPathWithParent(edges: DataFrame, sources: DataFrame, cost: Column,
      reverse: Boolean = false, maxIter: Int = 50,
      localMaxEdges: Long = 50000L)(implicit spark: SparkSession): DataFrame = {
    // Two phases, not a fatter loop: (1) the plain cost relaxation to its
    // fixpoint (narrow 2-column rounds), then (2) ONE post-pass join derives
    // parents from the optimality invariant — p is an optimal predecessor of
    // v iff cost(p) + w(p,v) = cost(v) — taking min(p) for determinism.
    // Carrying parents through the loop would instead fire extra
    // "refinement" rounds whenever an equal-cost smaller-id predecessor
    // appears late (strictly more rounds, wider shuffles, same answer).
    val (from, to) = if (reverse) ("dst", "src") else ("src", "dst")
    val eRaw = edges.select(col(from).as("__from"), col(to).as("__to"), cost.cast("long").as("__w"))
    val e = eRaw.localCheckpoint(eager = false)
    val dist = bfsRelax(e, eRaw, sources, maxIter, localMaxEdges)
    val parents = e
      .join(dist.select(col("id").as("__from"), col("cost").as("__pc")), "__from")
      .join(dist.select(col("id").as("__to"), col("cost").as("__tc")), "__to")
      .where(col("__pc") + col("__w") === col("__tc"))
      .groupBy(col("__to").as("id")).agg(min(col("__from")).as("parent"))
    // sources keep a null parent: with strictly positive costs no incoming
    // edge can satisfy the invariant at cost 0
    dist.join(parents, Seq("id"), "left")
  }

  /** Plain cost-relaxation fixpoint, memoized per (session, prepared-edge
    * plan, source plan, bound) under scan sharing: the cost-only and
    * parent-deriving shortest-path queries over the same weighted graph
    * share one fixpoint (the prepared edge frame already embeds cost and
    * direction, so its semantic hash is the complete cache key). */
  private val relaxCache =
    scala.collection.concurrent.TrieMap[(SparkSession, Int, Int, Int, Long), DataFrame]()

  /** `eKey` must be the PRE-checkpoint edge plan: a localCheckpoint wraps a
    * fresh RDD per call, so its semantic hash never repeats across queries
    * and would defeat the cache. */
  private def bfsRelax(e: DataFrame, eKey: DataFrame, sources: DataFrame,
      maxIter: Int, localMaxEdges: Long = 50000L): DataFrame =
    if (!graft.graph.Tpch.shareScans) bfsRelaxImpl(e, sources, maxIter, localMaxEdges)
    else {
      if (relaxCache.size > 64) relaxCache.clear() // bound: never pin plans forever
      relaxCache.getOrElseUpdate(
        (e.sparkSession, eKey.queryExecution.analyzed.semanticHash(),
          sources.queryExecution.analyzed.semanticHash(), maxIter, localMaxEdges),
        bfsRelaxImpl(e, sources, maxIter, localMaxEdges).localCheckpoint(eager = false))
    }

  /** Guarded LOCAL replay of the relaxation loop (the kCore/CC pattern):
    * the EXACT same round-synchronous recurrence — per round, min candidate
    * cost per vertex over edges out of the previous improved set, kept iff
    * it beats the known distance; accept early-exit and maxIter truncation
    * replicated — so the returned dist table is bit-identical to the
    * distributed loop's in every regime, converged or capped (parity-spec'd
    * at guard = 0). `accept` is evaluated ONCE, distributedly, over the
    * bounded id universe (sources ∪ edge heads), never per round.
    *
    * The 50k guard default is a MEASURED rejection of a bigger one: on the
    * sf0.1 FK graph (2M weighted edges, 4-5 effective rounds, local[32])
    * the local path reads 3.0-5.4 s vs 2.3-3.5 s distributed — collecting
    * the edge frame costs more than the well-parallelized rounds save — so
    * the replay only fires where fixed per-round latency dominates. */
  private def relaxLocal(e: DataFrame, sources: DataFrame, maxIter: Int,
      accept: Option[Column]): Option[DataFrame] = {
    val spark = e.sparkSession
    import spark.implicits._
    val eRows = e.collect() // (__from, __to, __w); __w is non-null by construction
    if (eRows.exists(r => r.isNullAt(0) || r.isNullAt(1))) return None
    val sRows = sources.select(col(sources.columns.head).cast("long")).collect()
    if (sRows.exists(_.isNullAt(0))) return None
    // null endpoints/sources fall back (None) to the distributed rounds,
    // where a null key simply never joins — the pre-replay behavior
    val es = eRows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val adj = scala.collection.mutable.HashMap[Long, scala.collection.mutable.ArrayBuffer[(Long, Long)]]()
    es.foreach { case (f, t, w) =>
      adj.getOrElseUpdate(f, new scala.collection.mutable.ArrayBuffer[(Long, Long)]) += ((t, w))
    }
    val srcs = sRows.map(_.getLong(0)).distinct
    val acceptedIds: Long => Boolean = accept match {
      case None => _ => false
      case Some(a) =>
        val universe = (srcs ++ es.map(_._2)).distinct
        universe.toSeq.toDF("id").where(a).as[Long].collect().toSet
    }
    val dist = scala.collection.mutable.HashMap[Long, Long]()
    srcs.foreach(dist(_) = 0L)
    var frontier: scala.collection.Map[Long, Long] = dist.clone()
    var bestAccepted = Long.MaxValue
    var done = false
    var i = 0
    while (!done && i < maxIter) {
      val cand = scala.collection.mutable.HashMap[Long, Long]()
      frontier.foreach { case (f, c) =>
        adj.get(f).foreach(_.foreach { case (t, w) =>
          val nc = c + w
          if (cand.get(t).forall(nc < _)) cand(t) = nc
        })
      }
      val improved = cand.filter { case (t, nc) => dist.get(t).forall(nc < _) }
      if (improved.isEmpty) done = true
      else {
        improved.foreach { case (t, c) => dist(t) = c }
        frontier = improved
        val accMin = improved.iterator.collect { case (t, c) if acceptedIds(t) => c }
        if (accMin.nonEmpty) bestAccepted = math.min(bestAccepted, accMin.min)
        if (improved.values.min >= bestAccepted) done = true
      }
      i += 1
    }
    Some(dist.iterator.map { case (v, c) => (v, c) }.toSeq.toDF("id", "cost"))
  }

  private def bfsRelaxImpl(e: DataFrame, sources: DataFrame, maxIter: Int,
      localMaxEdges: Long = 50000L): DataFrame = {
    // sources are guarded too: a huge source set over a small subgraph must
    // not be collected; type gate keeps non-long ids on the distributed path
    if (integralCols(e, "__from", "__to") &&
        integralCols(sources, sources.columns.head) &&
        atMost(e, localMaxEdges) && atMost(sources, localMaxEdges)) {
      relaxLocal(e, sources, maxIter, accept = None) match {
        case Some(d) => return d
        case None    => () // null ids: the distributed rounds handle them
      }
    }
    var dist = sources.select(col(sources.columns.head).as("id")).dropDuplicates("id")
      .withColumn("cost", lit(0L)).localCheckpoint(eager = false)
    var frontier = dist
    // Guarded frontier broadcast (guide §3.1; the Descend idiom): the
    // checkpointed frontier blinds stats, so every round's expansion would
    // SMJ — exchanging the FULL edge frame per round even for a one-row
    // frontier. The round-(i-1) probe action already counts the improved
    // set, so broadcast eligibility is FREE; the first round probes the
    // (bounded, deduped) source set once. Past the guard the shuffle join
    // stands — a flooded frontier on a real cluster must not be built into
    // one hash relation.
    val bcastRows = 1000000L
    var frontierSmall = graft.plans.Scale.fitsBroadcast(dist, bcastRows)
    var done = false
    var i = 0
    while (!done && i < maxIter) {
      // lazy checkpoint + count = ONE action per round (the transitive-
      // reduction rule): count completes the checkpoint the merge then reads
      val fB = if (frontierSmall) broadcast(frontier) else frontier
      val improved = e
        .join(fB.withColumnRenamed("id", "__from"), "__from")
        .select(col("__to").as("id"), (col("cost") + col("__w")).as("cost"))
        .groupBy("id").agg(min(col("cost")).as("cost"))
        .join(dist.withColumnRenamed("cost", "__old"), Seq("id"), "left")
        .where(col("__old").isNull || col("cost") < col("__old"))
        .select("id", "cost")
        .localCheckpoint(eager = false)
      val n = improved.count()
      if (n == 0L) done = true
      else {
        frontierSmall = n <= bcastRows
        // the anti-join build side is the improved set itself — same free
        // count, same guard: dist (|reached|-sized) stays unshuffled
        val impB = if (frontierSmall) broadcast(improved.select("id"))
                   else improved.select("id")
        dist = dist.join(impB, Seq("id"), "left_anti")
          .unionByName(improved).localCheckpoint(eager = false)
        frontier = improved
      }
      i += 1
    }
    dist
  }

  /** fermor `shortest-path`'s full contract: lowest-cost search for vertices
    * satisfying `accept` (a predicate Column over `id`), with early exit —
    * once the cheapest accepted cost B is known and the frontier's minimum
    * tentative cost reaches B, no future relaxation can beat it (costs are
    * strictly positive), so the search stops without exhausting the graph.
    * Returns the accepted vertices tied at the minimal cost. */
  def cheapestAccepted(edges: DataFrame, sources: DataFrame, cost: Column, accept: Column,
      reverse: Boolean = false, maxIter: Int = 50,
      localMaxEdges: Long = 50000L)(implicit spark: SparkSession): DataFrame = {
    val dist = relaxLoop(edges, sources, cost, reverse, maxIter, accept = Some(accept),
      localMaxEdges)
    val hits = dist.where(accept).localCheckpoint(eager = false)
    hits.join(hits.agg(min(col("cost")).as("cost")), Seq("cost"), "left_semi")
      .select("id", "cost")
  }

  private def relaxLoop(edges: DataFrame, sources: DataFrame, cost: Column,
      reverse: Boolean, maxIter: Int, accept: Option[Column],
      localMaxEdges: Long = 50000L): DataFrame = {
    val (from, to) = if (reverse) ("dst", "src") else ("src", "dst")
    // parallel edges are fine un-deduped: the per-round min-merge collapses
    // them; one narrow materialization shared by all rounds. NULL weights
    // are dropped by construction: costs are documented strictly positive,
    // and a null __w would null the frontier's min(cost) — the drain
    // signal — terminating the relaxation early instead of relaxing on
    val eRaw = edges.select(col(from).as("__from"), col(to).as("__to"), cost.cast("long").as("__w"))
      .where(col("__w").isNotNull)
    val e = eRaw.localCheckpoint(eager = false)
    if (accept.isEmpty) return bfsRelax(e, eRaw, sources, maxIter, localMaxEdges)
    // probe + collect the CHECKPOINTED frame: a derived edge graph evaluates
    // its upstream once (the kTruss probe rule); sources guarded like edges
    if (integralCols(e, "__from", "__to") &&
        integralCols(sources, sources.columns.head) &&
        atMost(e, localMaxEdges) && atMost(sources, localMaxEdges)) {
      relaxLocal(e, sources, maxIter, accept) match {
        case Some(d) => return d
        case None    => () // null ids: the distributed rounds handle them
      }
    }
    var dist = sources.select(col(sources.columns.head).as("id")).dropDuplicates("id")
      .withColumn("cost", lit(0L)).localCheckpoint(eager = false)
    var frontier = dist
    // guarded frontier broadcast — same rationale and guard as
    // [[bfsRelaxImpl]]; here the frontier count rides the drain-probe agg
    // (one extra count column on a row the probe already scans) so the
    // guard costs zero additional jobs after the first round
    val bcastRows = 1000000L
    var frontierSmall = graft.plans.Scale.fitsBroadcast(dist, bcastRows)
    var bestAccepted = Long.MaxValue
    var done = false
    var i = 0
    while (!done && i < maxIter) {
      val fB = if (frontierSmall) broadcast(frontier) else frontier
      val improved = e
        .join(fB.withColumnRenamed("id", "__from"), "__from")
        .select(col("__to").as("id"), (col("cost") + col("__w")).as("cost"))
        .groupBy("id").agg(min(col("cost")).as("cost")) // map-side partial min
        .join(dist.withColumnRenamed("cost", "__old"), Seq("id"), "left")
        .where(col("__old").isNull || col("cost") < col("__old"))
        .select("id", "cost")
        .localCheckpoint(eager = false) // the agg below completes it — one job
      // ONE agg job doubles as the materializer AND the drain probe: it
      // scans every partition (completing the lazy checkpoint the merge
      // joins then read), and a null frontier minimum means no row improved
      val row = improved.agg(min(col("cost")),
        min(when(accept.get, col("cost"))), count(lit(1))).head()
      if (row.isNullAt(0)) done = true
      else {
        frontierSmall = row.getLong(2) <= bcastRows
        val impB = if (frontierSmall) broadcast(improved.select("id"))
                   else improved.select("id")
        dist = dist.join(impB, Seq("id"), "left_anti")
          .unionByName(improved).localCheckpoint(eager = false)
        frontier = improved
        if (!row.isNullAt(1)) bestAccepted = math.min(bestAccepted, row.getLong(1))
        // strictly positive costs: every future relaxation strictly exceeds
        // the frontier minimum, so the accepted set at bestAccepted is final
        if (row.getLong(0) >= bestAccepted) done = true
      }
      i += 1
    }
    dist
  }

  /** Materialize full paths from a parent-pointer tree (the output of
    * [[weightedShortestPathWithParent]]): `maxHops` bounded prepend-joins —
    * each round resolves one more ancestor, rows whose walk already reached
    * a source (null parent) pass through unchanged. Paths run source→vertex.
    * The path column is wide; reconstruct AFTER filtering to the vertices
    * you need, not before. */
  def shortestPathsFromParents(parentTree: DataFrame, maxHops: Int,
      targets: Option[DataFrame] = None): DataFrame = {
    var cur = targets.getOrElse(parentTree).select(col("id"), col("cost"),
      array(col("id")).as("path"), col("parent").as("p"))
    var i = 0
    while (i < maxHops) {
      val t = parentTree.select(col("id").as("p"), col("parent").as("__pp"))
      cur = cur.join(t, Seq("p"), "left")
        .select(col("id"), col("cost"),
          when(col("p").isNotNull, concat(array(col("p")), col("path")))
            .otherwise(col("path")).as("path"),
          when(col("p").isNotNull, col("__pp")).otherwise(lit(null).cast("long")).as("p"))
        .localCheckpoint(eager = false) // cut the join-chain lineage
      i += 1
      // all walks terminated (every pending parent null): the remaining
      // rounds would be no-op joins — stop. The frame is checkpointed, so
      // the probe materializes work the next round needed anyway.
      if (i < maxHops && cur.where(col("p").isNotNull).isEmpty) i = maxHops
    }
    cur.select("id", "cost", "path")
  }

  /** The reference shortest-path's FULL return contract (algo.clj:92-125:
    * "returns a vector of vertices on the path" to the first accepted
    * vertex): relax to a parent tree, pick the minimal-cost accepted
    * vertices (the deterministic set form of "first"), and reconstruct only
    * THEIR paths. Empty result = no accepted vertex reachable (the
    * reference's nil). */
  def shortestPathTo(edges: DataFrame, sources: DataFrame, cost: Column, accept: Column,
      reverse: Boolean = false, maxIter: Int = 50, maxHops: Int = 50,
      localMaxEdges: Long = 50000L)(implicit spark: SparkSession): DataFrame = {
    val tree = weightedShortestPathWithParent(edges, sources, cost, reverse, maxIter,
      localMaxEdges)
      .localCheckpoint(eager = false)
    val hits = tree.where(accept).localCheckpoint(eager = false)
    val best = hits.join(hits.agg(min(col("cost")).as("cost")), Seq("cost"), "left_semi")
    shortestPathsFromParents(tree, maxHops, Some(best))
  }

  /** Incremental connected components over a GROWING edge set (the streaming
    * maintenance shape: call from foreachBatch with the previous assignment):
    * prior components enter as membership links (id → component), so each
    * update runs CC over |V| + |batch| edges instead of the full history —
    * the classic union-find-with-supernodes trick, distributed. Labels stay
    * the global min id, so assignments are stable across batches.
    *
    * DELTA fast path (r11, the r10 verdict's top-cost item): a batch can
    * only MERGE existing components, so the CC that actually has to run is
    * over the COMPONENT graph — the batch projected through the previous
    * assignment — whose size is bounded by the batch, never |V| + |batch|.
    * Those component edges are collected under `deltaMaxEdges` (the 2M /
    * ~32 MB driver-collect convention of the PPR/walks replays) and merged
    * by a local min-root union-find; the |V|-sized mapping then updates
    * with ONE distributed remap join against the (touched-components-only,
    * broadcast-sized) relabel table. The old path re-ran full CC over
    * membership links + batch per update — past the 50k guard that meant a
    * whole GraphX Pregel run per update (q_cc_incremental paid two, the
    * r10 bench's most expensive query at 3.5 s).
    *
    * Exactness gate (one bounded probe, ~2 scans + 2 aggs of prev): the
    * projection argument requires prev to BE an assignment — non-null
    * unique ids, component = min member, every component labeling itself
    * (`(c, c)` present). Each clause is exactly the invariant
    * [[connectedComponents]]/[[incrementalCC]] output (and an
    * id = component seed) satisfies. Inputs violating any clause — where
    * duplicate ids merge components through their link edges, or a
    * non-min label would have been rewritten by the full recompute — fall
    * back to the verbatim old path, which defines the semantics
    * (parity-spec'd: AlgosSpec runs both). Non-integral id types fall back
    * too (the integralCols replay rule). */
  def incrementalCC(prev: DataFrame, batchEdges: DataFrame,
      localMaxEdges: Long = 50000L, deltaMaxEdges: Long = 2000000L)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    if (integralCols(prev, "id", "component") && integralCols(batchEdges, "src", "dst")) {
      val pm = prev.select(col("id").cast("long").as("id"),
        col("component").cast("long").as("component")).localCheckpoint(eager = false)
      val be = batchEdges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).localCheckpoint(eager = false)
      // ONE bounded probe sizes the assignment AND materializes its
      // checkpoint (four readers below); a measured-small pm broadcasts
      // into the projection/universe joins, so the batch is never
      // shuffled against |V| (guide §3.1 — the bfsRelaxImpl idiom). Past
      // the guard the shuffle joins stand.
      val pmN = graft.plans.Scale.oneWaveLimit(pm)(
        pm.limit(math.min(deltaMaxEdges + 1, Int.MaxValue.toLong).toInt).count())
      val pmB = if (pmN <= deltaMaxEdges) broadcast(pm) else pm
      // Exactness gate, ONE shuffle: both roles of every prev row grouped
      // by the vertex they mention — duplicate ids (__nid > 1), a label
      // with no self-row (__isc without __self), and null ids all surface
      // from the same aggregation; `component > id` and null batch
      // endpoints are scan predicates. (The first formulation — one union
      // branch per clause with its own groupBy/anti-join — paid 3 extra
      // shuffles and ~0.5 s per update at sf0.1.)
      val roles = pm.select(col("id").as("k"), lit(0).as("r"), col("component").as("v"))
        .unionAll(pm.select(col("component").as("k"), lit(1).as("r"), col("id").as("v")))
      val grouped = roles.groupBy("k").agg(
        sum(when(col("r") === 0, 1).otherwise(0)).as("__nid"),
        max(when(col("r") === 0 && col("v") === col("k"), 1).otherwise(0)).as("__self"),
        max(col("r")).as("__isc"))
      def one(df: DataFrame) = df.select(lit(0L).as("t"), lit(0L).as("a"), lit(0L).as("b"))
      val violations =
        one(grouped.where(col("k").isNull || col("__nid") > 1 ||
            (col("__isc") === 1 && col("__self") === 0)))
          .unionAll(one(pm.where(col("component") > col("id"))))
          .unionAll(one(be.where(col("src").isNull || col("dst").isNull)))
          .limit(1)
      // batch edges projected to component space through the mapping
      // (unseen endpoints are their own singletons — the coalesce), deduped
      // map-side: bounded by the batch, never |V|
      val compEdges = be
        .join(pmB.select(col("id").as("src"), col("component").as("__cs")), Seq("src"), "left")
        .join(pmB.select(col("id").as("dst"), col("component").as("__cd")), Seq("dst"), "left")
        .select(coalesce(col("__cs"), col("src")).as("__cs"),
          coalesce(col("__cd"), col("dst")).as("__cd"))
        .where(col("__cs") =!= col("__cd"))
        .dropDuplicates()
      // gate probe and edge collect fused into ONE driver action: the
      // violation subtree rides the same plan as a tagged limit-1 branch
      // (the collectAtMost convention, one job instead of two)
      val combined = violations.unionAll(
        compEdges.select(lit(1L).as("t"), col("__cs").as("a"), col("__cd").as("b")))
      collectAtMost(combined, deltaMaxEdges + 1) match {
        case Some(rows) if !rows.exists(r => r.getLong(0) == 0L || r.isNullAt(1) || r.isNullAt(2))
            && rows.length <= deltaMaxEdges =>
          val uf = new MinUnionFind
          rows.foreach(r => uf.union(r.getLong(1), r.getLong(2)))
          // relabel table: touched components only; cluster label = min
          // member component id = min vertex id overall (each component
          // IS its member-set minimum — the gated invariant)
          val remap = rows.iterator.flatMap(r => Iterator(r.getLong(1), r.getLong(2)))
            .toArray.distinct.map(c => (c, uf.find(c)))
            .filter { case (c, rt) => rt != c }
          // output universe = prev ids ∪ batch endpoints (the old vs union)
          val newVerts = be.select(col("src").as("id"))
            .unionAll(be.select(col("dst").as("id")))
            .dropDuplicates("id")
            .join(pmB.select("id"), Seq("id"), "left_anti")
            .select(col("id"), col("id").as("component"))
          val m = pm.unionAll(newVerts)
          if (remap.isEmpty) return m
          return m.join(remap.toSeq.toDF("component", "__nc"), Seq("component"), "left")
            .select(col("id"), coalesce(col("__nc"), col("component")).as("component"))
        case _ => () // violation, null, or past the guard: full recompute
      }
    }
    val links = prev.select(col("id").as("src"), col("component").as("dst"))
      .where(col("src") =!= col("dst"))
    val e = links.unionAll(batchEdges.select("src", "dst"))
    val vs = prev.select("id")
      .unionAll(batchEdges.select(col("src").as("id")))
      .unionAll(batchEdges.select(col("dst").as("id")))
      .dropDuplicates("id")
    connectedComponents(vs, e, localMaxEdges)
  }

  /** PageRank (capability class inherited from the reference's Pacer
    * lineage): GraphX static PageRank, fixed iterations. (r10 MEASURED
    * rejection: coalescing a tiny graph to one partition before the
    * supersteps read 3.3 s vs 1.3 s warm at sf0.1 — the guard probes plus
    * single-task serialization of GraphX's per-superstep materializations
    * cost more than the 32 near-empty tasks they removed.) */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int = 20)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    buildGraph(vertices, edges).staticPageRank(iters).vertices.toDF("id", "rank")
  }

  /** Per-vertex triangle counts on an undirected simple graph. Canonicalizes
    * + departicipates duplicate edges as TriangleCount requires. */
  def triangleCount(vertices: DataFrame, edges: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val g = buildGraph(vertices, edges)
      .partitionBy(PartitionStrategy.EdgePartition2D)
    g.triangleCount().vertices.toDF("id", "triangles")
  }

  /** LOCAL CLUSTERING COEFFICIENT per vertex, integer-exact: coeff_bp =
    * (triangles(v) * 20000) div (deg(v) * (deg(v) - 1)) — basis points of
    * the closed-wedge ratio tri / C(deg, 2); vertices with deg < 2 get 0.
    * Orientation/duplicate-insensitive (edges are symmetrized + distinct'd
    * first), self-loops dropped.
    *
    * Plan shape (node-iterator): wedges = sym ⋈ sym on the center with an
    * endpoint total order, closed against the canonical edge set — three
    * keyed equi-joins, no cartesian, the same shape q_triangles' oracle
    * replays. DataFrame-native (unlike [[triangleCount]]'s GraphX path) so
    * AQE/broadcast apply; the classic hub caveat holds: wedge fan-out is
    * Σ deg², so cap or sample hub vertices upstream at 100 TB (the
    * butterfly census's hub-cap pattern). */
  def localClustering(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val raw = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    val sym = raw.unionAll(raw.select(col("dst").as("src"), col("src").as("dst")))
      .dropDuplicates("src", "dst")
      .localCheckpoint(false)
    val canon = sym.where(col("src") < col("dst"))
    val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
    val tri = sym.select(col("src").as("u"), col("dst").as("v1"))
      .join(sym.select(col("src").as("u"), col("dst").as("v2")), "u")
      .where(col("v1") < col("v2"))
      .join(canon.select(col("src").as("v1"), col("dst").as("v2")), Seq("v1", "v2"))
      .groupBy(col("u").as("id")).agg(count(lit(1)).as("triangles"))
    vertices.select(col("id").cast("long").as("id"))
      .join(deg, Seq("id"), "left")
      .join(tri, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("coeff_bp",
        when(col("degree") < 2, lit(0L))
          .otherwise(expr("(triangles * 20000) div (degree * (degree - 1))")))
  }

  /** DEGREE ASSORTATIVITY (Newman 2002): the Pearson correlation of the
    * endpoint degrees over the symmetrized edge list — positive when hubs
    * attach to hubs, negative for hub-leaf (bipartite/star-like) mixing.
    * One row `(n_edges, assortativity)`; null correlation (degenerate
    * variance: regular graphs, single edge) surfaces as NULL rather than a
    * fabricated 0. Scale shape: one distinct, one degree count, ONE keyed
    * join back, tiny per-vertex aggs — every shuffle keyed by vertex id.
    * Five of the six per-edge sums are pure degree-table moments (vertex v
    * contributes its degree as dx to exactly d_v symmetric edges, so
    * n = Σd, Σx = Σy = Σd², Σx² = Σy² = Σd³); only Σxy needs the edge
    * list, as Σ_v d_v·S(v) with S(v) = Σ_{u∈N(v)} d_u — one |E| join
    * instead of two, and the DECIMAL products run over |V| rows, not |E|.
    *
    * ENGINE-EXACT by construction: the aggregation accumulates the six
    * EXACT integer sums (n, Σx, Σy, Σxy, Σx², Σy²) in DECIMAL(38,0) —
    * order-independent integer addition, never a float accumulator (Spark
    * covar_pop/stddev_pop vs DuckDB corr() accumulate in different orders,
    * so their doubles can differ by an ulp and flip a rounded comparison).
    * The FINISH r = (n·Σxy − ΣxΣy) / (√(n·Σx²−Σx²ₛ)·√(n·Σy²−Σy²ₛ)) is a
    * fixed sequence of IEEE-754 correctly-rounded double ops (cast, sqrt,
    * mul, div) on identical integer inputs — bit-identical in any engine
    * that replays the SAME expression shape, which the oracle does. All
    * integer intermediates stay ≤ ~10²⁶ for any plausible edge count, far
    * inside DECIMAL(38,0)/HUGEINT range — no overflow cliff. */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    // raw feeds BOTH symmetrize branches: without a materialization the
    // caller's edge derivation (q_assortativity: a lineitem⋈orders join +
    // distinct over ~1M pairs) is evaluated once per branch — checkpoint
    // once, read twice (the cooccurrencePairs rule)
    val raw = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .localCheckpoint(false)
    val sym = raw.unionAll(raw.select(col("dst").as("src"), col("src").as("dst")))
      .dropDuplicates("src", "dst")
      .localCheckpoint(false)
    val deg = sym.groupBy(col("src").as("k")).agg(count(lit(1)).as("d"))
      .localCheckpoint(false) // two consumers: the moment agg and the S-join
    // the checkpoint blanks deg's stats, so the S-join below planned as a
    // SortMergeJoin that exchanged the |E| sym list twice. deg is one row
    // per VERTEX — usually broadcastable — so take the measured-guard
    // broadcast (≤2M rows ≈ 32 MB built) and keep the stats-blind SMJ only
    // for degree tables past the guard (removed 2 of the 3 |E| Exchanges;
    // plans/r10/q_assortativity_*.txt)
    val degJ = if (atMost(deg, 2000000L)) broadcast(deg) else deg
    val dec = "decimal(38,0)"
    def d(c: Column): Column = c.cast(dec)
    val zero = lit(0).cast(dec)
    // exact integer moments of the degree table (see scaladoc identity)
    val moments = deg.agg(
      coalesce(sum(d(col("d"))), zero).as("__n"),
      coalesce(sum(d(col("d")) * d(col("d"))), zero).as("__s1"),
      coalesce(sum(d(col("d")) * d(col("d")) * d(col("d"))), zero).as("__s2"))
    // Σxy = Σ_v d_v·S(v), S(v) = Σ of neighbor degrees — the one |E| join
    val sxy = sym
      .join(degJ.select(col("k").as("dst"), col("d").as("dy")), "dst")
      .groupBy(col("src").as("k")).agg(sum(d(col("dy"))).as("__sv"))
      .join(degJ, "k")
      .agg(coalesce(sum(d(col("d")) * col("__sv")), zero).as("__sxy"))
    moments.crossJoin(sxy)
      .select((col("__n") / 2).cast("long").as("n_edges"),
        (col("__n") * col("__sxy") - col("__s1") * col("__s1")).as("__num"),
        (col("__n") * col("__s2") - col("__s1") * col("__s1")).as("__d1"),
        (col("__n") * col("__s2") - col("__s1") * col("__s1")).as("__d2"))
      .select(col("n_edges"),
        when(col("__d1") > 0 && col("__d2") > 0,
          col("__num").cast("double") /
            (sqrt(col("__d1").cast("double")) * sqrt(col("__d2").cast("double"))))
          .otherwise(lit(null).cast("double")).as("assortativity"))
  }

  /** RICH-CLUB COEFFICIENT (Zhou & Mondragón 2004) at each degree threshold
    * k: among the N_k vertices of degree > k, the realized fraction of the
    * C(N_k, 2) possible edges — integer basis points, φ_bp =
    * (2·E_k·10000) div (N_k·(N_k−1)); thresholds with fewer than 2 members
    * report 0. Hub-to-hub interconnection, the structural complement of
    * [[degreeAssortativity]]'s correlation view.
    *
    * Scale shape: one symmetrize+distinct, one degree agg, two keyed degree
    * join-backs onto the canonical edge list, then ONE pass over vertices
    * and edges against the BROADCAST threshold list (|ks| rows) — no
    * per-threshold jobs, no pair enumeration. */
  def richClub(edges: DataFrame, ks: Seq[Long]): DataFrame = {
    require(ks.nonEmpty)
    val spark = edges.sparkSession
    import spark.implicits._
    // raw checkpointed for the same both-branches reason as
    // degreeAssortativity: the caller's edge derivation must not run once
    // per symmetrize branch
    val raw = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .localCheckpoint(false)
    val sym = raw.unionAll(raw.select(col("dst").as("src"), col("src").as("dst")))
      .dropDuplicates("src", "dst")
      .localCheckpoint(false)
    // deg is deliberately NOT checkpointed or broadcast (r10 MEASURED
    // rejection): its three references live in ONE plan, where Spark's
    // ReusedExchange already computes the agg once — a probe + guarded
    // broadcast re-read 2.2 s vs 1.5 s warm (jobs 7 -> 10), unlike the
    // degreeAssortativity S-join whose consumers span separate actions
    val deg = sym.groupBy(col("src").as("v")).agg(count(lit(1)).as("d"))
    val ksDf = ks.distinct.sorted.toDF("k")
    val nk = deg.crossJoin(broadcast(ksDf)).where(col("d") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_nodes"))
    val canon = sym.where(col("src") < col("dst"))
      .join(deg.select(col("v").as("src"), col("d").as("dx")), "src")
      .join(deg.select(col("v").as("dst"), col("d").as("dy")), "dst")
      .select(least(col("dx"), col("dy")).as("m"))
    val ek = canon.crossJoin(broadcast(ksDf)).where(col("m") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_edges"))
    ksDf.join(nk, Seq("k"), "left").join(ek, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("n_nodes"), lit(0L)).as("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"))
      .withColumn("phi_bp",
        when(col("n_nodes") < 2, lit(0L))
          .otherwise(expr("(n_edges * 2 * 10000) div (n_nodes * (n_nodes - 1))")))
  }

  /** Community detection via label propagation. */
  def labelPropagation(vertices: DataFrame, edges: DataFrame, iters: Int = 10)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    org.apache.spark.graphx.lib.LabelPropagation
      .run(buildGraph(vertices, edges), iters).vertices.toDF("id", "community")
  }

  /** DETERMINISTIC synchronous label propagation (fermor/gremlin community
    * recipe, made engine-portable): every vertex starts labeled with its own
    * id; each round, all vertices SIMULTANEOUSLY adopt the most frequent
    * label among their in-neighbors (ties → smallest label; no neighbors →
    * keep the current label). Unlike GraphX's LPA (whose hash-map tie-break
    * is an iteration-order accident), every round here is a pure function of
    * the previous labeling, so a fixed `iters` yields one exact answer that
    * a SQL oracle can replay round by round (q_label_prop unrolls it as
    * chained CTEs in DuckDB).
    *
    * Scale shape: per round, one (dst,label) count aggregation, one argmax
    * window keyed by dst, one label join-back — all shuffles keyed by vertex
    * id, per-round cost linear in |E|. Labels are checkpointed each round so
    * the plan doesn't nest `iters` deep. */
  def labelPropagationSync(vertices: DataFrame, edges: DataFrame, iters: Int,
      localMaxEdges: Long = 2000000L)(
      implicit spark: SparkSession): DataFrame = {
    val idc = vertices.columns.head
    // guarded LOCAL replay of the exact synchronous rounds (the hits/ppr
    // convention): each round is a pure integer argmax — count in-neighbor
    // labels, max count then smallest label — so the replay is
    // bit-identical to the distributed rounds; parity-spec'd with the
    // guard forced off. Duplicate vertex ids fall back (bag labels).
    // Probe + collect fused into one action per frame (collectAtMost).
    val esOpt = collectPairsAtMost(
      edges.select(col("src").cast("long"), col("dst").cast("long")), localMaxEdges)
    val idsOpt = if (esOpt.isEmpty) None
      else collectLongsAtMost(vertices.select(col(idc).cast("long")), localMaxEdges)
    if (esOpt.isDefined && idsOpt.isDefined) {
      import spark.implicits._
      val ids = idsOpt.get
      if (ids.length == ids.distinct.length) {
        val es = esOpt.get
        var lbl = scala.collection.mutable.HashMap[Long, Long](ids.map(i => i -> i): _*)
        for (_ <- 1 to iters) {
          val cnt = scala.collection.mutable.HashMap[(Long, Long), Long]()
          es.foreach { case (s, d) =>
            lbl.get(s).foreach { l =>
              if (lbl.contains(d)) cnt((d, l)) = cnt.getOrElse((d, l), 0L) + 1L
            }
          }
          val next = scala.collection.mutable.HashMap[Long, Long]()
          cnt.foreach { case ((d, l), n) =>
            next.get(d) match {
              case None => next(d) = l
              case Some(b) =>
                val bn = cnt((d, b))
                if (n > bn || (n == bn && l < b)) next(d) = l
            }
          }
          ids.foreach(i => if (!next.contains(i)) next(i) = lbl(i))
          lbl = next
        }
        return ids.toSeq.map(i => (i, lbl(i))).toDF("id", "community")
      }
    }
    // EAGER per-round checkpoints (the Descend rule): round k feeds round
    // k+1, so a lazy checkpoint would leave the final action to recompute a
    // plan nested `iters` deep.
    var labels = vertices.select(col(idc).cast("long").as("id"))
      .withColumn("lbl", col("id")).localCheckpoint(true)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val cnt = e.join(labels.select(col("id").as("src"), col("lbl")), "src")
        .groupBy(col("dst").as("id"), col("lbl")).agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("n").desc, col("lbl").asc)
      val best = cnt.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("id"), col("lbl").as("nl"))
      labels = labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("nl"), col("lbl")).as("lbl"))
        .localCheckpoint(true)
    }
    labels.select(col("id"), col("lbl").as("community"))
  }

  /** HITS hubs & authorities (the pagerank-era link-analysis companion),
    * INTEGER-EXACT: the standard per-iteration L2 normalization replaces
    * engine-portability with float drift, so we run the UN-normalized
    * mutual recurrence (a ← Aᵀh, h ← Aa) for a fixed iteration count in
    * 64-bit integers — rankings and ratios are identical to the normalized
    * fixpoint direction for the same iteration count, and a SQL oracle can
    * replay every round exactly (q_hits unrolls them as chained CTEs).
    * Values grow ~(d_in·d_out)^iters: callers bound iters so counts stay
    * in BIGINT (3 iterations on degree≲10³ graphs is ≲10¹⁸ — checked
    * against Long.MaxValue would overflow-error under ANSI, not wrap).
    *
    * Scale: per round two edge-keyed aggregations (sum over in/out
    * neighbors) + a join back — |E|-linear keyed shuffles, checkpointed
    * per round like the LPA/walk loops. */
  def hits(vertices: DataFrame, edges: DataFrame, iters: Int,
      localMaxEdges: Long = 2000000L): DataFrame = {
    require(iters >= 1)
    val spark = edges.sparkSession
    import spark.implicits._
    val idc = vertices.columns.head
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .localCheckpoint(eager = false)
    // guarded LOCAL replay of the exact Long recurrence (duplicate edges
    // kept — they multiply contributions in BOTH forms; contributions
    // count iff both endpoints are in `vertices`, mirroring the keyed-join
    // + left-join semantics; addExact mirrors ANSI error-on-overflow).
    // Callers pass distinct vertex ids (both forms assume it).
    // Probe + collect fused into one action per frame (collectAtMost).
    val esOpt = collectPairsAtMost(e, localMaxEdges)
    val vOpt = if (esOpt.isEmpty) None
      else collectLongsAtMost(vertices.select(col(idc).cast("long")), localMaxEdges)
    if (esOpt.isDefined && vOpt.isDefined) {
      val vIds = vOpt.get
      val idx = scala.collection.mutable.HashMap[Long, Int]()
      vIds.zipWithIndex.foreach { case (v, i) => idx.getOrElseUpdate(v, i) }
      val pairs = esOpt.get.flatMap { case (s, d) =>
        for (si <- idx.get(s); di <- idx.get(d)) yield (si, di)
      }
      val n = vIds.length
      var hub = Array.fill(n)(1L)
      var auth = Array.fill(n)(1L)
      for (_ <- 1 to iters) {
        val na = new Array[Long](n)
        pairs.foreach { case (si, di) => na(di) = Math.addExact(na(di), hub(si)) }
        auth = na
        val nh = new Array[Long](n)
        pairs.foreach { case (si, di) => nh(si) = Math.addExact(nh(si), auth(di)) }
        hub = nh
      }
      return vIds.indices.map(i => (vIds(i), hub(i), auth(i))).toDF("id", "hub", "auth")
    }
    var scores = vertices.select(col(idc).cast("long").as("id"))
      .withColumn("hub", lit(1L)).withColumn("auth", lit(1L)).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val auth = e.join(scores.select(col("id").as("src"), col("hub")), "src")
        .groupBy(col("dst").as("id")).agg(sum(col("hub")).as("na"))
      val s1 = scores.join(auth, Seq("id"), "left")
        .select(col("id"), col("hub"), coalesce(col("na"), lit(0L)).as("auth"))
      val hub = e.join(s1.select(col("id").as("dst"), col("auth")), "dst")
        .groupBy(col("src").as("id")).agg(sum(col("auth")).as("nh"))
      scores = s1.join(hub, Seq("id"), "left")
        .select(col("id"), coalesce(col("nh"), lit(0L)).as("hub"), col("auth"))
        .localCheckpoint(true)
    }
    scores
  }

  /** Personalized PageRank (random-walk-with-restart) — the seed-relevance
    * score behind graph-based data selection ("rank the corpus by proximity
    * to a trusted seed set"), INTEGER-EXACT like [[hits]]: ranks live in
    * fixed-point units of `scale`, each round moves
    * `(rank · alphaBp) div (10000 · outdeg)` along every out-edge (floor
    * division — deterministic mass leakage instead of float drift) and
    * re-injects `(scale · (10000 − alphaBp)) div 10000` at every seed, so a
    * SQL oracle replays every round verbatim (q_ppr unrolls them). Mass at
    * dangling vertices retires, the standard dropped-dangling variant.
    *
    * Scale: the rank frontier is SPARSE — only vertices already reached
    * carry rank, so round k touches the ≤k-hop out-neighborhood of the
    * seeds, not the graph. Per round: one keyed join rank⋈edges⋈outdeg,
    * one dst-keyed sum, one full-outer merge with the restart vector;
    * checkpointed per round like the hits/LPA/walk loops. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int,
      alphaBp: Long = 8500L, scale: Long = 1000000000000L,
      localMaxEdges: Long = 2000000L): DataFrame = {
    require(iters >= 1 && alphaBp >= 0 && alphaBp <= 10000 && scale > 0)
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .localCheckpoint(eager = false)
    // guarded LOCAL replay of the exact fixed-point rounds (the hits/
    // taggedBfs convention): every quantity is a Long recurrence — floor
    // division, order-free integer sums (addExact mirrors ANSI
    // error-on-overflow) — so the replay is bit-identical, parity-spec'd.
    // Duplicate seed rows fall back to the distributed path: the full_outer
    // merge there has per-row bag semantics a keyed map can't mirror.
    // Probe + collect fused into one action per frame (collectAtMost).
    val idc0 = seeds.columns.head
    val esOpt = collectPairsAtMost(e, localMaxEdges)
    val seedsOpt = if (esOpt.isEmpty) None
      else collectLongsAtMost(seeds.select(col(idc0).cast("long")), localMaxEdges)
    if (esOpt.isDefined && seedsOpt.isDefined) {
      val spark = edges.sparkSession
      import spark.implicits._
      val seedArr = seedsOpt.get
      if (seedArr.length == seedArr.distinct.length) {
        val es = esOpt.get
        val deg = scala.collection.mutable.HashMap[Long, Long]()
        es.foreach { case (s, _) => deg(s) = deg.getOrElse(s, 0L) + 1L }
        val r0 = scale * (10000L - alphaBp) / 10000L
        val seedSet = seedArr.toSet
        var rank = scala.collection.mutable.HashMap[Long, Long](
          seedArr.map(_ -> scale): _*)
        for (_ <- 1 to iters) {
          val in = scala.collection.mutable.HashMap[Long, Long]()
          es.foreach { case (s, d) =>
            rank.get(s).foreach { r =>
              // multiplyExact mirrors the distributed column expression,
              // which runs under Spark 4's default ANSI mode and errors
              // loudly on overflow — the replay must never wrap silently
              // where the distributed rounds would have raised
              val m = Math.multiplyExact(r, alphaBp) /
                Math.multiplyExact(10000L, deg(s))
              in(d) = Math.addExact(in.getOrElse(d, 0L), m)
            }
          }
          val next = scala.collection.mutable.HashMap[Long, Long]()
          seedSet.foreach(id => next(id) = Math.addExact(r0, in.getOrElse(id, 0L)))
          in.keysIterator.foreach(id =>
            if (!seedSet.contains(id)) next(id) = in(id))
          rank = next
        }
        return rank.toSeq.toDF("id", "rank")
      }
    }
    val deg = e.groupBy("src").agg(count(lit(1)).as("__d"))
    val idc = seeds.columns.head
    val restart = seeds.select(col(idc).cast("long").as("id"))
      .withColumn("__r0", lit(scale * (10000L - alphaBp) / 10000L))
      .localCheckpoint(eager = false)
    var rank = restart.select(col("id"), lit(scale).as("rank")).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = e.join(rank.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("id"), expr(s"(rank * ${alphaBp}L) div (10000L * __d)").as("__m"))
        .groupBy("id").agg(sum("__m").as("__in"))
      rank = restart.join(contrib, Seq("id"), "full_outer")
        .select(col("id"),
          (coalesce(col("__r0"), lit(0L)) + coalesce(col("__in"), lit(0L))).as("rank"))
        .localCheckpoint(true)
    }
    rank
  }

  /** Deterministic "random" walks — DeepWalk/node2vec-style corpus
    * generation for graph-embedding training, made engine-portable: from
    * each start vertex, walk `steps` hops; at each step the walker at v
    * moves to the out-neighbor u minimizing `md5(walker:step:u)` (then u
    * itself as the total-order tie-break). The choice is hash-uniform over
    * the neighbors yet a pure fact of (graph, walker, step) — runs,
    * partitionings, and engines agree, so a SQL oracle replays the walk
    * with the same unrolled argmin (q_walks). Walkers at a sink stop
    * (their walk is shorter, the DeepWalk convention). Returns
    * `(walker, step, v)` with step 0 = the start vertex.
    *
    * Scale: per step, one join of the walker frontier against the edge
    * table (keyed by current vertex) + one walker-keyed argmin window —
    * frontier-size work per round, checkpointed per step. */
  def deterministicWalks(edges: DataFrame, starts: DataFrame, steps: Int,
      localMaxEdges: Long = 2000000L): DataFrame = {
    require(steps >= 0)
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .localCheckpoint(eager = false)
    // guarded LOCAL replay (the hits/ppr convention): each hop is a pure
    // argmin over (md5 hex string, dst) — JVM MessageDigest and Spark's
    // md5() agree bit-for-bit on the same UTF-8 bytes, and 32-char hex
    // compares identically as a Java String and a UTF8String — so the
    // replay is bit-identical; parity-spec'd with the guard forced off.
    // Duplicate walker rows fall back (bag-of-walkers semantics).
    // Probe + collect fused into one action per frame (collectAtMost).
    val esOpt = collectPairsAtMost(e, localMaxEdges)
    val wsOpt = if (esOpt.isEmpty) None
      else collectLongsAtMost(
        starts.select(col(starts.columns.head).cast("long")), localMaxEdges)
    if (esOpt.isDefined && wsOpt.isDefined) {
      val spark = edges.sparkSession
      import spark.implicits._
      val ws = wsOpt.get
      if (ws.length == ws.distinct.length) {
        val adj = esOpt.get.groupBy(_._1)
          .map { case (s, ds) => s -> ds.map(_._2).distinct }
        val md = java.security.MessageDigest.getInstance("MD5")
        def h(w: Long, s: Int, d: Long): String = {
          val b = md.digest(s"$w:$s:$d".getBytes("UTF-8"))
          b.map("%02x".format(_)).mkString
        }
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
        var curW = ws.map(w => (w, w)).toSeq
        curW.foreach { case (w, v) => out += ((w, v, 0)) }
        for (s <- 1 to steps) {
          curW = curW.flatMap { case (w, v) =>
            adj.get(v).map { nbrs =>
              val best = nbrs.minBy(d => (h(w, s, d), d))
              (w, best)
            }
          }
          curW.foreach { case (w, v) => out += ((w, v, s)) }
        }
        return out.toSeq.toDF("walker", "v", "step")
      }
    }
    var cur = starts.select(col(starts.columns.head).cast("long").as("walker"))
      .withColumn("v", col("walker")).withColumn("step", lit(0))
      .localCheckpoint(true)
    var out = cur
    for (s <- 1 to steps) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("walker").orderBy(col("__h").asc, col("dst").asc)
      val nxt = cur.join(e, cur("v") === e("src"))
        .withColumn("__h", md5(concat_ws(":", col("walker"), lit(s), col("dst"))))
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("walker"), col("dst").as("v"), lit(s).as("step"))
        .localCheckpoint(true)
      out = out.unionByName(nxt)
      cur = nxt
    }
    out
  }

  /** k-core decomposition (fixed k): the maximal subgraph in which every
    * vertex has UNDIRECTED degree >= k, by iterative peeling — each round
    * drops vertices whose degree within the surviving subgraph is < k, until
    * a fixpoint. Returns `(id, deg)` — core members with their within-core
    * degree. Parallel edges and self-loops are collapsed/dropped first
    * (degree = distinct neighbors), matching the standard definition.
    *
    * Convergence is EXACT, not a signature: peeling only ever removes, so
    * round i+1's edge count equals round i's iff no vertex was removed —
    * one count per round, which the loop needs anyway. `maxRounds` is a
    * safety bound (peeling depth is data-dependent but monotone); exceeding
    * it throws rather than returning a plausible non-core.
    *
    * Scale: each round is one keyed degree agg + two semi-joins on the
    * SHRINKING symmetrized edge set — per-round cost tracks surviving
    * edges, never the original graph after early rounds; eager per-round
    * checkpoints keep lineage flat (the Descend rule). */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 50,
      localMaxEdges: Long = 2000000L): DataFrame = {
    require(k >= 1)
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    // guarded LOCAL peel (the hash-priority-loop rationale): the k-core is
    // the UNIQUE maximal subgraph of min degree >= k, so any correct peel
    // order yields the identical answer — one linear queue pass replaces
    // per-round scheduling latency below the guard; raw-pair guard skips
    // the symmetrize+distinct shuffle (dedup happens in indexedAdj);
    // probe and collect fused into one action (collectPairsAtMost)
    val symPairs = collectPairsAtMost(sym, localMaxEdges / 2)
    if (symPairs.isDefined) {
      val (ids, adj) = indexedAdj(symPairs.get)
      val n = ids.length
      val deg = adj.map(_.length)
      val removed = new Array[Boolean](n)
      val queue = scala.collection.mutable.ArrayDeque.from((0 until n).filter(deg(_) < k))
      while (queue.nonEmpty) {
        val i = queue.removeHead()
        if (!removed(i)) {
          removed(i) = true
          adj(i).foreach { j =>
            if (!removed(j)) { deg(j) -= 1; if (deg(j) == k - 1) queue += j }
          }
        }
      }
      return (0 until n).collect {
        case i if !removed(i) && deg(i) >= k => (ids(i), deg(i).toLong)
      }.toDF("id", "deg")
    }
    var e = sym.unionAll(sym.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var nEdges = e.count()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      rounds += 1
      val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select(col("src").as("id")).localCheckpoint(true)
      val ne = e.join(keep.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst").localCheckpoint(true)
      val n = ne.count()
      if (n == nEdges) converged = true
      else { e = ne; nEdges = n }
    }
    if (!converged)
      throw new IllegalStateException(s"kCore did not converge within $maxRounds rounds")
    e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")).where(col("deg") >= k)
  }

  /** CORE NUMBERS (degeneracy decomposition): per-vertex max k such that
    * the vertex survives in the k-core — the whole [[kCore]] family in one
    * pass, and the standard "how deep in the dense part" ordering for
    * graph mining. Two regimes:
    *
    *  - below the guard, the exact Matula–Beck min-degree peel (a linear
    *    bucket queue), the textbook O(E) algorithm — unique answer;
    *  - distributed, the h-index iteration (Lü et al. 2016): h(v) starts
    *    at deg(v); each round h'(v) = H(neighbors' h) = max k such that at
    *    least k neighbors have h ≥ k. h is non-increasing and its fixpoint
    *    IS the core number (locality of coreness); convergence is an EXACT
    *    zero-changes test, never a signature. Per round: one h join onto
    *    the symmetrized edges + one per-vertex descending window + one agg
    *    — all keyed by vertex, cost linear in edges; rounds are
    *    data-dependent: small on dense/clustered graphs, but O(diameter)
    *    on path-like graphs (a low h value propagates one hop per round —
    *    the same deep-chain regime ccAlternating exists for). `maxRounds`
    *    exceeded THROWS rather than returning a plausible non-fixpoint;
    *    raise it (or pre-contract degree-1 chains) for pathological
    *    diameters. Both regimes are parity-spec'd against each other on
    *    randomized graphs. */
  def coreNumbers(edges: DataFrame, maxRounds: Int = 100,
      localMaxEdges: Long = 2000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = edges.sparkSession
    import spark.implicits._
    val sym0 = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    val symPairs = collectPairsAtMost(sym0, localMaxEdges / 2)
    if (symPairs.isDefined) { // probe + collect fused into one action
      val (ids, adj) = indexedAdj(symPairs.get)
      val n = ids.length
      val deg = adj.map(_.length)
      val core = new Array[Int](n)
      // Matula–Beck: process vertices in nondecreasing current-degree
      // order via bucket queues; core(v) = running max of its peel degree
      val maxDeg = if (n == 0) 0 else deg.max
      val buckets = Array.fill(maxDeg + 1)(new scala.collection.mutable.ArrayDeque[Int]())
      (0 until n).foreach(i => buckets(deg(i)) += i)
      val removed = new Array[Boolean](n)
      val cur = deg.clone()
      var k = 0
      var b = 0
      while (b <= maxDeg) {
        val q = buckets(b)
        if (q.isEmpty) b += 1
        else {
          val i = q.removeHead()
          if (!removed(i) && cur(i) == b) {
            removed(i) = true
            k = math.max(k, b)
            core(i) = k
            adj(i).foreach { j =>
              if (!removed(j) && cur(j) > b) {
                cur(j) -= 1
                buckets(cur(j)) += j
                if (cur(j) < b) b = cur(j) // can only drop to b-1
              }
            }
          }
        }
      }
      (0 until n).map(i => (ids(i), core(i).toLong)).toDF("id", "core")
    } else {
      val sym = sym0.unionAll(sym0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint(true)
      var h = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("h"))
        .localCheckpoint(true)
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < maxRounds) {
        rounds += 1
        val nb = sym.join(h.select(col("id").as("dst"), col("h").as("hu")), "dst")
          .select(col("src").as("id"), col("hu"))
        val w = Window.partitionBy("id").orderBy(col("hu").desc)
        val h2 = nb.withColumn("rn", row_number().over(w))
          .groupBy("id").agg(max(least(col("rn").cast("long"), col("hu"))).as("h"))
          .localCheckpoint(true)
        changed = h.join(h2.withColumnRenamed("h", "h2"), "id")
          .where(col("h") =!= col("h2")).count()
        h = h2
      }
      if (changed > 0)
        throw new IllegalStateException(
          s"coreNumbers h-index iteration did not converge within $maxRounds rounds")
      h.select(col("id"), col("h").as("core"))
    }
  }

  /** k-truss decomposition (fixed k): the maximal subgraph in which every
    * edge participates in >= k−2 triangles WITHIN the subgraph — the
    * community-detection sibling of [[kCore]] (a k-truss is a stricter,
    * triangle-cohesive k−1-core). Edges are canonicalized undirected
    * (least/greatest, self-loops and parallels collapsed). Iterative
    * peeling to an EXACT edge-count fixpoint (monotone removal, the kCore
    * argument — never a signature); returns `(id_a, id_b, support)` with
    * the within-truss support.
    *
    * Scale: per-round support is ONE wedge join (e ⋈ adj ⋈ adj, all keyed
    * equi-joins — the triangle-count shape, never cartesian) + one pair
    * agg + one semi-join, all on the SHRINKING edge set; per-vertex wedge
    * work is deg², so pre-capping hubs (e.g. via [[linkPrediction]]'s
    * maxDeg rule on the generating projection) bounds the round cost.
    * Eager per-round checkpoints keep lineage flat. */
  def kTruss(edges: DataFrame, k: Int, maxRounds: Int = 64,
      localMaxEdges: Long = 2000000L): DataFrame = {
    require(k >= 3)
    val spark = edges.sparkSession
    import spark.implicits._
    val a = col("src").cast("long"); val b = col("dst").cast("long")
    // LAZY checkpoint BEFORE the guard probe: kTruss inputs are often
    // expensive derived graphs (q_ktruss feeds it a linkPrediction wedge
    // agg), and probe + collect/distinct would otherwise re-evaluate that
    // upstream twice. Lazy (not eager): each partition of raw computes at
    // most once whichever consumer touches it first — eager would force a
    // dedicated full pass UP FRONT, an extra whole-input materialization
    // in the above-guard regime where distinct() is about to scan it anyway
    val raw = edges.select(least(a, b).as("a"), greatest(a, b).as("b"))
      .where(col("a") =!= col("b")).localCheckpoint(eager = false)
    // guarded LOCAL support-peel (the kCore rationale): the k-truss is the
    // UNIQUE maximal subgraph in which every edge closes >= k-2 triangles
    // within it, so ANY correct peel order converges to the identical edge
    // set — and each survivor's within-truss support (its triangle count in
    // that unique subgraph) is peel-order-independent too. A single queue
    // pass with incremental support maintenance replaces per-round wedge
    // joins whose sf0.1 cost is pure round-scheduling latency; the
    // distributed loop runs above the guard (parity-spec'd both regimes).
    // Raw-pair guard: counting BEFORE distinct skips that shuffle here.
    // Probe + collect fused into one action (collectPairsAtMost).
    val rawPairs = collectPairsAtMost(raw, localMaxEdges)
    if (rawPairs.isDefined) {
      val (ids, adj) = indexedAdj(rawPairs.get)
      val n = ids.length
      adj.foreach(java.util.Arrays.sort)
      def ekey(i: Int, j: Int): Long =
        (math.min(i, j).toLong << 32) | math.max(i, j).toLong
      val eU = new scala.collection.mutable.ArrayBuffer[Int]()
      val eV = new scala.collection.mutable.ArrayBuffer[Int]()
      val eIdx = new scala.collection.mutable.LongMap[Int]()
      var i = 0
      while (i < n) {
        adj(i).foreach { j =>
          if (i < j) { eIdx(ekey(i, j)) = eU.length; eU += i; eV += j }
        }
        i += 1
      }
      val m = eU.length
      // initial support: per edge, iterate the SMALLER endpoint adjacency
      // with O(1) edge-map membership probes for the other endpoint —
      // O(Σ_e min_deg(e)), the m^1.5-bounded triangle-enumeration shape
      // (a two-pointer merge would pay O(deg_u + deg_v), i.e. hub degree
      // on EVERY incident edge of a star)
      val sup = new Array[Int](m)
      var e = 0
      while (e < m) {
        val u = eU(e); val v = eV(e)
        val (x, y) = if (adj(u).length <= adj(v).length) (u, v) else (v, u)
        var s = 0
        adj(x).foreach { w => if (w != y && eIdx.contains(ekey(y, w))) s += 1 }
        sup(e) = s
        e += 1
      }
      val alive = Array.fill(m)(true)
      val queued = new Array[Boolean](m)
      val queue = new scala.collection.mutable.ArrayDeque[Int]()
      e = 0
      while (e < m) {
        if (sup(e) < k - 2) { queued(e) = true; queue += e }
        e += 1
      }
      def drop(t: Int): Unit = {
        sup(t) -= 1
        if (!queued(t) && sup(t) < k - 2) { queued(t) = true; queue += t }
      }
      while (queue.nonEmpty) {
        val t = queue.removeHead()
        alive(t) = false
        val u = eU(t); val v = eV(t)
        val (x, y) = if (adj(u).length <= adj(v).length) (u, v) else (v, u)
        adj(x).foreach { w =>
          if (w != y) {
            val e1 = eIdx(ekey(x, w))
            if (alive(e1)) eIdx.get(ekey(y, w)).foreach { e2 =>
              // triangle (t, e1, e2) destroyed exactly once: later removals
              // of e1/e2 see alive(t) == false and skip it
              if (alive(e2)) { drop(e1); drop(e2) }
            }
          }
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      e = 0
      while (e < m) {
        if (alive(e)) {
          val ia = ids(eU(e)); val ib = ids(eV(e))
          out += ((math.min(ia, ib), math.max(ia, ib), sup(e).toLong))
        }
        e += 1
      }
      return out.toSeq.toDF("id_a", "id_b", "support")
    }
    var cur = raw.distinct().localCheckpoint(true)
    // support(a,b) = wedge enumeration + hash agg, kept over the
    // adjacency-ARRAY + array_intersect alternative after measuring both:
    // the array form shuffles each hub's full neighbor list on every
    // incident edge row and pays a per-row hashset build, timing ~20%
    // SLOWER at sf0.1 (3.3-4.2 s vs 2.8-3.4 warm) — Spark's codegen'd
    // hash aggregate absorbs the wedge stream faster than per-row arrays
    def support(e: DataFrame): DataFrame = {
      val adj = e.select(col("a").as("u"), col("b").as("w"))
        .unionAll(e.select(col("b").as("u"), col("a").as("w")))
      e.join(adj.select(col("u").as("a"), col("w")), "a")
        .join(adj.select(col("u").as("b"), col("w")), Seq("b", "w"))
        .groupBy("a", "b").agg(count(lit(1)).as("s"))
    }
    var n = cur.count()
    var converged = false
    var rounds = 0
    // carry the converging round's materialized support: on convergence
    // ne == cur, so lastSup IS the final edge set's support — reusing it for
    // the output join saves a full extra wedge-join pass (the dominant cost)
    var lastSup: DataFrame = null
    while (!converged && rounds < maxRounds) {
      rounds += 1
      val sup = support(cur).localCheckpoint(true)
      val ne = cur.join(sup.where(col("s") >= k - 2), Seq("a", "b"), "left_semi")
        .localCheckpoint(true)
      val m = ne.count()
      if (m == n) { converged = true; lastSup = sup } else { cur = ne; n = m }
    }
    if (!converged)
      throw new IllegalStateException(s"kTruss did not converge within $maxRounds rounds")
    cur.join(lastSup, Seq("a", "b"))
      .select(col("a").as("id_a"), col("b").as("id_b"), col("s").as("support"))
  }

  /** Deterministic maximal independent set — Luby's algorithm (Luby 1986)
    * with HASH priorities instead of RNG: in round r, surviving candidate v
    * has priority `md5("r:v") ++ zero-padded v` (the id suffix makes the
    * order total), and joins the set iff its priority is strictly below
    * every surviving neighbor's. Winners and their neighbors leave the
    * pool; candidates that lost all neighbors win the next round
    * unopposed. The result is independent (no edge inside) and maximal
    * (every outsider saw a winning neighbor when it was removed), and a
    * pure fact of (graph, round counter) — reruns, partitionings, and
    * engines agree, so a SQL oracle replays the rounds verbatim
    * (over-unrolling is exact: an empty pool yields empty rounds).
    *
    * Scale: per round one candidate⋈edge join, one src-keyed min, one
    * anti-join + two semi-joins — all on the candidate-induced subgraph,
    * which SHRINKS every round (the globally-minimal priority always
    * wins, and hash-uniform priorities remove a constant expected edge
    * fraction per round ⇒ O(log n) expected rounds). Eager per-round
    * checkpoints keep lineage flat (the Descend rule). */
  def maximalIndependentSet(edges: DataFrame, maxRounds: Int = 64,
      localMaxEdges: Long = 2000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sym0 = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    // guarded LOCAL replay of the identical hash-priority rounds (the MST
    // Kruskal-finish rationale): at local/test scale the loop's cost is
    // pure per-round scheduling latency; the priorities are engine-free
    // strings, so the driver replay is bit-identical to the distributed
    // loop (parity-spec'd) — above the guard the distributed path runs.
    // The guard counts RAW pairs (>= the distinct symmetrized edge count /
    // 2), so qualifying inputs skip the symmetrize+distinct shuffle too.
    // Probe + collect fused into one action (collectPairsAtMost).
    val symPairs = collectPairsAtMost(sym0, localMaxEdges / 2)
    if (symPairs.isDefined) {
      val (ids, adj) = indexedAdj(symPairs.get)
      val n = ids.length
      val alive = Array.fill(n)(true)
      var nAlive = n
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      var r = 0
      while (nAlive > 0) {
        r += 1
        if (r > maxRounds)
          throw new IllegalStateException(s"MIS did not drain within $maxRounds rounds")
        val p = new Array[String](n)
        val round = r
        java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
          if (alive(i)) p(i) = md5hex(s"$round:${ids(i)}") + pad20(ids(i))
        }
        val win = (0 until n).filter { i =>
          alive(i) && adj(i).forall(j => !alive(j) || p(i) < p(j))
        }
        win.foreach { i =>
          out += ids(i)
          if (alive(i)) { alive(i) = false; nAlive -= 1 }
          adj(i).foreach { j => if (alive(j)) { alive(j) = false; nAlive -= 1 } }
        }
      }
      return out.toSeq.toDF("id")
    }
    var e = sym0.unionAll(sym0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var cand = e.select(col("src").as("id")).distinct().localCheckpoint(true)
    var mis = cand.where(lit(false))
    var n = cand.count()
    var r = 0
    while (n > 0) {
      r += 1
      if (r > maxRounds)
        throw new IllegalStateException(s"MIS did not drain within $maxRounds rounds")
      val p = cand.select(col("id"),
        concat(md5(concat(lit(s"$r:"), col("id").cast("string"))),
          lpad(col("id").cast("string"), 20, "0")).as("p"))
      val minNbr = e.join(p.select(col("id").as("dst"), col("p").as("pd")), "dst")
        .groupBy("src").agg(min("pd").as("mn"))
      val win = p.join(minNbr.select(col("src").as("id"), col("mn")), Seq("id"), "left")
        .where(col("mn").isNull || col("p") < col("mn"))
        .select("id").localCheckpoint(true)
      mis = mis.unionByName(win)
      val removed = win.unionAll(
          e.join(win.select(col("id").as("src")), Seq("src"), "left_semi")
            .select(col("dst").as("id")))
        .distinct()
      cand = cand.join(removed, Seq("id"), "left_anti").localCheckpoint(true)
      e = e.join(cand.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(cand.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst").localCheckpoint(true)
      n = cand.count()
    }
    mis
  }

  /** Link prediction by shared neighbors — TWO-MODE formulation: candidate
    * pairs are `src` vertices, similarity counted over shared `dst`
    * neighbors (for a one-mode undirected graph, pass the symmetrized edge
    * list and this degenerates to the classic definition). Returns
    * non-adjacent pairs sharing >= `minCommon` neighbors with the
    * common-neighbor count and the INTEGER-EXACT resource-allocation index
    * Σ_z `scale div deg(z)` (Zhou–Lü–Zhang 2009 — RA's 1/deg stays in
    * integers where Adamic–Adar's 1/log deg would need floats).
    *
    * Scale: wedge enumeration is the triangle-count shape — per-center
    * work is deg², so centers above `maxDeg` are EXCLUDED (the standard
    * link-prediction hub rule: a neighbor shared with everyone carries no
    * signal, and the cap bounds the wedge explosion at `maxDeg²` per
    * center). Everything is keyed joins + one (id_a,id_b) agg — the
    * candidate join never goes cartesian. */
  private val linkPredCache = scala.collection.concurrent.TrieMap[
    (org.apache.spark.sql.SparkSession, Int, Int, Long, Long, Long), DataFrame]()

  def linkPrediction(edges: DataFrame, minCommon: Long, maxDeg: Long,
      scale: Long = 1000000L): DataFrame =
    if (!graft.graph.Tpch.shareScans)
      linkPredictionImpl(edges, minCommon, maxDeg, scale)
    else {
      // under the multi-query scan-sharing regime the predicted-link table
      // is an intermediate shared by the link-prediction query and the
      // k-truss query over the SAME base graph — compute it once per
      // (input plan, parameters). Same contract as Dedup.pairsCache
      // (session-keyed, two independent plan hashes, bounded size) with
      // one difference: the callers build their input plan independently,
      // so the raw toString carries fresh exprIds per call and would never
      // hit — both hashes here are of the CANONICALIZED plan (exprIds
      // normalized), which is exactly the equivalence the reuse wants.
      val plan = edges.queryExecution.analyzed
      val key = (edges.sparkSession, plan.semanticHash(),
        plan.canonicalized.toString.hashCode, minCommon, maxDeg, scale)
      if (linkPredCache.size > 32) linkPredCache.clear()
      linkPredCache.getOrElseUpdate(key,
        linkPredictionImpl(edges, minCommon, maxDeg, scale).localCheckpoint(eager = false))
    }

  private def linkPredictionImpl(edges: DataFrame, minCommon: Long, maxDeg: Long,
      scale: Long): DataFrame = {
    require(minCommon >= 1 && maxDeg >= 2)
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst")).distinct()
      .localCheckpoint(eager = false) // scanned 4×: centers, wedges, degrees, adjacency
    val ctr = e.groupBy("dst").agg(count(lit(1)).as("d"))
      .where(col("d") >= 2 && col("d") <= maxDeg)
    val ew = e.join(ctr, "dst")
    val pairs = ew.select(col("dst"), col("src").as("id_a"), col("d"))
      .join(ew.select(col("dst"), col("src").as("id_b")), "dst")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("cn"), sum(expr(s"$scale div d")).as("ra"))
    // neighborhood Jaccard in basis points rides along for free: the pair's
    // cn plus each endpoint's FULL degree (hubs included — the cap governs
    // only wedge centers, not the denominator)
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("dg"))
    pairs.join(e.select(col("src").as("id_a"), col("dst").as("id_b")),
        Seq("id_a", "id_b"), "left_anti")
      .where(col("cn") >= minCommon)
      .join(deg.select(col("id").as("id_a"), col("dg").as("__da")), "id_a")
      .join(deg.select(col("id").as("id_b"), col("dg").as("__db")), "id_b")
      .select(col("id_a"), col("id_b"), col("cn"), col("ra"),
        expr("(10000 * cn) div (__da + __db - cn)").as("jaccard_bp"))
  }

  /** Modularity of a community partition (Newman–Girvan Q), INTEGER-EXACT
    * in parts-per-million: per community c,
    *
    *   q_ppm(c) = (10⁶·I_c) div M − (10⁶·d_c²) div M²
    *
    * where M = |symmetrized edge list| (= 2m), I_c = directed intra-pairs,
    * d_c = community degree sum — Q·10⁶ ≈ Σ_c q_ppm(c), every term floor
    * division, so both engines replay it bit-identically (the evaluation
    * metric for [[labelPropagationSync]] / [[connectedComponents]]
    * partitions). Returns (community, internal, degree_sum, q_ppm).
    *
    * Scale: two keyed joins (edge ends → communities) + two community aggs
    * + one scalar count — no pair enumeration anywhere. Long arithmetic
    * bounds: d_c²·10⁶ needs d_c < 3·10⁶; past that, pre-aggregate per
    * community and run the square on DECIMAL (noted, not silently wrong —
    * ANSI mode errors on overflow rather than wrapping). */
  def modularity(edges: DataFrame, communities: DataFrame,
      scale: Long = 1000000L): DataFrame = {
    val e0 = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val sym = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(eager = false) // scanned for M, I_c, d_c
    val m = sym.count()
    // same long cast as the populated path, so the empty-graph schema
    // unions/encodes identically to the normal one
    if (m == 0L) return communities.select(col("community").cast("long").as("community"))
      .where(lit(false))
      .withColumn("internal", lit(0L)).withColumn("degree_sum", lit(0L))
      .withColumn("q_ppm", lit(0L))
    val comm = communities.select(col("id").cast("long").as("id"),
      col("community").cast("long").as("community"))
    val j = sym.join(comm.select(col("id").as("src"), col("community").as("ca")), "src")
      .join(comm.select(col("id").as("dst"), col("community").as("cb")), "dst")
    val d = j.groupBy(col("ca").as("community")).agg(
      count(lit(1)).as("degree_sum"),
      sum(when(col("ca") === col("cb"), 1L).otherwise(0L)).as("internal"))
    d.select(col("community"), col("internal"), col("degree_sum"),
      expr(s"($scale * internal) div ${m}L - ($scale * degree_sum * degree_sum) div ${m * m}L")
        .as("q_ppm"))
  }

  /** Borůvka minimum spanning forest — the distributed MST algorithm (each
    * component picks its cheapest crossing edge; chosen edges contract;
    * components at least HALVE per round ⇒ ≤ ⌈log₂ n⌉ rounds regardless of
    * graph shape — the reason Borůvka, not Prim/Kruskal, is the scale
    * formulation: no priority queue, no global edge sort). Edges are
    * canonicalized (least/greatest, parallels collapsed to their min
    * weight); the edge order (w, src, dst) is a STRICT total order, so the
    * forest is the UNIQUE minimum spanning forest under it — a pure fact
    * of the graph that reruns, partitionings, and engines agree on (the
    * oracle replays the same rounds; chosen edges depend only on the
    * component PARTITION, not on label values, so any min-id labeling
    * agrees). Returns the forest as `(src, dst, w)`.
    *
    * Scale: per round ONE crossing-edge join (two keyed probes of the
    * component map) + one per-component window min + a component-LEVEL
    * contraction: [[ccAlternating]] runs on the chosen-edge graph whose
    * vertex set is the current components — never the full graph — and
    * shrinks geometrically. Eager per-round checkpoints (the Descend
    * rule). Once the crossing set fits `localMaxEdges`, a guarded KRUSKAL
    * finish (sorted partition-at-a-time stream + driver union-find over
    * component ids) completes the identical unique forest in one pass —
    * the geometric shrink lands every run's TAIL there, where per-round
    * scheduling latency would otherwise dominate. */
  /** Bounded guard probe: true iff `df` has at most `n` rows, SCANNING at
    * most n+1 of them — a guard's cost stays capped at its threshold
    * instead of a full count of an arbitrarily large input (the local
    * replays sit in front of billion-edge distributed paths). */
  /** Runs `body` with Spark's incremental-limit first wave widened from 1
    * partition to the session's core count: a guard probe/collect over a
    * 32-partition frame otherwise executes as up to 4 SEQUENTIAL jobs
    * (waves of 1, 4, 16, 32 partitions — measured 0.33 s vs 0.09 s for a
    * plain parallel collect on a warm 16 k-row frame). One wave of
    * `defaultParallelism` partitions keeps the early-stop property on
    * genuinely large inputs (a cluster frame with 10⁴ partitions still
    * stops after core-count partitions if the limit is already exceeded)
    * while making the common bench-scale case one parallel job. The
    * set/restore is the shared, session-synchronized implementation in
    * [[graft.plans.Scale.oneWaveLimit]] (concurrent library callers must
    * not interleave save/restore pairs). */
  private def oneWaveLimit[A](df: DataFrame)(body: => A): A =
    graft.plans.Scale.oneWaveLimit(df)(body)

  private def atMost(df: DataFrame, n: Long): Boolean = {
    if (n < 0) return false
    val probe = math.min(n, Int.MaxValue - 1L).toInt + 1
    oneWaveLimit(df)(df.limit(probe).count() <= n)
  }

  /** One-action guard + collect, fusing [[atMost]]'s probe with the local
    * replay's collect: runs the LIMITED plan once and returns the rows iff
    * the frame holds at most n of them. Every guarded replay used to pay
    * two sequential driver actions over the same (checkpointed) frame —
    * a limit+count probe, then a full collect — each with Spark's
    * incremental-limit multi-stage execution; measured 0.2-0.4 s of pure
    * probe latency per qualifying query at sf0.1. Above the guard the
    * wasted transfer is bounded by the guard constant itself (n+1 rows),
    * the same driver budget the subsequent collect would have spent. */
  /** INTERNAL rows, not external ones: Dataset.collect() wraps every row
    * in a boxed GenericRow (~100 B and 5 objects per row — ~200 MB of
    * simultaneously-live garbage at the 2 M guard), which a fresh JVM
    * absorbs but the bench JVM (heap already holding every cached table)
    * answers with full-GC churn. executeCollect returns the compact
    * UnsafeRows as-is; isNullAt/getLong read them directly. */
  private def collectAtMost(df: DataFrame, n: Long)
      : Option[Array[org.apache.spark.sql.catalyst.InternalRow]] = {
    if (n < 0) return None
    val probe = math.min(n, Int.MaxValue - 1L).toInt + 1
    val rows = oneWaveLimit(df)(
      df.limit(probe).queryExecution.executedPlan.executeCollect())
    if (rows.length <= n) Some(rows) else None
  }

  /** [[collectAtMost]] for the common (src, dst) long-pair frames; any
    * null endpoint rejects the local replay (the distributed path defines
    * the null semantics, so a null-carrying input falls back to it). */
  private def collectPairsAtMost(df: DataFrame, n: Long): Option[Array[(Long, Long)]] =
    collectAtMost(df, n).flatMap { rows =>
      if (rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) None
      else Some(rows.map(r => (r.getLong(0), r.getLong(1))))
    }

  /** [[collectAtMost]] for single long-column frames (vertex/seed lists);
    * same null-falls-back-to-distributed rule as [[collectPairsAtMost]]. */
  private def collectLongsAtMost(df: DataFrame, n: Long): Option[Array[Long]] =
    collectAtMost(df, n).flatMap { rows =>
      if (rows.exists(_.isNullAt(0))) None else Some(rows.map(_.getLong(0)))
    }

  /** Greedy Kruskal accept sweep shared by [[boruvkaForest]]'s two guarded
    * finishes: tuples (w, src, dst, compA, compB) arrive in (w, src, dst)
    * order; a path-halving min-root union-find over the component labels
    * accepts each component-crossing edge. Returns kept (src, dst, w). */
  private def kruskalAccept(it: Iterator[(Long, Long, Long, Long, Long)])
      : Seq[(Long, Long, Long)] = {
    val uf = new MinUnionFind
    val keep = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    it.foreach { case (w, s, d, ca, cb) =>
      if (uf.union(ca, cb)) keep += ((s, d, w))
    }
    keep.toSeq
  }

  def boruvkaForest(edges: DataFrame, maxRounds: Int = 40,
      localMaxEdges: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = edges.sparkSession
    import spark.implicits._
    val a = col("src").cast("long"); val b = col("dst").cast("long")
    val canonRaw = edges.select(least(a, b).as("src"), greatest(a, b).as("dst"),
        col("w").cast("long").as("w"))
      .where(col("src") =!= col("dst"))
    // fully-local guard (the MIS raw-pair rationale): below it, the
    // parallel-collapse groupBy SHUFFLE never runs either — collect the
    // raw weighted pairs, take min-w per pair driver-side, and Kruskal
    // the whole unique forest in one pass
    val rawRows = collectAtMost(canonRaw, localMaxEdges) // probe+collect fused
      .filter(!_.exists(r => r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2)))
    if (rawRows.isDefined) {
      val best = scala.collection.mutable.HashMap[(Long, Long), Long]()
      rawRows.get.foreach { r =>
        val (s, d, w) = (r.getLong(0), r.getLong(1), r.getLong(2))
        val k = (s, d)
        if (best.get(k).forall(w < _)) best(k) = w
      }
      val sorted = best.iterator.map { case ((s, d), w) => (w, s, d) }.toArray
      java.util.Arrays.sort(sorted, implicitly[Ordering[(Long, Long, Long)]])
      return kruskalAccept(sorted.iterator.map { case (w, s, d) => (w, s, d, s, d) })
        .toDF("src", "dst", "w")
    }
    val e = canonRaw
      .groupBy("src", "dst").agg(min("w").as("w"))
      .localCheckpoint(true)
    // comp stays null until the first contraction: round 1's component map
    // is the IDENTITY, so its two keyed probes and the vertex distinct
    // would be pure overhead (ca = src, cb = dst, nothing filtered)
    var comp: DataFrame = null
    var forest = e.where(lit(false)).localCheckpoint(true)
    var done = false
    var r = 0
    while (!done) {
      r += 1
      if (r > maxRounds)
        throw new IllegalStateException(s"boruvkaForest did not converge within $maxRounds rounds")
      val x =
        if (comp == null)
          e.select(col("src"), col("dst"), col("w"),
            col("src").as("ca"), col("dst").as("cb"))
        else e.join(comp.select(col("id").as("src"), col("comp").as("ca")), "src")
          .join(comp.select(col("id").as("dst"), col("comp").as("cb")), "dst")
          .where(col("ca") =!= col("cb")).localCheckpoint(true)
      val nx = x.count()
      if (nx == 0) done = true
      else if (nx <= localMaxEdges) {
        // Guarded KRUSKAL finish: the forest is UNIQUE under the
        // (w, src, dst) total order, so completing it with a different MST
        // algorithm yields the identical edge set. The crossing set
        // shrinks geometrically, so at any scale the TAIL rounds land here
        // — replacing per-round scheduling latency (the dominant cost once
        // the data is small) with one guarded sorted stream. Partition-at-
        // a-time via toLocalIterator (the collectReachable rule): driver
        // holds only the union-find map over component ids + kept edges.
        val it = x.select(col("w"), col("src"), col("dst"), col("ca"), col("cb"))
          .sort("w", "src", "dst")
          .as[(Long, Long, Long, Long, Long)].toLocalIterator()
        forest = forest.unionByName(
          kruskalAccept(new Iterator[(Long, Long, Long, Long, Long)] {
            def hasNext = it.hasNext
            def next() = it.next()
          }).toDF("src", "dst", "w"))
        done = true
      } else {
        val cand = x.select(col("ca").as("c"), col("src"), col("dst"), col("w"))
          .unionAll(x.select(col("cb").as("c"), col("src"), col("dst"), col("w")))
        val chosen = cand.withColumn("rn", row_number().over(
            Window.partitionBy("c").orderBy(col("w"), col("src"), col("dst"))))
          .where(col("rn") === 1)
          .select("src", "dst", "w").distinct().localCheckpoint(true)
        forest = forest.unionByName(chosen).localCheckpoint(true)
        // contraction at COMPONENT level: CC over the chosen edges viewed as
        // (old comp → old comp) links; min-id roots keep labels deterministic
        val cg = x.join(chosen, Seq("src", "dst", "w"), "left_semi")
          .select(col("ca").as("src"), col("cb").as("dst"))
        val m = ccAlternating(cg)
        val base = if (comp != null) comp
          else e.select(col("src").as("id")).unionAll(e.select(col("dst").as("id")))
            .distinct().select(col("id"), col("id").as("comp"))
        comp = base.join(m.select(col("id").as("comp"), col("component")), Seq("comp"), "left")
          .select(col("id"), coalesce(col("component"), col("comp")).as("comp"))
          .localCheckpoint(true)
      }
    }
    forest
  }

  /** Bipartite butterfly (2×2 biclique = 4-cycle) census — the bipartite
    * analogue of the triangle count (Wang et al., "Butterfly counting in
    * bipartite networks"): wedges = Σ_r C(deg r, 2) (paths of length 2
    * through a right vertex), butterflies = Σ_{left pairs} C(cn, 2) where
    * cn = common right-neighbors of the pair. Returns one row
    * `(wedges, butterflies)`, both BIGINT-exact (n·(n−1) is even, so the
    * `div 2` halving is exact).
    *
    * Scale: the wedge join is the triangle-count shape — per-right-vertex
    * work is deg², so right hubs above `maxDeg` are EXCLUDED (the same
    * signal-free-hub rule as [[linkPrediction]]; a right vertex connected
    * to everything witnesses no discriminative 4-cycle and would alone
    * contribute deg² join rows). All keyed joins + one global agg. */
  def butterflyCount(edges: DataFrame, maxDeg: Long): DataFrame = {
    require(maxDeg >= 2)
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .distinct()
      .localCheckpoint(eager = false) // scanned twice: degrees + both wedge sides
    val ctr = e.groupBy("dst").agg(count(lit(1)).as("d"))
      .where(col("d") >= 2 && col("d") <= maxDeg)
    val ew = e.join(ctr, "dst")
    val pairs = ew.select(col("dst"), col("src").as("id_a"))
      .join(ew.select(col("dst"), col("src").as("id_b")), "dst")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("cn"))
    val w = ctr.agg(sum(expr("(d * (d - 1)) div 2")).as("wedges"))
    val bf = pairs.agg(sum(expr("(cn * (cn - 1)) div 2")).as("butterflies"))
    w.crossJoin(bf).select(
      coalesce(col("wedges"), lit(0L)).as("wedges"),
      coalesce(col("butterflies"), lit(0L)).as("butterflies"))
  }

  /** Jones–Plassmann greedy graph coloring with HASH priorities (the
    * distributed coloring workhorse — Jones & Plassmann 1993): in each
    * round, an uncolored vertex whose priority `md5(id) ++ zero-padded id`
    * (a strict total order) is the max among its UNCOLORED neighbors takes
    * the smallest color (0-based) absent from its already-colored
    * neighborhood. Every round colors at least the globally-max uncolored
    * vertex, and hash-uniform priorities color an expected constant
    * fraction per round; colors are bounded by maxDegree+1 (≤ `maxColors`,
    * enforced). Deterministic — a pure fact of the graph, so the oracle
    * replays the rounds verbatim (over-unrolling is exact: once all are
    * colored the winner set is empty).
    *
    * Scale: per round one uncolored⋈edge join + one max-priority agg (the
    * MIS shape), plus a bounded `maxColors`-way candidate explode
    * anti-joined against neighbor colors — all keyed, all on the SHRINKING
    * uncolored set. Eager per-round checkpoints. */
  def jpColoring(edges: DataFrame, maxColors: Int = 64, maxRounds: Int = 256,
      localMaxEdges: Long = 2000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sym0 = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    def prio(id: Column): Column =
      concat(md5(id.cast("string")), lpad(id.cast("string"), 20, "0"))
    // guarded LOCAL replay of the identical fixed-priority rounds (winners
    // are strict local maxima, so same-round winners are never adjacent and
    // sequential color picks within a round see exactly the pre-round
    // colored set) — bit-identical to the distributed loop, parity-spec'd;
    // raw-pair guard skips the symmetrize+distinct shuffle (the MIS note);
    // probe + collect fused into one action (collectPairsAtMost)
    val symPairs = collectPairsAtMost(sym0, localMaxEdges / 2)
    if (symPairs.isDefined) {
      val (ids, adj) = indexedAdj(symPairs.get)
      val n = ids.length
      adj.iterator.map(_.length).maxOption.foreach(d =>
        require(d < maxColors,
          s"maxColors=$maxColors <= max degree $d; JP needs maxDegree+1"))
      val p = new Array[String](n)
      java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
        p(i) = md5hex(ids(i).toString) + pad20(ids(i))
      }
      val color = Array.fill(n)(-1)
      var nLeft = n
      var r = 0
      while (nLeft > 0) {
        r += 1
        if (r > maxRounds)
          throw new IllegalStateException(s"jpColoring did not drain within $maxRounds rounds")
        val win = (0 until n).filter { i =>
          color(i) < 0 && adj(i).forall(j => color(j) >= 0 || p(i) > p(j))
        }
        win.foreach { i =>
          val used = adj(i).iterator.map(color).filter(_ >= 0).toSet
          color(i) = (0 until maxColors).find(c => !used.contains(c)).get
          nLeft -= 1
        }
      }
      return ids.indices.map(i => (ids(i), color(i))).toDF("id", "color")
    }
    val e = sym0.unionAll(sym0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    // JP needs at most maxDegree+1 colors; check ONCE so a too-small
    // maxColors fails loudly instead of silently dropping saturated vertices
    val dmax = e.groupBy("src").agg(count(lit(1)).as("d")).agg(max("d")).head()
    if (!dmax.isNullAt(0))
      require(dmax.getLong(0) < maxColors,
        s"maxColors=$maxColors <= max degree ${dmax.getLong(0)}; JP needs maxDegree+1")
    var uncolored = e.select(col("src").as("id")).distinct().localCheckpoint(true)
    var colored = uncolored.select(col("id"), lit(0).as("color")).where(lit(false))
      .localCheckpoint(true)
    var n = uncolored.count()
    var r = 0
    while (n > 0) {
      r += 1
      if (r > maxRounds)
        throw new IllegalStateException(s"jpColoring did not drain within $maxRounds rounds")
      val p = uncolored.select(col("id"), prio(col("id")).as("p"))
      val maxNbr = e.join(p.select(col("id").as("dst"), col("p").as("pd")), "dst")
        .groupBy("src").agg(max("pd").as("mx"))
      val win = p.join(maxNbr.select(col("src").as("id"), col("mx")), Seq("id"), "left")
        .where(col("mx").isNull || col("p") > col("mx"))
        .select("id").localCheckpoint(true)
      // smallest color absent among already-colored neighbors
      val nbrColors = e.join(win.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(colored.select(col("id").as("dst"), col("color")), "dst")
        .select(col("src").as("id"), col("color")).distinct()
      val pick = win.select(col("id"), explode(sequence(lit(0), lit(maxColors - 1))).as("color"))
        .join(nbrColors, Seq("id", "color"), "left_anti")
        .groupBy("id").agg(min("color").as("color"))
      colored = colored.unionByName(pick).localCheckpoint(true)
      uncolored = uncolored.join(win, Seq("id"), "left_anti").localCheckpoint(true)
      n = uncolored.count()
    }
    colored
  }

  /** In/out/both degree per vertex (fermor out-edge-count / in-edge-count /
    * both-edge-count, and the gremlin degree-centrality recipe). */
  def degrees(edges: DataFrame, direction: String = "both"): DataFrame = {
    val cols = direction match {
      case "out"  => Seq("src")
      case "in"   => Seq("dst")
      case _      => Seq("src", "dst")
    }
    cols.map(c => edges.select(col(c).as("id")))
      .reduce(_.unionAll(_))
      .groupBy("id").agg(count(lit(1)).as("degree"))
  }

  /** Topological levels on a DAG (fermor postwalk / reverse-postwalk family):
    * level(v) = length of the longest path from any source to v. Bounded
    * DataFrame fixpoint — maxIter caps the join chain, and is BY CONTRACT a
    * level cap: vertices deeper than maxIter report level <= maxIter+1
    * (callers that know the exact depth pass it to skip the detection
    * round). Pass `requireConverged = true` to instead fail loudly when the
    * DAG is deeper than the bound — the safe default for unknown inputs,
    * where a silent cap would return plausible but wrong levels. */
  def topoLevels(vertices: DataFrame, edges: DataFrame, maxIter: Int = 10,
      requireConverged: Boolean = false, localMaxEdges: Long = 50000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // parallel edges can't change a max-level fixpoint, and each round
    // dedups its frontier — ONE narrow lazy materialization shared by the
    // guard probe, the local collect, and every distributed round (the
    // kTruss probe rule: a derived edge graph evaluates its upstream once).
    // NO long cast here: the distributed rounds are type-agnostic joins and
    // must stay so (a string id would cast to null — silent corruption);
    // only the local replay needs longs, gated on integral column types.
    val e = edges.select(col("src"), col("dst")).localCheckpoint(eager = false)
    // guarded LOCAL replay (the kCore/CC pattern): the same frontier
    // recurrence — round i's frontier = distinct heads of edges out of
    // round i-1's, level(v) = max round that reached v — run on a collected
    // adjacency; identical semantics INCLUDING the maxIter level cap and
    // the requireConverged loud failure, so the replay is bit-exact under
    // truncation too (parity-spec'd at guard = 0). The 50k default is a
    // MEASURED rejection of a bigger guard: at sf0.1 (2M edges, depth 4,
    // local[32]) the local path reads 2.7-3.9 s vs 2.7 s distributed —
    // the collect + driver sets + 800k-row re-upload cost more than four
    // well-parallelized rounds — so it fires only on genuinely small DAGs
    if (integralCols(e, "src", "dst") &&
        integralCols(vertices, vertices.columns.head) &&
        atMost(e, localMaxEdges) && atMost(vertices, localMaxEdges)) {
      val eRows = e.select(col("src").cast("long"), col("dst").cast("long")).collect()
      val vRows = vertices.select(col(vertices.columns.head).cast("long")).collect()
      if (!eRows.exists(r => r.isNullAt(0) || r.isNullAt(1)) && !vRows.exists(_.isNullAt(0))) {
        val es = eRows.map(r => (r.getLong(0), r.getLong(1)))
        val vs = vRows.map(_.getLong(0))
        val adj = scala.collection.mutable.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
        es.foreach { case (s, d) =>
          adj.getOrElseUpdate(s, new scala.collection.mutable.ArrayBuffer[Long]) += d
        }
        val level = scala.collection.mutable.HashMap[Long, Int]()
        vs.foreach(v => level.getOrElseUpdate(v, 0))
        var frontier: scala.collection.Set[Long] = es.iterator.map(_._2).toSet
        frontier.foreach(v => level(v) = 1) // max-merge: round 1 beats the 0 init
        var i = 1
        var done = frontier.isEmpty
        while (!done && i < maxIter) {
          val next = scala.collection.mutable.HashSet[Long]()
          frontier.foreach(v => adj.get(v).foreach(_.foreach(next += _)))
          if (next.isEmpty) done = true
          else next.foreach(v => level(v) = i + 1) // later round always wins the max
          frontier = next
          i += 1
        }
        if (requireConverged && !done && frontier.nonEmpty)
          throw new IllegalStateException(
            s"topoLevels did not converge within maxIter=$maxIter rounds: the DAG is " +
              "deeper than the bound, so capped levels would be silently wrong — raise " +
              "maxIter (or pass requireConverged = false to accept the level cap)")
        return level.iterator.map { case (v, l) => (v, l) }.toSeq.toDF("id", "level")
      }
      // null ids: fall through — the distributed rounds keep the pre-replay
      // semantics for them (a null dst keeps its level row; null src never
      // matches a join)
    }
    // DELTA iteration: round i's frontier is exactly the heads of some
    // length-i path, so the level column is constant per round — each round
    // is a semi-join + distinct on the previous frontier only (no re-join or
    // re-agg of the full vertex set), and round 1 needs no join at all (it
    // is just the distinct edge heads). One global max-merge at the end.
    // Lazy localCheckpoints cut lineage (round i reads round i-1's cache,
    // never recomputes it) WITHOUT forcing a per-round job.
    val init = vertices.select(col(vertices.columns.head).as("id"))
      .withColumn("level", lit(0))
    var frontier = e.select(col("dst").as("id")).dropDuplicates("id")
      .localCheckpoint(eager = false)
    val rounds = scala.collection.mutable.ArrayBuffer[DataFrame](init)
    if (requireConverged) {
      // drain detection needs a per-round action (isEmpty), so this regime
      // pays one materialization per level — the price of the loud failure
      var i = 1
      var done = frontier.isEmpty
      if (!done) rounds += frontier.withColumn("level", lit(1))
      while (!done && i < maxIter) {
        frontier = e.join(frontier.select(col("id").as("src")), Seq("src"), "left_semi")
          .select(col("dst").as("id")).dropDuplicates("id")
          .localCheckpoint(eager = true) // full materialization before isEmpty
        if (frontier.isEmpty) done = true
        else rounds += frontier.withColumn("level", lit(i + 1))
        i += 1
      }
      if (!done && !frontier.isEmpty)
        throw new IllegalStateException(
          s"topoLevels did not converge within maxIter=$maxIter rounds: the DAG is " +
            "deeper than the bound, so capped levels would be silently wrong — raise " +
            "maxIter (or pass requireConverged = false to accept the level cap)")
    } else {
      // capped-level regime: no drain probe is needed — a drained frontier
      // contributes empty union branches, so running all maxIter rounds
      // BLIND folds the whole fixpoint into ONE action (no per-round
      // driver round-trip; callers that know the exact depth — the
      // q_topo_level shape — pay zero waste). Measured time-NEUTRAL at
      // sf0.1 local[32] (2.7 s both ways: the semi-join/distinct shuffles
      // dominate there) — the win is the removed per-round job barriers,
      // which cost real latency on a many-executor cluster, and maxIter-1
      // fewer driver actions per call.
      rounds += frontier.withColumn("level", lit(1))
      var i = 1
      while (i < maxIter) {
        frontier = e.join(frontier.select(col("id").as("src")), Seq("src"), "left_semi")
          .select(col("dst").as("id")).dropDuplicates("id")
          .localCheckpoint(eager = false)
        rounds += frontier.withColumn("level", lit(i + 1))
        i += 1
      }
    }
    rounds.reduce(_.unionByName(_)).groupBy("id").agg(max(col("level")).as("level"))
  }

  /** Push a value DOWN a DAG (fermor prewalk-reduce: accumulate along the
    * walk from the roots): each hop joins the current assignment through an
    * edge label, so a root attribute (e.g. a region id) reaches every
    * descendant. The mirror of [[rollup]]. */
  def pushDown(g: PropertyGraph, start: DataFrame, valueCol: String, labels: Seq[String]): DataFrame = {
    var cur = start // columns: id, <valueCol>
    labels.foreach { l =>
      // loader-counted small label slices broadcast (|deduped| <= |slice|,
      // so the registered exact count bounds the build); 250k guard here,
      // tighter than the hop default: a ~600k single-threaded dedup build
      // measured WORSE than the SMJ it replaces on the |start|-sized first
      // hop (q_rollup 1.15 -> 1.4 s warm), while the small later hops keep
      // the map-side probe
      val e0 = g.edges.where(col("label") === l).select("src", "dst").dropDuplicates("src", "dst")
      val e = if (g.labelRows(Seq(l)).exists(_ <= 250000L)) broadcast(e0) else e0
      cur = cur.join(e, cur("id") === e("dst"))
        .select(col("src").as("id"), col(valueCol))
    }
    cur.dropDuplicates("id", valueCol)
  }

  /** Roll an aggregate up a DAG level-by-level (fermor postwalk-reduce /
    * reverse-postwalk-reduce as a distributed reduction): here exposed as a
    * path-aggregate: sum `valueCol` of source vertices grouped by the vertex
    * reached after following `labels` hops. */
  def rollup(g: PropertyGraph, start: DataFrame, valueCol: String, labels: Seq[String]): DataFrame = {
    var cur = start // columns: id, <valueCol>; parallel edges collapse per hop
    // NOT aggregated per hop (r11 MEASURED rejection): sum is associative
    // along DAG paths, so a per-hop groupBy(dst).sum is semantically the
    // final agg pushed down — but at bench scale the four added agg
    // exchanges cost more than the row shrink saves (q_rollup 1.15 → 1.91 s
    // warm, taskTime 2.8 → 4.5 s); the flat join chain stands. At true
    // 100 TB the trade reverses only if hop fan-in is huge — revisit with
    // measurements there.
    labels.foreach { l =>
      // same loader-counted broadcast as pushDown (same measured 250k
      // guard): the |start|-sized stream is never exchanged when the hop
      // slice is small, and the one over-guard hop keeps its SMJ
      val e0 = g.edges.where(col("label") === l).select("src", "dst").dropDuplicates("src", "dst")
      val e = if (g.labelRows(Seq(l)).exists(_ <= 250000L)) broadcast(e0) else e0
      cur = cur.join(e, cur("id") === e("src"))
        .select(col("dst").as("id"), col(valueCol))
    }
    cur.groupBy("id").agg(sum(col(valueCol)).as(valueCol))
  }

  /** Immediate dominators (fermor algo.clj `immediate-dominators`) via the
    * iterative Cooper–Harvey–Kennedy algorithm on reverse-postorder.
    * Dominance is DFS-order-sequential, so like the reference this runs
    * single-node — on a CFG-scale subgraph extracted distributedly. Returns
    * (id, idom); the entry maps to itself. */
  /** Edges reachable from `entry` — the distributed extraction step in front
    * of every driver-side DFS analysis (dominators, loop forest): a semi-join
    * BFS over a deduped edge table, so what reaches the driver is only the
    * entry's flow subgraph, not the whole 100 TB edge set. */
  private val reachCache =
    scala.collection.concurrent.TrieMap[(SparkSession, Long, Int), DataFrame]()

  def reachableEdges(entry: Long, edges: DataFrame, maxIter: Int = 50): DataFrame =
    if (!graft.graph.Tpch.shareScans) reachableEdgesImpl(entry, edges, maxIter)
    else {
      // under the multi-query scan-sharing regime (Bench/Verify), several
      // queries analyze the same flow subgraph (dominators, dominator-depth,
      // loop forest) — extract it once per (session, entry, semantic plan);
      // session-keyed so a dead session's plans are never resurrected
      val key = (edges.sparkSession, entry, edges.queryExecution.analyzed.semanticHash())
      if (reachCache.size > 64) reachCache.clear() // bound: never pin plans forever
      reachCache.getOrElseUpdate(key,
        reachableEdgesImpl(entry, edges, maxIter).localCheckpoint(eager = false))
    }

  private def reachableEdgesImpl(entry: Long, edges: DataFrame, maxIter: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // no upfront dedup of the (possibly huge) edge table: duplicate edges
    // only produce duplicate frontier ids, which each round's
    // dropDuplicates removes; the much smaller OUTPUT is deduped. The
    // narrow projection IS materialized once so the rounds don't re-scan
    // the source plan.
    val e = edges.select("src", "dst").localCheckpoint(eager = false)
    var visited = Seq(entry).toDF("id").localCheckpoint(eager = false)
    var frontier = visited
    var done = false
    var i = 0
    while (!done && i < maxIter) {
      // lazy checkpoint + count = one action per round: count scans every
      // partition, completing the checkpoint (an isEmpty probe would only
      // materialize the partition its limit-1 touches — never pair one
      // with a lazy checkpoint)
      val next = e.join(frontier.select(col("id").as("src")), Seq("src"), "left_semi")
        .select(col("dst").as("id")).dropDuplicates("id")
        .join(visited, Seq("id"), "left_anti")
        .localCheckpoint(eager = false)
      if (next.count() == 0L) done = true
      else { visited = visited.unionByName(next).localCheckpoint(eager = false); frontier = next }
      i += 1
    }
    if (done)
      // an edge is in the flow subgraph iff its src is reachable (its dst
      // then is too, by following that very edge)
      e.join(visited.select(col("id").as("src")), Seq("src"), "left_semi")
        .dropDuplicates("src", "dst")
    else {
      // Deep subgraph (diameter > maxIter): per-hop BFS rounds scale with
      // DEPTH, so switch to the depth-independent path — restrict to the
      // entry's weak component with alternating-star CC (O(log² n) rounds
      // however deep the graph is), guarded-collect that slice, and finish
      // directed reachability with a driver BFS. The weak component bounds
      // the reachable set from above, so the guard contract is unchanged:
      // a component too big to collect fails loudly, it never OOMs.
      val comp = ccAlternating(e)
      val cRow = comp.where(col("id") === entry).select("component").collect()
      val c = if (cRow.isEmpty) entry else cRow.head.getLong(0)
      val members = comp.where(col("component") === c).select(col("id").as("src"))
      val sub = e.join(members, Seq("src"), "left_semi").dropDuplicates("src", "dst")
        .localCheckpoint(eager = true)
      val n = sub.count()
      // guard matches collectReachable's documented 10M contract; the
      // adjacency below is primitive (LongMap[Array[Long]] ≈ 16 B/edge =
      // ~160 MB at the guard), and the rows stream partition-at-a-time via
      // toLocalIterator so no full boxed Row array ever materializes — the
      // two concerns (contract regression / driver OOM) are both closed
      if (n > 10000000L)
        throw new IllegalStateException(
          s"entry $entry sits in a weak component with $n edges and depth > $maxIter: " +
            "too deep for distributed BFS and too big to collect; restrict the " +
            "subgraph (edgeSubgraph/filter) before the flow analysis")
      val adjB = new scala.collection.mutable.LongMap[scala.collection.mutable.ArrayBuilder.ofLong]()
      val it = sub.select(col("src"), col("dst")).toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        adjB.getOrElseUpdate(row.getLong(0), new scala.collection.mutable.ArrayBuilder.ofLong) += row.getLong(1)
      }
      val adj = new scala.collection.mutable.LongMap[Array[Long]](adjB.size)
      adjB.foreach { case (k, b) => adj(k) = b.result() }
      val vis = scala.collection.mutable.HashSet[Long](entry)
      val stack = scala.collection.mutable.ArrayDeque[Long](entry)
      while (stack.nonEmpty) {
        val u = stack.removeLast()
        adj.getOrElse(u, Array.empty[Long]).foreach(v => if (vis.add(v)) stack += v)
      }
      sub.join(vis.toSeq.toDF("src"), Seq("src"), "left_semi")
    }
  }

  /** Weakly-connected components by the alternating large-star/small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14): converges in O(log² n) rounds regardless of graph
    * DIAMETER. This is the scale path where Pregel min-propagation — one
    * superstep per hop — takes 10⁵ rounds on a 10⁵-deep chain; here each
    * round is one groupBy + one keyed join per star phase. Component id is
    * the component's min vertex id (same contract as
    * [[connectedComponents]]); isolated vertices don't appear. */
  def ccAlternating(edges: DataFrame, maxRounds: Int = 200): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    def canon(df: DataFrame) = df
      .select(greatest(col("src"), col("dst")).as("hi"), least(col("src"), col("dst")).as("lo"))
      .where(col("hi") =!= col("lo")).dropDuplicates("hi", "lo")
    // cheap multiset signature for the convergence test; summed in 31-bit
    // space so ANSI mode cannot overflow (n·2³¹ ≪ 2⁶³)
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(pmod(xxhash64(col("hi"), col("lo")), lit(2147483647L)))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var e = canon(edges).localCheckpoint(eager = true)
    var s = sig(e)
    var stable = false
    var r = 0
    while (!stable && r < maxRounds) {
      // large-star: every neighbor v > u re-links to u's minimum neighbor
      // (or u itself) — preserves connectivity, pulls stars flat
      val nbrs = e.select(col("hi").as("u"), col("lo").as("v"))
        .unionAll(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = nbrs.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val ls = nbrs.join(mins, Seq("u")).where(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .where(col("hi") =!= col("lo")).dropDuplicates("hi", "lo")
      // small-star: each node's ≤-neighborhood all links to its minimum
      val mins2 = ls.groupBy("hi").agg(min("lo").as("m"))
      val ss = ls.join(mins2, Seq("hi")).where(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
        .unionAll(mins2.select(col("hi"), col("m").as("lo")))
        .where(col("hi") =!= col("lo")).dropDuplicates("hi", "lo")
        .localCheckpoint(eager = true)
      val s2 = sig(ss)
      // signature match is only a fast PRE-check — confirm the fixpoint
      // exactly before stopping. Both sides are deduplicated canonical edge
      // sets with equal counts when the signatures match, so one-sided
      // exceptAll emptiness proves set equality; a signature collision can
      // therefore never terminate the loop on an unconverged forest. Costs
      // one extra job only on rounds whose signatures agree (≈ once, at
      // convergence). Both inputs are localCheckpointed, so exceptAll sees
      // distinct plans (Catalyst rejects except over a re-projection of the
      // same plan).
      stable = s2 == s && ss.exceptAll(e).isEmpty
      s = s2
      e = ss
      r += 1
    }
    // unconverged = wrong components, and the callers compose (Borůvka
    // contracts on this map; SCC's deep-path fallback slices by it) — the
    // loud-failure standard every sibling fixpoint here follows. O(log² n)
    // convergence makes 200 rounds astronomically safe; hitting the bound
    // means something is broken, not slow.
    if (!stable)
      throw new IllegalStateException(
        s"ccAlternating did not converge within $maxRounds rounds")
    // converged star forest: every edge points (member → component min);
    // roots map to themselves.
    e.select(col("hi").as("id"), col("lo").as("component"))
      .unionByName(e.select(col("lo").as("id"), col("lo").as("component")))
      .groupBy("id").agg(min("component").as("component"))
  }

  private val idomCache =
    scala.collection.concurrent.TrieMap[(SparkSession, Long, Int), scala.collection.mutable.HashMap[Long, Long]]()

  /** Driver-side collect of the entry's reachable flow subgraph, GUARDED: a
    * loud failure beats an OOM'd driver. The DFS-order analyses this feeds
    * (dominators, numberings, loop forest, intervals, frontiers) are
    * CFG-scale by nature; an entry whose flow subgraph exceeds `maxEdges`
    * is the caller using a compiler analysis on a fact table — fail with
    * the actionable message rather than collapse. */
  private[graft] def collectReachable(entry: Long, edges: DataFrame,
      maxEdges: Long = 10000000L): Array[(Long, Long)] = {
    val e = reachableEdges(entry, edges)
    val n = e.count()
    // the array index is an Int, so Int.MaxValue bounds the collect even if
    // a caller raises maxEdges past it — fail loudly, never wrap n.toInt
    val lim = math.min(maxEdges, Int.MaxValue.toLong)
    if (n > lim)
      throw new IllegalStateException(
        s"flow subgraph of entry $entry has $n edges > maxEdges=$lim: " +
          "driver-side DFS analyses are CFG-scale; restrict the entry's subgraph " +
          "(edgeSubgraph/filter) or raise maxEdges explicitly")
    // stream partition-at-a-time (like the deep-CC fallback): peak driver
    // footprint is the result array (~40 B/edge boxed = ~400 MB at the
    // guard) plus ONE partition's rows — never a second full copy of the
    // edge set the way Dataset.collect's decode path holds. The long casts
    // keep getLong safe for int-typed edge columns (the encoder the old
    // Dataset.collect path used did this upcast implicitly).
    val out = new Array[(Long, Long)](n.toInt)
    val it = e.select(col("src").cast("long"), col("dst").cast("long")).toLocalIterator()
    var i = 0
    while (it.hasNext) { val r = it.next(); out(i) = (r.getLong(0), r.getLong(1)); i += 1 }
    out
  }

  def immediateDominators(entry: Long, edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // parallelize, not toDF-on-local-Seq: a LocalRelation encodes every row
    // single-threaded on the driver, which at millions of CFG blocks cost
    // more than the CHK solve itself (the 10× sweep's whole q_dominators
    // overhead); RDD partitions encode in parallel across the executors
    val arr = idomMap(entry, edges).toArray
    spark.sparkContext
      .parallelize(arr.toIndexedSeq, math.min(32, 1 + arr.length / 65536))
      .toDF("id", "idom")
  }

  /** The idom map behind [[immediateDominators]] / [[dominatorDepth]] —
    * memoized per (session, entry, plan) under scan sharing, because the
    * dominator-tree queries (idom, depth) share the identical CHK solve. */
  private def idomMap(entry: Long, edges: DataFrame): scala.collection.mutable.HashMap[Long, Long] = {
    val spark = edges.sparkSession
    import spark.implicits._
    def solve() = idomLocal(entry, collectReachable(entry, edges))
    if (!graft.graph.Tpch.shareScans) solve()
    else {
      if (idomCache.size > 64) idomCache.clear() // bound: never pin plans forever
      idomCache.getOrElseUpdate(
        (spark, entry, edges.queryExecution.analyzed.semanticHash()), solve())
    }
  }

  /** Cooper–Harvey–Kennedy on reverse postorder, driver arrays. `es` must
    * already be the entry's reachable subgraph. */
  private def idomLocal(entry: Long, es: Array[(Long, Long)]): scala.collection.mutable.HashMap[Long, Long] = {
    val succ = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    // iterative DFS from entry → reverse postorder (explicit stack: safe on
    // deep chain graphs where recursion would blow the JVM stack)
    val rpoList = scala.collection.mutable.ArrayBuffer[Long]()
    val seen = scala.collection.mutable.HashSet[Long](entry)
    val stack = scala.collection.mutable.Stack[(Long, Iterator[Long])](
      (entry, succ.getOrElse(entry, Array.empty[Long]).iterator))
    while (stack.nonEmpty) {
      val (u, it) = stack.top
      if (it.hasNext) {
        val v = it.next()
        if (!seen(v)) { seen += v; stack.push((v, succ.getOrElse(v, Array.empty[Long]).iterator)) }
      } else { stack.pop(); rpoList += u }
    }
    val rpo = rpoList.reverse.toArray // entry first
    val n = rpo.length
    // index-based CHK from here: the fixpoint's intersect loop does two map
    // lookups per dominator-chain step, and boxed-Long HashMaps made it the
    // entire cost at millions of edges (the 10× sweep read 15× wall for 10×
    // edges); remap vertices to 0..n-1 once and run the loops on int arrays
    val ix = new scala.collection.mutable.HashMap[Long, Int]()
    ix.sizeHint(n)
    var i = 0
    while (i < n) { ix(rpo(i)) = i; i += 1 } // ix == rpo position (entry = 0)
    // CSR-style predecessor lists over reachable endpoints only
    val predCnt = new Array[Int](n)
    es.foreach { case (s, d) =>
      if (ix.contains(s)) ix.get(d).foreach(di => predCnt(di) += 1)
    }
    val predOff = new Array[Int](n + 1)
    i = 0
    while (i < n) { predOff(i + 1) = predOff(i) + predCnt(i); i += 1 }
    val predArr = new Array[Int](predOff(n))
    val fill = java.util.Arrays.copyOf(predOff, n)
    es.foreach { case (s, d) =>
      val si = ix.getOrElse(s, -1)
      if (si >= 0) ix.get(d).foreach { di => predArr(fill(di)) = si; fill(di) += 1 }
    }
    val idom = Array.fill(n)(-1)
    idom(0) = 0
    def intersect(a: Int, b: Int): Int = {
      var f1 = a; var f2 = b
      while (f1 != f2) {
        while (f1 > f2) f1 = idom(f1)
        while (f2 > f1) f2 = idom(f2)
      }
      f1
    }
    var changed = true
    while (changed) {
      changed = false
      var v = 1
      while (v < n) {
        var ni = -1
        var p = predOff(v)
        while (p < predOff(v + 1)) {
          val u = predArr(p)
          if (idom(u) >= 0) ni = if (ni < 0) u else intersect(ni, u)
          p += 1
        }
        if (ni >= 0 && idom(v) != ni) { idom(v) = ni; changed = true }
        v += 1
      }
    }
    val out = scala.collection.mutable.HashMap[Long, Long]()
    out.sizeHint(n)
    i = 0
    while (i < n) { if (idom(i) >= 0) out(rpo(i)) = rpo(idom(i)); i += 1 }
    out
  }

  /** Depth of each vertex in the dominator tree (fermor `dominator-depth`). */
  def dominatorDepth(entry: Long, edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val idom = idomMap(entry, edges)
    // memoized depths via an ITERATIVE chain walk: recursion here would blow
    // the JVM stack on a deep linear CFG (10⁵-block chain) before the memo
    // could help
    val memo = scala.collection.mutable.HashMap[Long, Int](entry -> 0)
    def depth(v0: Long): Int = memo.getOrElse(v0, {
      val chain = scala.collection.mutable.ArrayBuffer[Long]()
      var v = v0
      while (!memo.contains(v)) { chain += v; v = idom(v) }
      var d = memo(v)
      var j = chain.length - 1
      while (j >= 0) { d += 1; memo(chain(j)) = d; j -= 1 }
      memo(v0)
    })
    val arr = idom.keysIterator.map(v => (v, depth(v))).toArray
    spark.sparkContext // parallel row encode — see immediateDominators
      .parallelize(arr.toIndexedSeq, math.min(32, 1 + arr.length / 65536))
      .toDF("id", "depth")
  }

  /** Post-order / reverse-post-order DFS numbering from an entry (fermor
    * algo.clj `post-order-numbering` / `reverse-post-order-numbering`).
    * Successor order is sorted by id for determinism. Driver-side like the
    * reference (DFS order is inherently sequential). */
  def postOrderNumbering(entry: Long, edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = collectReachable(entry, edges)
    val succ = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.sorted }
    val order = scala.collection.mutable.ArrayBuffer[Long]()
    val seen = scala.collection.mutable.HashSet[Long]()
    val stack = scala.collection.mutable.Stack[(Long, Iterator[Long])]()
    seen += entry; stack.push((entry, succ.getOrElse(entry, Array.empty[Long]).iterator))
    while (stack.nonEmpty) {
      val (u, it) = stack.top
      if (it.hasNext) {
        val v = it.next()
        if (!seen(v)) { seen += v; stack.push((v, succ.getOrElse(v, Array.empty[Long]).iterator)) }
      } else { stack.pop(); order += u }
    }
    order.toSeq.zipWithIndex.map { case (v, i) => (v, i, order.length - 1 - i) }
      .toDF("id", "post_order", "reverse_post_order")
  }

  /** Shared DFS for the sequential walk-reduce family: (preorder, postorder)
    * vertex sequences from `entry`, successors id-sorted like
    * [[postOrderNumbering]] so every walk order is deterministic. */
  private def dfsOrders(entry: Long, edges: DataFrame): (Array[Long], Array[Long]) = {
    val es = collectReachable(entry, edges)
    val succ = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.sorted }
    val pre = scala.collection.mutable.ArrayBuffer[Long]()
    val post = scala.collection.mutable.ArrayBuffer[Long]()
    val seen = scala.collection.mutable.HashSet[Long]()
    val stack = scala.collection.mutable.Stack[(Long, Iterator[Long])]()
    seen += entry; pre += entry
    stack.push((entry, succ.getOrElse(entry, Array.empty[Long]).iterator))
    while (stack.nonEmpty) {
      val (u, it) = stack.top
      if (it.hasNext) {
        val v = it.next()
        if (!seen(v)) {
          seen += v; pre += v
          stack.push((v, succ.getOrElse(v, Array.empty[Long]).iterator))
        }
      } else { stack.pop(); post += u }
    }
    (pre.toArray, post.toArray)
  }

  private def foldWalk[S](order: Array[Long], state: S, f: (S, Long) => S,
      done: S => Boolean): S = {
    var s = state
    var i = 0
    while (i < order.length && !done(s)) { s = f(s, order(i)); i += 1 }
    s
  }

  /** fermor algo.clj:225 `prewalk-reduce`: fold an arbitrary (possibly
    * non-associative) accumulator over the graph in DFS PREORDER from
    * `entry`. `done` plays the role of Clojure's `reduced` early exit —
    * checked before each step, so a satisfied accumulator stops the walk.
    *
    * This is the literal sequential contract; when `f` IS associative the
    * distributed re-expressions ([[topoLevels]]/[[pushDown]]/[[rollup]])
    * are the forms that survive 100 TB — this API exists for the reference's
    * order-sensitive accumulators, which are CFG-scale by nature (the same
    * driver-side regime as [[postOrderNumbering]], same collect guard). */
  def prewalkReduce[S](entry: Long, edges: DataFrame, state: S,
      done: S => Boolean = (_: S) => false)(f: (S, Long) => S): S =
    foldWalk(dfsOrders(entry, edges)._1, state, f, done)

  /** fermor algo.clj:204 `postwalk-reduce`: fold in DFS POSTORDER (children
    * before parents). See [[prewalkReduce]] for the scale adjudication. */
  def postwalkReduce[S](entry: Long, edges: DataFrame, state: S,
      done: S => Boolean = (_: S) => false)(f: (S, Long) => S): S =
    foldWalk(dfsOrders(entry, edges)._2, state, f, done)

  /** fermor algo.clj:246 `reverse-postwalk-reduce`: fold in reverse
    * postorder (the topological-ish "RPO" order dataflow analyses use). */
  def reversePostwalkReduce[S](entry: Long, edges: DataFrame, state: S,
      done: S => Boolean = (_: S) => false)(f: (S, Long) => S): S =
    foldWalk(dfsOrders(entry, edges)._2.reverse, state, f, done)

  /** Natural-loop forest (fermor algo.clj `loop-tree` / `loop-info` /
    * `intervals`): back edges are edges u→h where h dominates u; each loop is
    * the union of natural loops sharing a header. Returns one row per
    * (member, header) plus the header's nesting depth. */
  def loopForest(entry: Long, edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = collectReachable(entry, edges)
    val idom = idomLocal(entry, es)
    def dominates(h: Long, v0: Long): Boolean = {
      var v = v0
      while (v != h && v != entry) v = idom(v)
      v == h
    }
    val preds = es.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).distinct }
    val backEdges = es.filter { case (u, h) => dominates(h, u) }
    // natural loop of back edge u->h: h plus all vertices reaching u without
    // passing through h
    val loops = scala.collection.mutable.HashMap[Long, Set[Long]]().withDefaultValue(Set.empty)
    backEdges.foreach { case (u, h) =>
      val members = scala.collection.mutable.HashSet(h, u)
      val work = scala.collection.mutable.Stack[Long]()
      if (u != h) work.push(u)
      while (work.nonEmpty) {
        val v = work.pop()
        preds.getOrElse(v, Array.empty[Long]).foreach { p =>
          if (!members(p)) { members += p; work.push(p) }
        }
      }
      loops(h) = loops(h) ++ members
    }
    val headers = loops.keySet
    def depth(h: Long): Int =
      headers.count(h2 => h2 != h && loops(h2).contains(h))
    loops.toSeq.flatMap { case (h, ms) =>
      val d = depth(h)
      ms.toSeq.map(m => (m, h, d))
    }.toDF("id", "header", "header_depth")
  }

  /** Betweenness centrality by shortest-path enumeration (the TinkerPop
    * recipe the reference mirrors in gremlin_examples_test.clj): enumerate
    * all simple paths up to `maxDepth` from every vertex via [[graft.graph.Descend]],
    * keep the shortest per (origin, destination) pair, and count how often
    * each vertex appears on them. Exact for diameters <= maxDepth; as the
    * reference notes, "not large graph friendly" — path enumeration is
    * exponential in dense graphs — but every step here is a distributed
    * join/window, so moderate graphs parallelize. */
  def betweennessByEnumeration(g: PropertyGraph, maxDepth: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val paths = graft.graph.Descend
      .run(g, g.vertices.select("id"), Nil, forward = true, maxDepth = maxDepth)
      .select(element_at(col("path"), 1).as("o"), col("id").as("d"),
        col("depth"), col("path"))
    val w = Window.partitionBy("o", "d")
    paths.withColumn("m", min(col("depth")).over(w))
      .where(col("depth") === col("m"))
      .select(explode(col("path")).as("id"))
      .groupBy("id").agg(count(lit(1)).as("betweenness"))
  }

  /** Betweenness centrality via distributed Brandes — the 100 TB form of
    * [[betweennessByEnumeration]] (which is the TinkerPop path-enumeration
    * recipe: exponential in dense graphs). Standard Brandes (2001): for each
    * source s, a level-synchronous BFS computes σ(s,v) = #shortest s→v paths
    * (sum of predecessor σ per level — one keyed agg per level), then a
    * backward sweep accumulates pair dependencies
    * δ(s,v) = Σ_{w: succ on a shortest path} σ(s,v)/σ(s,w) · (1 + δ(s,w)).
    * Betweenness(v) = Σ_{s≠v} δ(s,v) (endpoints excluded). All sources run
    * TOGETHER: rows are (s, v, …), so each level is one join keyed by vertex
    * — the per-source loop of the sequential algorithm becomes row
    * parallelism. `sources` bounds the work (pass a sample for the standard
    * approximation; pass all vertices for exact values). */
  def brandesBetweenness(edges: DataFrame, sources: DataFrame, directed: Boolean = false,
      maxIter: Int = 100)(implicit spark: SparkSession): DataFrame = {
    val e0 = edges.select("src", "dst").dropDuplicates("src", "dst")
    val e = (if (directed) e0
             else e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
               .dropDuplicates("src", "dst"))
      .localCheckpoint(eager = false)
    // forward phase: per-level (s, v, sigma); keep each level for the sweep.
    // Guarded broadcasts throughout (guide §3.1; the bfsRelaxImpl idiom):
    // every per-level join would otherwise SMJ against the stats-blind
    // checkpoints, exchanging the FULL edge frame per level; level sizes
    // come free from the drain-probe counts, so measured-small frontiers /
    // visited sets / delta levels broadcast and e stays unshuffled. Join
    // STRATEGY only — the recurrence, its join keys, and the aggregation
    // are byte-for-byte the ones above; past the guard every join falls
    // back to the shuffle plan.
    val bcastRows = 1000000L
    def sat(a: Long, b: Long): Long =
      if (a == Long.MaxValue || b > Long.MaxValue - a) Long.MaxValue else a + b
    var frontier = sources.select(col(sources.columns.head).as("s"))
      .dropDuplicates("s").withColumn("v", col("s")).withColumn("sigma", lit(1L))
      .localCheckpoint(eager = false)
    var visited = frontier.select("s", "v").localCheckpoint(eager = false)
    val n0 = graft.plans.Scale.oneWaveLimit(frontier)(
      frontier.limit((bcastRows + 1).toInt).count())
    var frontierRows = if (n0 <= bcastRows) n0 else Long.MaxValue
    var visitedRows = frontierRows
    val levels = scala.collection.mutable.ArrayBuffer[(DataFrame, Long)]((frontier, frontierRows))
    var done = false
    var d = 0
    while (!done && d < maxIter) {
      val fB = if (frontierRows <= bcastRows) broadcast(frontier) else frontier
      val vB = if (visitedRows <= bcastRows) broadcast(visited) else visited
      val next = fB.join(e, fB("v") === e("src"))
        .groupBy(col("s"), col("dst").as("v2")).agg(sum(col("sigma")).as("sigma"))
        .select(col("s"), col("v2").as("v"), col("sigma"))
        .join(vB, Seq("s", "v"), "left_anti")
        .localCheckpoint(eager = false) // count below completes it — one job
      val n = next.count()
      if (n == 0L) done = true
      else {
        frontierRows = if (n <= bcastRows) n else Long.MaxValue
        levels += ((next, frontierRows))
        visitedRows = sat(visitedRows, frontierRows)
        visited = visited.unionByName(next.select("s", "v")).localCheckpoint(eager = false)
        frontier = next
      }
      d += 1
    }
    // backward sweep, deepest level first: δ at the deepest level is 0.
    // `delta` carries (s, v, sigma, delta) — the σ of level l+1 is needed as
    // the divisor when level l pulls its dependency contributions.
    var delta = levels.last._1.withColumn("delta", lit(0.0)).localCheckpoint(eager = false)
    var deltaRows = levels.last._2
    var acc = delta.select("s", "v", "delta")
    var l = levels.length - 2
    while (l >= 0) {
      val (cur, curRows) = levels(l)
      val curB = if (curRows <= bcastRows) broadcast(cur) else cur
      val deltaSel = delta.select(col("s"), col("v").as("w"),
        col("sigma").as("sw"), col("delta").as("dw"))
      val dB = if (deltaRows <= bcastRows) broadcast(deltaSel) else deltaSel
      val contrib = curB.join(e, curB("v") === e("src"))
        .select(col("s"), col("v"), col("sigma"), col("dst").as("w"))
        .join(dB, Seq("s", "w"))
        .groupBy("s", "v")
        .agg(sum(col("sigma").cast("double") / col("sw") * (lit(1.0) + col("dw"))).as("delta"))
      val cB = if (curRows <= bcastRows) broadcast(contrib) else contrib
      val lvlDelta = cur.join(cB, Seq("s", "v"), "left")
        .select(col("s"), col("v"), col("sigma"), coalesce(col("delta"), lit(0.0)).as("delta"))
        .localCheckpoint(eager = true)
      delta = lvlDelta
      deltaRows = curRows
      acc = acc.unionByName(lvlDelta.select("s", "v", "delta"))
      l -= 1
    }
    acc.where(col("s") =!= col("v"))
      .groupBy(col("v").as("id")).agg(sum(col("delta")).as("betweenness"))
  }

  /** Closeness/farness centrality (the remaining member of the centrality
    * family next to degree / betweenness / pagerank): one multi-source
    * tagged BFS — rows (s, v, d) for every source simultaneously, each level
    * one keyed join — then farness(s) = Σ_v d(s,v), n_reach(s), and
    * eccentricity(s) = max_v d(s,v) by a single agg on the SOURCE tag.
    * Integer-exact, so callers derive closeness = 1/farness or the
    * normalized variants without the engine baking in a float convention
    * (and max eccentricity over all sources = the graph diameter).
    * `sources` bounds the work (sample for approximation, all for exact). */
  def closenessCentrality(edges: DataFrame, sources: DataFrame, directed: Boolean = false,
      maxIter: Int = 100, localMaxEdges: Long = 200000L)(implicit spark: SparkSession): DataFrame =
    taggedBfs(edges, sources, directed, maxIter, localMaxEdges)
      .groupBy(col("s").as("id"))
      .agg((count(lit(1)) - 1).as("n_reach"), sum(col("d")).as("farness"),
        max(col("d")).as("eccentricity"))

  /** The ONE multi-source tagged delta-BFS behind [[closenessCentrality]]
    * and [[harmonicCentrality]]: rows (s, v, d) for every source
    * simultaneously (self at d=0 included); per level one frontier⋈edges
    * join + (s,v) dedup + anti-join vs visited — work tracks the frontier,
    * never |V|². Fails LOUDLY if `maxIter` rounds leave a non-empty
    * frontier: a silent truncation would undercount every downstream sum. */
  private def taggedBfs(edges: DataFrame, sources: DataFrame, directed: Boolean,
      maxIter: Int, localMaxEdges: Long = 200000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e0 = edges.select("src", "dst").dropDuplicates("src", "dst")
    val eRaw = if (directed) e0
      else e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
        .dropDuplicates("src", "dst")
    // guarded LOCAL replay (the maximalMatching convention): multi-source
    // BFS is |sources|·O(E) driver work — trivially below the per-round
    // scheduling floor for small graphs (measured at sf0.1: q_harmonic
    // 1.8 s warm -> the scan cost; distances are unique facts, so the
    // replay is bit-identical by construction, parity-spec'd)
    // a NULL source identifies no vertex: dropped in BOTH paths (the
    // distributed frontier would carry a (null, null, 0) row that joins
    // nothing; the local replay would NPE unboxing it — parity-spec'd)
    val srcCol = col(sources.columns.head)
    // probe + collect fused into one action per frame (collectAtMost); the
    // source guard now counts DISTINCT non-null sources — the quantity the
    // replay's work actually scales with (the raw row count only bounded it
    // from above), and both regimes stay bit-identical either way
    val esOpt = collectPairsAtMost(
      eRaw.select(col("src").cast("long"), col("dst").cast("long")), localMaxEdges)
    val srcsOpt = if (esOpt.isEmpty) None
      else collectLongsAtMost(
        sources.where(srcCol.isNotNull).select(srcCol.cast("long")).distinct(), 512L)
    if (esOpt.isDefined && srcsOpt.isDefined) {
      val es = esOpt.get
      val srcs = srcsOpt.get
      val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      srcs.foreach { s =>
        val dist = scala.collection.mutable.HashMap[Long, Long](s -> 0L)
        var frontier: Array[Long] = Array(s)
        var d = 0L
        while (frontier.nonEmpty) {
          d += 1
          if (d > maxIter)
            throw new IllegalStateException(
              s"taggedBfs: frontier still non-empty after maxIter=$maxIter rounds — raise maxIter")
          frontier = frontier.flatMap(v => adj.getOrElse(v, Array.empty[Long]))
            .distinct.filterNot(dist.contains)
          frontier.foreach(v => dist(v) = d)
        }
        dist.foreach { case (v, dd) => out += ((s, v, dd)) }
      }
      return spark.createDataset(out.toSeq).toDF("s", "v", "d")
    }
    val e = eRaw.localCheckpoint(eager = false)
    var frontier = sources.where(srcCol.isNotNull)
      .select(srcCol.as("s")).dropDuplicates("s")
      .withColumn("v", col("s")).withColumn("d", lit(0L))
      .localCheckpoint(eager = false)
    var acc = frontier
    var visited = frontier.select("s", "v").localCheckpoint(eager = false)
    var done = false
    var i = 0
    while (!done && i < maxIter) {
      val next = frontier.join(e, frontier("v") === e("src"))
        .select(col("s"), col("dst").as("v")).dropDuplicates("s", "v")
        .join(visited, Seq("s", "v"), "left_anti")
        .withColumn("d", lit(i + 1L))
        .localCheckpoint(eager = false) // count below completes it — one job
      if (next.count() == 0L) done = true
      else {
        acc = acc.unionByName(next)
        visited = visited.unionByName(next.select("s", "v")).localCheckpoint(eager = false)
        frontier = next
      }
      i += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"taggedBfs: frontier still non-empty after maxIter=$maxIter rounds — raise maxIter")
    acc
  }

  /** Interval partition of a flow graph (fermor algo.clj `intervals`; the
    * Allen/Cocke interval analysis from Offner's notes p44): each interval
    * I(h) grows from its header h by absorbing nodes whose predecessors all
    * lie inside; un-absorbed successors seed new headers. Driver-side on
    * the distributedly-extracted reachable subgraph (CFG-scale, like
    * dominators); deterministic via sorted worklists. Returns
    * (id, interval_header). */
  def intervals(entry: Long, edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = collectReachable(entry, edges)
    val succ = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.sorted }
    val preds = es.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).distinct }
    val assigned = scala.collection.mutable.HashMap[Long, Long]()
    val headers = scala.collection.mutable.SortedSet[Long](entry)
    val doneHeaders = scala.collection.mutable.HashSet[Long]()
    while (headers.nonEmpty) {
      val h = headers.head; headers.remove(h); doneHeaders += h
      if (!assigned.contains(h)) {
        val interval = scala.collection.mutable.SortedSet[Long](h)
        assigned(h) = h
        var grew = true
        while (grew) {
          grew = false
          val candidates = interval.toSeq
            .flatMap(v => succ.getOrElse(v, Array.empty[Long]))
            .distinct.sorted
            .filterNot(assigned.contains)
          candidates.foreach { v =>
            if (preds.getOrElse(v, Array.empty[Long]).forall(interval.contains)) {
              interval += v; assigned(v) = h; grew = true
            }
          }
        }
        // unabsorbed successors of the interval become new headers
        interval.toSeq.flatMap(v => succ.getOrElse(v, Array.empty[Long]))
          .filterNot(assigned.contains)
          .foreach(v => if (!doneHeaders(v)) headers += v)
      }
    }
    assigned.toSeq.toDF("id", "interval_header")
  }

  /** Vertices lying on some path from `from` to `to` (fermor algo.clj
    * `non-loop-vertices-between`): forward-reachable(from) ∩
    * backward-reachable(to) — two distributed BFS passes, no driver walk. */
  def verticesBetween(vertices: DataFrame, edges: DataFrame, from: DataFrame, to: DataFrame,
      fwdMaxIter: Int = 1000, bwdMaxIter: Int = 1000)(
      implicit spark: SparkSession): DataFrame = {
    // the two BFS passes are independent job sequences; submitting them from
    // two threads lets their per-round jobs interleave on the cluster, so
    // wall time is ~max of the passes instead of their sum. Callers that know
    // the graph diameter pass it as the iteration bound: each saved round is
    // a saved frontier materialization (the dominant cost on low-diameter
    // graphs, where the last rounds run only to discover emptiness).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    // both passes go through the memoizing bfsDistances: under scan sharing
    // a pass whose (edges, sources, direction) another query already ran
    // (e.g. the backward pass = the sssp distance table) is free
    val fwdF = Future { bfsDistances(vertices, edges, from, maxIter = fwdMaxIter) }
    val bwdF = Future { bfsDistances(vertices, edges, to, reverse = true, maxIter = bwdMaxIter) }
    val fwd = Await.result(fwdF, Duration.Inf)
    val bwd = Await.result(bwdF, Duration.Inf)
    fwd.select("id").join(bwd.select("id"), "id")
  }

  /** Articulation points of the undirected view of the graph (fermor
    * algo.clj `articulation-points`): iterative Tarjan low-link.
    *
    * Tarjan low-link is DFS-order-sequential, so SOME single-threaded walk is
    * unavoidable; what must not happen at 100 TB is an unguarded collect of
    * the whole edge set to the driver. Guard: if the edge count exceeds
    * `localMaxEdges`, fall back to the distributed per-component plan —
    * connected components first (Pregel), then each component's edge list is
    * walked WITHIN an executor via flatMapGroups. Biconnectivity never
    * crosses a connected component, so the partition is exact; the collect
    * unit shrinks from "the graph" to "the largest component". */
  def articulationPoints(edges: DataFrame, localMaxEdges: Long = 3000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select("src", "dst").localCheckpoint(eager = false)
    if (e.count() > localMaxEdges) {
      implicit val sp: SparkSession = spark
      return perComponent(e)(es => articulationLocal(buildAdj(es)).iterator).toDF("id")
    }
    val adj = buildAdj(e.as[(Long, Long)].collect())
    articulationLocal(adj).toDF("id")
  }

  /** Undirected adjacency (dedup + symmetrize) from an edge list. */
  /** Driver-side mirrors of the Column-level hash priorities: identical
    * md5-hex + zero-padded-id strings, so a guarded local replay of a
    * hash-priority round loop (MIS / JP coloring / matching) produces the
    * BIT-IDENTICAL result of the distributed loop — the answer is a pure
    * fact of the graph either way, and the parity specs compare the two
    * paths directly. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
  private def pad20(id: Long): String = {
    val s = id.toString
    if (s.length >= 20) s else "0" * (20 - s.length) + s
  }

  /** Int-indexed symmetrized deduped adjacency from RAW directed pairs,
    * built in one driver pass — the guarded local replays collect the
    * pre-distinct pair stream precisely so the distributed
    * symmetrize+distinct SHUFFLE (and its checkpoint materialization)
    * never runs; the dedup that shuffle performed happens here, per
    * adjacency list. Int indices keep the round loops on primitive
    * arrays instead of Long-keyed hash lookups. */
  private def indexedAdj(arr: Array[(Long, Long)]): (Array[Long], Array[Array[Int]]) = {
    val idx = scala.collection.mutable.HashMap[Long, Int]()
    val ids = scala.collection.mutable.ArrayBuffer[Long]()
    def ix(v: Long): Int =
      idx.getOrElseUpdate(v, { ids += v; ids.length - 1 })
    val nbr = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Int]]()
    def grow(i: Int): Unit =
      while (nbr.length <= i) nbr += new scala.collection.mutable.ArrayBuffer[Int]
    arr.foreach { case (s, d) =>
      val a = ix(s); val b = ix(d)
      grow(math.max(a, b)); nbr(a) += b; nbr(b) += a
    }
    (ids.toArray, nbr.iterator.map(_.distinct.toArray).toArray)
  }

  private def buildAdj(es: Array[(Long, Long)]): Map[Long, Array[Long]] =
    (es ++ es.map(_.swap)).distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }

  private def articulationLocal(adj: Map[Long, Array[Long]]): Seq[Long] = {
    val disc = scala.collection.mutable.HashMap[Long, Int]()
    val low = scala.collection.mutable.HashMap[Long, Int]()
    val arts = scala.collection.mutable.HashSet[Long]()
    var timer = 0
    adj.keys.foreach { root =>
      if (!disc.contains(root)) {
        // iterative DFS: stack of (vertex, parent, child-iterator)
        var rootChildren = 0
        val stack = scala.collection.mutable.Stack[(Long, Long, Iterator[Long])]()
        disc(root) = timer; low(root) = timer; timer += 1
        stack.push((root, -1L, adj(root).iterator))
        while (stack.nonEmpty) {
          val (u, parent, it) = stack.top
          if (it.hasNext) {
            val v = it.next()
            if (!disc.contains(v)) {
              if (u == root) rootChildren += 1
              disc(v) = timer; low(v) = timer; timer += 1
              stack.push((v, u, adj(v).iterator))
            } else if (v != parent) low(u) = math.min(low(u), disc(v))
          } else {
            stack.pop()
            if (stack.nonEmpty) {
              val (p, _, _) = stack.top
              low(p) = math.min(low(p), low(u))
              if (p != root && low(u) >= disc(p)) arts += p
            }
          }
        }
        if (rootChildren >= 2) arts += root
      }
    }
    arts.toSeq.sorted
  }

  /** Partition the (undirected) edge set by connected component and run `f`
    * over each component's edge list INSIDE an executor — the distributed
    * harness for the DFS-sequential biconnectivity family. One Pregel CC run
    * + one keyed shuffle; per-task memory is bounded by the largest
    * component, not the graph. */
  private def perComponent[T: org.apache.spark.sql.Encoder](e: DataFrame)(
      f: Array[(Long, Long)] => Iterator[T])(implicit spark: SparkSession): org.apache.spark.sql.Dataset[T] = {
    import spark.implicits._
    val vs = e.select(col("src").as("id")).unionAll(e.select(col("dst").as("id")))
      .dropDuplicates("id")
    val comp = connectedComponents(vs, e)
    e.join(comp.withColumnRenamed("id", "src"), "src")
      .select(col("component"), col("src"), col("dst"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups((_, it) => f(it.map(t => (t._2, t._3)).toArray))
  }

  /** Biconnected components (fermor algo.clj `biconnected-components`):
    * edge-partition into maximal 2-connected subgraphs via Tarjan's edge
    * stack. Returns (src, dst, component) with component = min edge-endpoint
    * id in the component (deterministic labeling). Same guard + distributed
    * per-component fallback as [[articulationPoints]]. */
  def biconnectedComponents(edges: DataFrame, localMaxEdges: Long = 3000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select("src", "dst").localCheckpoint(eager = false)
    if (e.count() > localMaxEdges) {
      implicit val sp: SparkSession = spark
      return perComponent(e)(es => bccLocal(buildAdj(es)).iterator).toDF("src", "dst", "component")
    }
    bccLocal(buildAdj(e.as[(Long, Long)].collect())).toDF("src", "dst", "component")
  }

  /** Bridges (cut edges): tree edges with low(child) > disc(parent) —
    * removing one disconnects its component. (NOT derivable from
    * [[biconnectedComponents]] output: its min-endpoint component LABELS
    * collide across distinct single-edge BCCs sharing a cut vertex.) Same
    * guard + distributed per-component fallback as [[articulationPoints]];
    * input is treated as a SIMPLE undirected graph (duplicates and
    * orientations collapse). Returns canonical (lo, hi), independent of
    * the DFS tree. */
  def bridges(edges: DataFrame, localMaxEdges: Long = 3000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select("src", "dst").localCheckpoint(eager = false)
    if (e.count() > localMaxEdges) {
      implicit val sp: SparkSession = spark
      return perComponent(e)(es => bridgesLocal(buildAdj(es)).iterator).toDF("lo", "hi")
    }
    bridgesLocal(buildAdj(e.as[(Long, Long)].collect())).toDF("lo", "hi")
  }

  private def bridgesLocal(adj: Map[Long, Array[Long]]): Seq[(Long, Long)] = {
    val disc = scala.collection.mutable.HashMap[Long, Int]()
    val low = scala.collection.mutable.HashMap[Long, Int]()
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var timer = 0
    adj.keys.foreach { root =>
      if (!disc.contains(root)) {
        val stack = scala.collection.mutable.Stack[(Long, Long, Iterator[Long])]()
        disc(root) = timer; low(root) = timer; timer += 1
        stack.push((root, -1L, adj(root).iterator))
        while (stack.nonEmpty) {
          val (u, parent, it) = stack.top
          if (it.hasNext) {
            val v = it.next()
            if (!disc.contains(v)) {
              disc(v) = timer; low(v) = timer; timer += 1
              stack.push((v, u, adj(v).iterator))
            } else if (v != parent) low(u) = math.min(low(u), disc(v))
          } else {
            stack.pop()
            if (stack.nonEmpty) {
              val (p, _, _) = stack.top
              low(p) = math.min(low(p), low(u))
              if (low(u) > disc(p)) out += ((math.min(p, u), math.max(p, u)))
            }
          }
        }
      }
    }
    out.toSeq
  }

  private def bccLocal(adj: Map[Long, Array[Long]]): Seq[(Long, Long, Long)] = {
    val disc = scala.collection.mutable.HashMap[Long, Int]()
    val low = scala.collection.mutable.HashMap[Long, Int]()
    val estack = scala.collection.mutable.Stack[(Long, Long)]()
    val comps = scala.collection.mutable.ArrayBuffer[Seq[(Long, Long)]]()
    adj.keys.foreach { root =>
      if (!disc.contains(root)) {
        var timer0 = disc.size
        val stack = scala.collection.mutable.Stack[(Long, Long, Iterator[Long])]()
        disc(root) = timer0; low(root) = timer0
        stack.push((root, -1L, adj(root).iterator))
        while (stack.nonEmpty) {
          val (u, parent, it) = stack.top
          if (it.hasNext) {
            val v = it.next()
            if (!disc.contains(v)) {
              estack.push((u, v))
              val t = disc.size
              disc(v) = t; low(v) = t
              stack.push((v, u, adj(v).iterator))
            } else if (v != parent && disc(v) < disc(u)) {
              estack.push((u, v))
              low(u) = math.min(low(u), disc(v))
            }
          } else {
            stack.pop()
            if (stack.nonEmpty) {
              val (p, _, _) = stack.top
              low(p) = math.min(low(p), low(u))
              if (low(u) >= disc(p)) {
                // pop the component rooted at edge (p, u)
                val comp = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
                var done = false
                while (!done && estack.nonEmpty) {
                  val e = estack.pop()
                  comp += e
                  if (e == ((p, u))) done = true
                }
                if (comp.nonEmpty) comps += comp.toSeq
              }
            }
          }
        }
      }
    }
    comps.toSeq.flatMap { comp =>
      val label = comp.iterator.flatMap(e => Iterator(e._1, e._2)).min
      comp.map { case (s, d) => (s, d, label) }
    }
  }

  /** Dominance frontiers (fermor `dominance-frontiers`), from idom by the
    * standard Cytron walk. Returns (id, frontier_member) pairs. */
  def dominanceFrontiers(entry: Long, edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = collectReachable(entry, edges)
    val idomMap = idomLocal(entry, es)
    val preds = es.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).distinct }
    val df = scala.collection.mutable.HashMap[Long, Set[Long]]().withDefaultValue(Set.empty)
    idomMap.keys.foreach { b =>
      val ps = preds.getOrElse(b, Array.empty[Long])
      if (ps.length >= 2) ps.foreach { p =>
        var runner = p
        while (runner != idomMap(b)) {
          df(runner) = df(runner) + b
          runner = idomMap(runner)
        }
      }
    }
    df.toSeq.flatMap { case (v, fs) => fs.map(f => (v, f)) }.toDF("id", "frontier")
  }

  /** Harmonic centrality (the closeness-family variant that stays defined on
    * disconnected graphs — Boldi & Vigna 2014): Σ_{u≠v, d(v,u)<∞} 1/d(v,u),
    * here INTEGER-EXACT as Σ `scale div d` (scale divisible by every small
    * distance ⇒ the first few terms are exact reciprocals; floor division
    * everywhere, both engines bit-identical). Same multi-source tagged
    * delta-BFS as [[closenessCentrality]]: per round one frontier⋈edges
    * join + (s,v) dedup + anti-join vs visited — work tracks frontier size,
    * never |V|·|V|. Returns (id, n_reach, harmonic). */
  def harmonicCentrality(edges: DataFrame, sources: DataFrame, directed: Boolean = false,
      scale: Long = 840L, maxIter: Int = 100, localMaxEdges: Long = 200000L)(
      implicit spark: SparkSession): DataFrame = {
    val acc = taggedBfs(edges, sources, directed, maxIter, localMaxEdges)
    acc.where(col("d") > 0)
      .groupBy(col("s").as("id"))
      .agg(count(lit(1)).as("n_reach"),
        sum(expr(s"${scale}L div d")).as("harmonic"))
      .unionByName( // sources reaching nothing still get a row (harmonic 0)
        acc.groupBy(col("s").as("id")).agg(count(lit(1)).as("n"))
          .where(col("n") === 1).select(col("id"), lit(0L).as("n_reach"), lit(0L).as("harmonic")))
  }

  /** Deterministic maximal matching — the edge-side sibling of Luby MIS:
    * per round every surviving edge draws a HASH priority
    * (md5(round:lo:hi) + zero-padded endpoints = total order, no RNG — the
    * matching is a pure fact of the graph, identical across reruns,
    * partitionings, and engines); an edge wins when it holds the strict
    * minimum priority at BOTH endpoints, winners enter the matching, and
    * every edge touching a matched vertex leaves the pool. Maximality: a
    * non-empty pool always yields ≥1 winner (the globally-minimal edge wins
    * both endpoints), so the loop drains. Per round: one explode-to-endpoint
    * agg + one priority join + two semi/anti joins on the SHRINKING edge
    * set, O(log n) expected rounds, eager per-round checkpoints.
    * Returns matched edges as (lo, hi). */
  def maximalMatching(edges: DataFrame, maxRounds: Int = 64,
      localMaxEdges: Long = 2000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val canon0 = edges.select(least(col("src"), col("dst")).cast("long").as("lo"),
        greatest(col("src"), col("dst")).cast("long").as("hi"))
      .where(col("lo") =!= col("hi"))
    // guarded LOCAL replay of the identical hash-priority rounds —
    // bit-identical to the distributed loop (parity-spec'd), replacing
    // per-round scheduling latency below the guard; raw-pair guard skips
    // the distinct shuffle (dedup happens driver-side instead); probe and
    // collect are ONE action (collectPairsAtMost).
    //
    // Priorities stay PACKED LONGS, never strings: the priority string
    // hex(md5) ++ pad20(lo) ++ pad20(hi) orders exactly like the tuple
    // (unsigned 128-bit digest, lo, hi) for non-negative ids (hex compare
    // = unsigned byte compare of the digest; zero-padded decimals of equal
    // width compare numerically), and the string form allocated ~160 B ×
    // |pool| per round (~300 MB at the 2 M guard) — measured harmless in a
    // fresh JVM but 2.3 → 10 s inside the bench JVM, whose heap already
    // holds every cached table (full-GC churn). Negative ids — where the
    // pad20 form orders non-numerically — fall back to the distributed
    // loop, which defines the semantics.
    val pool0 = collectPairsAtMost(canon0, localMaxEdges)
      .filter(_.forall { case (l, h) => l >= 0L && h >= 0L })
    if (pool0.isDefined) {
      var pool = pool0.get.distinct
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var r = 0
      while (pool.nonEmpty) {
        r += 1
        if (r > maxRounds)
          throw new IllegalStateException(s"matching did not drain within $maxRounds rounds")
        val n = pool.length
        val lo = new Array[Long](n); val hi = new Array[Long](n)
        var i = 0
        while (i < n) { lo(i) = pool(i)._1; hi(i) = pool(i)._2; i += 1 }
        val d1 = new Array[Long](n); val d2 = new Array[Long](n)
        val round = r
        java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
          val b = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$round:${lo(i)}:${hi(i)}".getBytes("UTF-8"))
          var x1 = 0L; var x2 = 0L; var k = 0
          while (k < 8) { x1 = (x1 << 8) | (b(k) & 0xffL); k += 1 }
          while (k < 16) { x2 = (x2 << 8) | (b(k) & 0xffL); k += 1 }
          d1(i) = x1; d2(i) = x2
        }
        // strict total order: digest (unsigned), then lo, then hi — per-edge
        // unique because the pool is distinct, so argmin indices are exact
        def less(i: Int, j: Int): Boolean = {
          val c1 = java.lang.Long.compareUnsigned(d1(i), d1(j))
          if (c1 != 0) return c1 < 0
          val c2 = java.lang.Long.compareUnsigned(d2(i), d2(j))
          if (c2 != 0) return c2 < 0
          if (lo(i) != lo(j)) lo(i) < lo(j) else hi(i) < hi(j)
        }
        val minAt = scala.collection.mutable.HashMap[Long, Int]()
        i = 0
        while (i < n) {
          if (minAt.get(lo(i)).forall(j => less(i, j))) minAt(lo(i)) = i
          if (minAt.get(hi(i)).forall(j => less(i, j))) minAt(hi(i)) = i
          i += 1
        }
        val mv = scala.collection.mutable.HashSet[Long]()
        i = 0
        while (i < n) {
          if (minAt(lo(i)) == i && minAt(hi(i)) == i) {
            out += ((lo(i), hi(i))); mv += lo(i); mv += hi(i)
          }
          i += 1
        }
        pool = pool.filter { case (l, h) => !mv.contains(l) && !mv.contains(h) }
      }
      return out.toSeq.toDF("lo", "hi")
    }
    var e = canon0.dropDuplicates("lo", "hi").localCheckpoint(true)
    var matched = e.where(lit(false))
    var n = e.count()
    var r = 0
    while (n > 0) {
      r += 1
      if (r > maxRounds)
        throw new IllegalStateException(s"matching did not drain within $maxRounds rounds")
      val p = e.select(col("lo"), col("hi"),
        concat(md5(concat(lit(s"$r:"), col("lo").cast("string"), lit(":"), col("hi").cast("string"))),
          lpad(col("lo").cast("string"), 20, "0"),
          lpad(col("hi").cast("string"), 20, "0")).as("p")).localCheckpoint(true)
      val byV = p.select(col("lo").as("v"), col("p"))
        .unionAll(p.select(col("hi").as("v"), col("p")))
      val minV = byV.groupBy("v").agg(min("p").as("mn"))
      val win = p.join(minV.select(col("v").as("lo"), col("mn").as("mnLo")), Seq("lo"))
        .join(minV.select(col("v").as("hi"), col("mn").as("mnHi")), Seq("hi"))
        .where(col("p") === col("mnLo") && col("p") === col("mnHi"))
        .select("lo", "hi").localCheckpoint(true)
      matched = matched.unionByName(win)
      val mv = win.select(col("lo").as("v")).unionAll(win.select(col("hi").as("v"))).distinct()
      e = e.join(mv.select(col("v").as("lo")), Seq("lo"), "left_anti")
        .join(mv.select(col("v").as("hi")), Seq("hi"), "left_anti")
        .select("lo", "hi").localCheckpoint(true)
      n = e.count()
    }
    matched
  }

  /** Condensation graph: contract every vertex to its component and keep
    * the distinct cross-component edges — the acyclic quotient the
    * compiler-flavored analyses run on after SCC. `components` is any
    * (id, component) assignment (SCC, CC, communities); vertices absent
    * from it are their own singleton component. Two keyed endpoint joins +
    * one distinct — never materializes per-pair paths. Returns
    * (csrc, cdst) distinct, self-loops dropped. */
  def condensation(edges: DataFrame, components: DataFrame): DataFrame = {
    val comp = components.select(col("id"), col("component"))
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    e.join(comp.withColumnRenamed("id", "src"), Seq("src"), "left")
      .select(coalesce(col("component"), col("src")).as("csrc"), col("dst"))
      .join(comp.withColumnRenamed("id", "dst"), Seq("dst"), "left")
      .select(col("csrc"), coalesce(col("component"), col("dst")).as("cdst"))
      .where(col("csrc") =!= col("cdst"))
      .dropDuplicates("csrc", "cdst")
  }

  /** Transitive reduction of a DAG: drop every edge (u,v) for which a
    * longer u→v path exists — the minimal edge set with the same
    * reachability (unique for DAGs, Aho–Garey–Ullman 1972). Distributed as
    * a bounded-depth delta expansion: level k holds the ≥2-hop pairs at
    * distance k, each round ONE frontier⋈edges join + dedup against the
    * accumulated pair set (per-round work tracks the frontier; each round's
    * drain agg completes a lazy checkpoint, cutting lineage), then one
    * anti-join removes implied edges.
    * `maxDepth` bounds the expansion (DAG depth; loud failure beats a
    * silent wrong answer if the graph is deeper). Returns the kept
    * (src, dst) edges. */
  def transitiveReduction(edges: DataFrame, maxDepth: Int = 20,
      localMaxEdges: Long = 500000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst")).dropDuplicates("src", "dst")
      .localCheckpoint(eager = false)
    // guarded LOCAL replay (the CC/topo pattern) of the identical pair
    // recurrence, including the maxDepth and cycle loud failures in the
    // same order. The edge guard alone cannot bound the REACHABLE PAIR set
    // (a shallow wide DAG can imply far more pairs than it has edges), so
    // the replay also bails back to the distributed loop — resuming from
    // the same cached edge frame — if implied pairs outgrow 16× the guard.
    val pairsOpt =
      if (integralCols(edges, "src", "dst"))
        // probe + collect fused into one action (collectAtMost); no
        // null-endpoint branch needed, unlike the CC/relax replays: this
        // operator's prep filter (src =!= dst, null-safe SQL inequality)
        // already drops null-endpoint rows on BOTH regimes
        collectPairsAtMost(e, localMaxEdges)
      else None
    val localResult: Option[DataFrame] =
      if (pairsOpt.isDefined) {
        val pairs = pairsOpt.get
        locally {
          val adj = scala.collection.mutable.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
          pairs.foreach { case (s0, d0) =>
            adj.getOrElseUpdate(s0, new scala.collection.mutable.ArrayBuffer[Long]) += d0
          }
          val implied = scala.collection.mutable.HashMap[Long, scala.collection.mutable.HashSet[Long]]()
          def impliedHas(s0: Long, v0: Long) = implied.get(s0).exists(_.contains(v0))
          var nImplied = 0L
          // saturate: a force-local caller passes localMaxEdges = MaxValue
          // (the ComparePaths convention) and 16 * MaxValue would wrap
          // negative, silently bailing every call to the distributed path
          val pairCap =
            if (localMaxEdges > Long.MaxValue / 16) Long.MaxValue
            else 16L * math.max(localMaxEdges, 1L)
          var frontier: Array[(Long, Long)] = pairs
          var d = 1
          var drained = false
          var bail = false
          while (!drained && !bail) {
            val nextSet = scala.collection.mutable.LinkedHashSet[(Long, Long)]()
            frontier.foreach { case (s0, v0) =>
              adj.get(v0).foreach(_.foreach { w =>
                if (!impliedHas(s0, w)) nextSet += ((s0, w))
              })
            }
            d += 1
            if (nextSet.isEmpty) drained = true
            else {
              if (d > maxDepth)
                throw new IllegalStateException(
                  s"transitiveReduction: paths deeper than maxDepth=$maxDepth — not a bounded DAG?")
              if (nextSet.exists { case (s0, v0) => s0 == v0 })
                throw new IllegalStateException(
                  "transitiveReduction: input contains a cycle — defined on DAGs only")
              nextSet.foreach { case (s0, v0) =>
                implied.getOrElseUpdate(s0, new scala.collection.mutable.HashSet[Long]) += v0
              }
              nImplied += nextSet.size
              if (nImplied > pairCap) bail = true
              else frontier = nextSet.toArray
            }
          }
          if (bail) None
          else Some(pairs.filterNot { case (s0, v0) => impliedHas(s0, v0) }
            .toSeq.toDF("src", "dst"))
        }
      } else None
    localResult match {
      case Some(r) => return r
      case None    => () // distributed loop below, reading the same cached e
    }
    // pairs (s, v) reachable by exactly the paths expanded so far; start at
    // the 1-hop pairs, accumulate only depth >= 2
    var frontier = e.select(col("src").as("s"), col("dst").as("v"))
    var implied = frontier.where(lit(false)).localCheckpoint(eager = false)
    var d = 1
    var drained = false
    while (!drained) {
      // LAZY checkpoint + full agg = ONE action per round: the agg scans
      // every partition of the delta, which completes the checkpoint as a
      // side effect — an eager checkpoint here would be a second job whose
      // only purpose is to materialize what the agg is about to read
      val next = frontier.join(e, frontier("v") === e("src"))
        .select(col("s"), col("dst").as("v")).dropDuplicates("s", "v")
        .join(implied, Seq("s", "v"), "left_anti")
        .localCheckpoint(eager = false)
      d += 1
      // ONE scan of the delta yields both loop controls: the drain count
      // and the cycle witness — a self-pair (s, s) can never appear on a
      // DAG; failing loudly here keeps the contract (a cycle shorter than
      // maxDepth would otherwise drain and SILENTLY delete the cycle's
      // edges as "implied")
      val st = next.agg(count(lit(1)).as("n"),
        max(when(col("s") === col("v"), 1).otherwise(0)).as("cyc")).head()
      if (st.getLong(0) == 0L) drained = true
      else {
        if (d > maxDepth)
          throw new IllegalStateException(
            s"transitiveReduction: paths deeper than maxDepth=$maxDepth — not a bounded DAG?")
        if (st.getInt(1) == 1)
          throw new IllegalStateException(
            "transitiveReduction: input contains a cycle — defined on DAGs only")
        // implied is a union of checkpoint-completed deltas (each round's
        // drain agg materialized its lazy checkpoint) — lineage stays
        // depth-1 without re-materializing the accumulated set each round
        implied = implied.unionByName(next)
        frontier = next
      }
    }
    e.join(implied.select(col("s").as("src"), col("v").as("dst")),
      Seq("src", "dst"), "left_anti")
  }
}
