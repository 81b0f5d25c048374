package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.algos.Algos

/** Parity with the reference's OWN test suite (fermor test/fermor/graph/
  * algo_test.clj), on its exact graphs from the published sources it cites:
  * ELI (Bendersky's traversal-orderings article), GRAPHS (Offner's compiler
  * notes), and DOM (Cooper–Harvey–Kennedy). Letters map to their alphabet
  * position so sorted-successor DFS matches fermor's Bifurcan-sorted
  * adjacency — sequences compare EXACTLY, not just structurally.
  */
object PropertyGraphFixtures {
  /** value-graph for the descend-control cases: 0→{1,2,3}, 2→9. */
  lazy val valueGraph: graft.graph.PropertyGraph = {
    val spark = TestSpark.spark
    import spark.implicits._
    graft.graph.PropertyGraph(
      Map("v" -> Seq(-2L, -1L, 0L, 1L, 2L, 3L, 9L).toDF("id")),
      Seq((0L, 1L), (0L, 2L), (0L, 3L), (2L, 9L))
        .toDF("src", "dst").withColumn(
          "label", org.apache.spark.sql.functions.lit("child")))
  }
}

class ReferenceParitySpec extends AnyFunSuite {
  lazy implicit val spark = TestSpark.spark
  import spark.implicits._
  import graft.graph.PropertyGraph

  private val L: Map[String, Long] =
    ('A' to 'Z').map(c => c.toString -> (c - 'A' + 1).toLong).toMap

  private def edges(pairs: (String, String)*) =
    pairs.map { case (a, b) => (L(a), L(b)) }.toDF("src", "dst")

  // ELI simple graph (algo_test.clj:12)
  lazy val simple = edges(
    "A" -> "T", "A" -> "B", "A" -> "C", "T" -> "B",
    "C" -> "B", "B" -> "D", "C" -> "E", "E" -> "D")

  // ELI cyclic graph (algo_test.clj:42)
  lazy val cyclic = edges(
    "X" -> "T", "X" -> "B", "X" -> "C", "T" -> "B", "B" -> "D",
    "C" -> "E", "E" -> "D", "E" -> "M", "M" -> "C", "D" -> "G", "G" -> "D")

  test("postwalk order on the ELI simple graph (fermor test-postwalk)") {
    val rows = Algos.postOrderNumbering(L("A"), simple)
      .as[(Long, Int, Int)].collect().sortBy(_._2).map(_._1).toSeq
    assert(rows === Seq("D", "B", "E", "C", "T", "A").map(L)) // [D B E C T A]
    val rpo = Algos.postOrderNumbering(L("A"), simple)
      .as[(Long, Int, Int)].collect().sortBy(_._3).map(_._1).toSeq
    assert(rpo === Seq("A", "T", "C", "E", "B", "D").map(L)) // reverse-postwalk
  }

  test("postwalk order on the ELI cyclic graph (fermor test-postwalk-cyclic)") {
    val rows = Algos.postOrderNumbering(L("X"), cyclic)
      .as[(Long, Int, Int)].collect().sortBy(_._2).map(_._1).toSeq
    assert(rows === Seq("G", "D", "B", "M", "E", "C", "T", "X").map(L))
  }

  test("walk-reduce accumulators (fermor test-postwalk-reduce family, string-conj)") {
    // algo_test.clj:27,37,102,107 — the reference folds (conj state (str id));
    // the exact accumulated sequences must match on both ELI graphs
    val R: Map[Long, String] = L.map(_.swap)
    def conjStr(s: List[String], v: Long): List[String] = s :+ R(v)
    assert(Algos.postwalkReduce(L("A"), simple, List.empty[String])(conjStr) ===
      List("D", "B", "E", "C", "T", "A"))
    assert(Algos.reversePostwalkReduce(L("A"), simple, List.empty[String])(conjStr) ===
      List("A", "T", "C", "E", "B", "D"))
    assert(Algos.postwalkReduce(L("X"), cyclic, List.empty[String])(conjStr) ===
      List("G", "D", "B", "M", "E", "C", "T", "X"))
    assert(Algos.reversePostwalkReduce(L("X"), cyclic, List.empty[String])(conjStr) ===
      List("X", "T", "C", "E", "M", "B", "D", "G"))
  }

  test("immediate dominators on the ELI cyclic graph (fermor dominance)") {
    val idom = Algos.immediateDominators(L("X"), cyclic)
      .as[(Long, Long)].collect().toMap
    val expected = Map("X" -> "X", "T" -> "X", "C" -> "X", "E" -> "C",
      "M" -> "E", "B" -> "X", "D" -> "X", "G" -> "D")
      .map { case (k, v) => L(k) -> L(v) }
    assert(idom === expected)
  }

  test("dominance frontiers on the ELI cyclic graph (fermor on-the-range)") {
    val df = Algos.dominanceFrontiers(L("X"), cyclic)
      .as[(Long, Long)].collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expected = Map(
      "T" -> Set("B"), "C" -> Set("D", "C"), "E" -> Set("D", "C"),
      "M" -> Set("C"), "B" -> Set("D"), "D" -> Set("D"), "G" -> Set("D"))
      .map { case (k, v) => L(k) -> v.map(L) }
    assert(df === expected) // X has an empty frontier and is not emitted
  }

  test("SCCs on the ELI cyclic graph (fermor scc/scsg)") {
    val vs = cyclic.select(col("src").as("id"))
      .unionAll(cyclic.select(col("dst").as("id"))).distinct()
    val comps = Algos.nontrivialSccs(vs, cyclic)
      .as[(Long, Long)].collect().groupBy(_._2).map(_._2.map(_._1).toSet).toSet
    assert(comps === Set(Set("M", "C", "E").map(L), Set("D", "G").map(L)))
  }

  test("loop forest on the ELI cyclic graph (fermor simple-graph-loops)") {
    assert(Algos.loopForest(L("A"), simple).isEmpty) // acyclic: no loops
    val loops = Algos.loopForest(L("X"), cyclic)
      .as[(Long, Long, Int)].collect()
    val byHeader = loops.groupBy(_._2).map { case (h, v) => h -> v.map(_._1).toSet }
    assert(byHeader === Map(
      L("D") -> Set("D", "G").map(L),
      L("C") -> Set("C", "E", "M").map(L)))
    assert(loops.forall(_._3 == 0))
  }

  test("nested loop tree (fermor double-graph: loop in a loop)") {
    // entry→head→body-entry→body-head⇄body-body, body-head→body-result→body→head
    val ids = Map("entry" -> 1L, "head" -> 2L, "bentry" -> 3L, "bhead" -> 4L,
      "bbody" -> 5L, "bresult" -> 6L, "body" -> 7L, "result" -> 8L)
    val es = Seq(
      "entry" -> "head", "head" -> "bentry", "bresult" -> "body",
      "body" -> "head", "head" -> "result", "bentry" -> "bhead",
      "bhead" -> "bbody", "bbody" -> "bhead", "bhead" -> "bresult")
      .map { case (a, b) => (ids(a), ids(b)) }.toDF("src", "dst")
    val loops = Algos.loopForest(ids("entry"), es).as[(Long, Long, Int)].collect()
    val outer = loops.filter(_._2 == ids("head"))
    val inner = loops.filter(_._2 == ids("bhead"))
    assert(outer.map(_._1).toSet ===
      Set("head", "body", "bentry", "bhead", "bbody", "bresult").map(ids))
    assert(inner.map(_._1).toSet === Set("bhead", "bbody").map(ids))
    assert(outer.forall(_._3 == 0) && inner.forall(_._3 == 1)) // nesting depth
  }

  test("descend control semantics as bags (fermor descend-with-control)") {
    // fermor: (descend control children [0 -1 0 -2]) where children(0)=[1 2 3].
    // Values become a tiny graph 0→{1,2,3}; the duplicate root 0 stays a bag
    // row. Order and the lazy-seq sibling-cut are sequential semantics (see
    // SURVEY §5); the emitted BAGS must match.
    val g = PropertyGraphFixtures.valueGraph
    val roots = Seq(0L, -1L, 0L, -2L).toDF("id")
    def bag(emit: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        continueP: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      graft.graph.Descend.run(g, roots, Nil, forward = true, maxDepth = 3,
          emit = emit, continueP = continueP)
        .select("id").as[Long].collect().toSeq.groupBy(identity).map { case (k, v) => k -> v.size }
    // the reference's children fn returns children only for 0; the 2→9 edge
    // exists purely for the emit-and-cut case below
    val childrenOf0 = (d: org.apache.spark.sql.DataFrame) => d.where(col("id") === 0)
    // continue-only, no emit => []
    assert(bag(_.where(lit(false)), childrenOf0) === Map.empty)
    // emit everything except 0 => [1 2 3 -1 1 2 3 -2]
    assert(bag(_.where(col("id") =!= 0), childrenOf0) ===
      Map(1L -> 2, 2L -> 2, 3L -> 2, -1L -> 1, -2L -> 1))
    // emit without continue => roots only [0 -1 0 -2]
    assert(bag(identity, _.where(lit(false))) === Map(0L -> 2, -1L -> 1, -2L -> 1))
    // emit-and-cut at 2: 2 emitted, its child 9 never visited
    assert(bag(identity, _.where(col("id") =!= 2)) ===
      Map(0L -> 2, -1L -> 1, -2L -> 1, 1L -> 2, 2L -> 2, 3L -> 2))
  }

  test("irreducible graph from the DOM paper (fermor all-dom5)") {
    val es = Seq((5L, 4L), (5L, 3L), (4L, 1L), (1L, 2L), (3L, 2L), (2L, 1L))
      .toDF("src", "dst")
    val idom = Algos.immediateDominators(5L, es).as[(Long, Long)].collect().toMap
    assert(idom === Map(5L -> 5L, 4L -> 5L, 3L -> 5L, 2L -> 5L, 1L -> 5L))
    val vs = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val cyc = Algos.nontrivialSccs(vs, es)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(cyc === Set(1L, 2L)) // fermor cycles: [[1 2 1]]
  }

  test("dominators on Offner p42 flow graph (fermor flow-hard)") {
    val es = edges(
      "S" -> "A", "S" -> "B", "A" -> "B", "B" -> "C", "C" -> "D", "C" -> "E",
      "D" -> "F", "E" -> "F", "E" -> "J", "E" -> "C", "F" -> "C", "F" -> "G",
      "F" -> "L", "I" -> "F", "G" -> "I", "G" -> "B", "J" -> "K", "K" -> "J",
      "L" -> "J", "L" -> "N", "L" -> "M", "M" -> "N", "M" -> "L", "N" -> "L",
      "M" -> "O", "G" -> "O", "H" -> "O", "H" -> "S", "G" -> "H", "O" -> "P",
      "P" -> "O", "P" -> "Q", "Q" -> "P")
    val idom = Algos.immediateDominators(L("S"), es).as[(Long, Long)].collect().toMap
    val expected = Map(
      "A" -> "S", "B" -> "S", "C" -> "B", "D" -> "C", "E" -> "C", "F" -> "C",
      "G" -> "F", "H" -> "G", "I" -> "G", "J" -> "C", "K" -> "J", "L" -> "F",
      "M" -> "L", "N" -> "L", "O" -> "F", "P" -> "O", "Q" -> "P", "S" -> "S")
      .map { case (k, v) => L(k) -> L(v) }
    assert(idom === expected)
    // loop-tree headers on the same graph (fermor flow-hard loop-tree keys)
    val headers = Algos.loopForest(L("S"), es)
      .as[(Long, Long, Int)].collect().map(_._2).toSet
    assert(headers === Set("S", "B", "C", "F", "L", "J", "O", "P").map(L))
  }

  test("interval partition on Offner p44 flow graph (fermor flow-hard intervals)") {
    val es = edges(
      "S" -> "A", "S" -> "B", "A" -> "B", "B" -> "C", "C" -> "D", "C" -> "E",
      "D" -> "F", "E" -> "F", "E" -> "J", "E" -> "C", "F" -> "C", "F" -> "G",
      "F" -> "L", "I" -> "F", "G" -> "I", "G" -> "B", "J" -> "K", "K" -> "J",
      "L" -> "J", "L" -> "N", "L" -> "M", "M" -> "N", "M" -> "L", "N" -> "L",
      "M" -> "O", "G" -> "O", "H" -> "O", "H" -> "S", "G" -> "H", "O" -> "P",
      "P" -> "O", "P" -> "Q", "Q" -> "P")
    val parts = Algos.intervals(L("S"), es)
      .as[(Long, Long)].collect().groupBy(_._2).map(_._2.map(_._1).toSet).toSet
    val expected = Set(
      Set("S", "A"), Set("B"), Set("C", "D", "E"), Set("F", "G", "H", "I"),
      Set("L", "M", "N"), Set("O"), Set("P", "Q"), Set("J", "K"))
      .map(_.map(L))
    assert(parts === expected)
  }

  test("dominators on Offner loops graph (fermor loops-test)") {
    val es = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (4L, 6L), (5L, 7L),
      (6L, 7L), (4L, 3L), (7L, 4L), (7L, 8L), (8L, 3L), (8L, 9L), (9L, 1L),
      (8L, 10L), (10L, 7L)).toDF("src", "dst")
    val idom = Algos.immediateDominators(1L, es).as[(Long, Long)].collect().toMap
    assert(idom === Map(
      7L -> 4L, 1L -> 1L, 4L -> 3L, 6L -> 4L, 3L -> 1L,
      2L -> 1L, 9L -> 8L, 5L -> 4L, 10L -> 8L, 8L -> 7L))
  }

  test("loom digraph protocol surface (fermor loom_test digraph-test)") {
    // loom_test.clj:108 g1: edges 1→2 1→3 2→3 plus isolated node 4 — the
    // protocol assertions (nodes/edges/has-*/successors/degrees/transpose)
    // through our PropertyGraph + Traversal equivalents and the GraphX
    // adapter that plays loom's role
    import graft.graph.PropertyGraph
    val g1 = PropertyGraph(Map("v" -> Seq(1L, 2L, 3L, 4L).toDF("id")),
      Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst").withColumn("label", lit("e")))
    assert(g1.vertices.select("id").as[Long].collect().toSet === Set(1L, 2L, 3L, 4L))
    assert(g1.edges.select("src", "dst").as[(Long, Long)].collect().toSet ===
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(g1.hasVertex(4L) && !g1.hasVertex(5L))
    assert(!g1.edge(1L, 2L, "e").isEmpty && g1.edge(2L, 1L, "e").isEmpty)
    def succ(g: PropertyGraph, v: Long) =
      g.from(Seq(v).toDF("id")).out("e").df.select("id").as[Long].collect().toSet
    assert(succ(g1, 1L) === Set(2L, 3L) && succ(g1, 3L) === Set.empty && succ(g1, 4L) === Set.empty)
    val deg = graft.algos.Algos.degrees(g1.edges, "out").as[(Long, Long)].collect().toMap
    assert(deg.getOrElse(1L, 0L) === 2L && deg.getOrElse(3L, 0L) === 0L)
    val indeg = graft.algos.Algos.degrees(g1.edges, "in").as[(Long, Long)].collect().toMap
    assert(indeg.getOrElse(3L, 0L) === 2L && indeg.getOrElse(1L, 0L) === 0L)
    val g6 = g1.transpose
    assert(g6.edges.select("src", "dst").as[(Long, Long)].collect().toSet ===
      Set((2L, 1L), (3L, 1L), (3L, 2L)))
    assert(succ(g6, 3L) === Set(1L, 2L) && succ(g6, 1L) === Set.empty)
    val gx = g1.toGraphX(spark)
    assert(gx.edges.map(e => (e.srcId, e.dstId)).collect().toSet ===
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(gx.vertices.keys.collect().toSet === Set(1L, 2L, 3L, 4L))
  }

  test("loom protocols: label restriction + weight defaults (fermor loom_test)") {
    // loom_test.clj:10-55 loom-protocols: graph with edges loom(a→b, weight 4),
    // xyz(c→d, NO weight), nope(d→b); the loom view is restricted to
    // :edge-labels [:loom :xyz] with :weight/nil 9 and :weight/no-edge 33.
    // ids: a=1 b=2 c=3 d=4. Our label restriction is edgeSubgraph; the weight
    // defaults are the adapter contract, expressed as coalesce + miss-default.
    import graft.graph.PropertyGraph
    val g0 = PropertyGraph(Map("v" -> Seq(1L, 2L, 3L, 4L).toDF("id")),
      Seq((1L, 2L, "loom", Some(4L)), (3L, 4L, "xyz", None), (4L, 2L, "nope", None))
        .toDF("src", "dst", "label", "weight"))
    val g = g0.edgeSubgraph("loom", "xyz")
    def weight(gr: PropertyGraph, s: Long, d: Long, nilW: Long, noEdgeW: Long): Long = {
      val w = gr.edges.where(col("src") === s && col("dst") === d)
        .select(coalesce(col("weight"), lit(nilW))).as[Long].collect()
      if (w.isEmpty) noEdgeW else w.head
    }
    def succ(gr: PropertyGraph, v: Long) =
      gr.from(Seq(v).toDF("id")).out().df.select("id").as[Long].collect().toSeq
    def pred(gr: PropertyGraph, v: Long) =
      gr.from(Seq(v).toDF("id")).in().df.select("id").as[Long].collect().toSeq
    assert(succ(g, 1L) === Seq(2L))                    // successors* g :a = [:b]
    assert(succ(g, 1L).size === 1)                     // out-degree 1
    assert(g.edges.where(col("src") === 1).select("src", "dst")
      .as[(Long, Long)].collect().toSeq === Seq((1L, 2L))) // out-edges [[:a :b]]
    assert(pred(g, 2L) === Seq(1L))                    // predecessors* g :b = [:a] (nope hidden)
    assert(weight(g, 1L, 2L, 9L, 33L) === 4L)          // weight* :a :b = 4
    assert(weight(g, 3L, 4L, 9L, 33L) === 9L)          // nil weight default
    assert(weight(g, 1L, 4L, 9L, 33L) === 33L)         // no-edge default
    assert(g.vertices.select("id").as[Long].collect().toSet === Set(1L, 2L, 3L, 4L))
    assert(g.edges.select("src", "dst").as[(Long, Long)].collect().toSet ===
      Set((1L, 2L), (3L, 4L)))                         // nope not in the view
    assert(g.transpose.edges.select("src", "dst").as[(Long, Long)].collect().toSet ===
      Set((2L, 1L), (4L, 3L)))
    assert(g.hasVertex(1L) && g.hasVertex(4L) && !g.hasVertex(5L))
    assert(!g.edge(1L, 2L, "loom").isEmpty)            // has-edge? :a :b
    assert(g.edges.where(col("src") === 1 && col("dst") === 3).isEmpty)
    assert(g.edges.where(col("src") === 4 && col("dst") === 2).isEmpty) // nope restricted away
  }

  test("loom weighted digraph: weight carry, default 1, transpose keeps weight (fermor loom_test)") {
    // loom_test.clj:197-249 weighted-digraph-test: edges 1→2 w77, 1→3 w88,
    // 2→3 w99 (+ node 4); g4 adds 5→6 w88, 6→5 w88, 7→8 UNWEIGHTED (loom's
    // default weight 1, the reference's `(== 1 (loom/weight g4 7 8))`);
    // g6 = transpose g1 keeps the weight on the reversed edge.
    import graft.graph.PropertyGraph
    val g1 = PropertyGraph(Map("v" -> Seq(1L, 2L, 3L, 4L).toDF("id")),
      Seq((1L, 2L, Some(77L)), (1L, 3L, Some(88L)), (2L, 3L, Some(99L)))
        .toDF("src", "dst", "weight").withColumn("label", lit("w")))
    val g4 = g1
      .addVertices("v", Seq(5L, 6L, 7L, 8L, 9L).toDF("id"))
      .addEdges(Seq((5L, 6L, Some(88L)), (6L, 5L, Some(88L)), (7L, 8L, None))
        .toDF("src", "dst", "weight").withColumn("label", lit("w")))
    def weight(gr: PropertyGraph, s: Long, d: Long): Long =
      gr.edges.where(col("src") === s && col("dst") === d)
        .select(coalesce(col("weight"), lit(1L))).as[Long].head()
    assert(weight(g1, 1L, 2L) === 77L)
    assert(weight(g4, 6L, 5L) === 88L)
    assert(weight(g4, 7L, 8L) === 1L)                  // loom's unweighted default
    val g6 = g1.transpose
    assert(weight(g6, 2L, 1L) === 77L)                 // transpose carries the weight
    assert(g6.edges.select("src", "dst").as[(Long, Long)].collect().toSet ===
      Set((2L, 1L), (3L, 1L), (3L, 2L)))
    assert(g4.vertices.select("id").as[Long].collect().toSet === (1L to 9L).toSet)
  }

  test("edge flavours: unique/parallel/weighted builders (fermor edge-flavours)") {
    // core_test.clj:167 — the three edge builders on one graph. ids:
    // a=1 b=2 c=3 x=24 y=25. Within-seq ordering maps to CALL order here
    // (a DataFrame batch is a set); weighted sums are order-free either way.
    import graft.graph.PropertyGraph
    val vs = Seq(1L, 2L, 3L, 24L, 25L).toDF("id")
    val base = PropertyGraph(Map("v" -> vs),
      Seq.empty[(Long, Long, String)].toDF("src", "dst", "label"))
    // :normal (add-unique-edge): the later add REPLACES the triple's doc
    val n1 = Seq((1L, 2L, "normal", Some(9L), None: Option[Long]),
        (2L, 3L, "normal", Some(7L), None: Option[Long]))
      .toDF("src", "dst", "label", "k", "x")
    val n2 = Seq((1L, 2L, "normal", None: Option[Long], Some(1L)),
        (2L, 3L, "normal", None: Option[Long], None: Option[Long]))
      .toDF("src", "dst", "label", "k", "x")
    val gN = base.addUniqueEdges(n1).addUniqueEdges(n2)
    val normalDocs = gN.edges.select("src", "k", "x")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(normalDocs === Set((1L, None, Some(1L)), (2L, None, None)))
    // :p (add-parallel-edge): every instance kept — the reference's
    // {:parallel/count 7 ...} indexed docs are our 7 bag rows
    val p = Seq((1L, 2L, 10L), (2L, 3L, 11L), (2L, 3L, 11L), (1L, 2L, 2L), (1L, 2L, 0L),
        (24L, 25L, 0L), (1L, 2L, 3L), (1L, 2L, 4L), (1L, 2L, 2L), (1L, 2L, 9L))
      .toDF("src", "dst", "x").withColumn("label", lit("p"))
    val gP = base.addEdges(p)
    val counts = gP.edges.groupBy("src", "dst").count()
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(counts === Map((1L, 2L) -> 7L, (2L, 3L) -> 2L, (24L, 25L) -> 1L))
    // :w (add-unique-weighted-edge): re-added triples SUM the weight —
    // reference expects #{11.0 23.0}
    val w = Seq((1L, 2L, 10.0), (2L, 3L, 11.0), (1L, 2L, 2.0), (1L, 2L, 2.0),
        (1L, 2L, 2.0), (1L, 2L, 2.0), (1L, 2L, 5.0))
      .toDF("src", "dst", "weight").withColumn("label", lit("w"))
    val gW = base.addUniqueWeightedEdges(w)
    val weights = gW.edges.select("weight").as[Double].collect().toSet
    assert(weights === Set(23.0, 11.0))
  }

  test("bring-your-own-graph wrapper behaviors (fermor custom_graph_test)") {
    // custom_graph_test.clj:8,21 — the wrapper LAYER is adjudicated N/A
    // (§5: PropertyGraph accepts arbitrary DataFrames directly); these are
    // its observable behaviors on the same graphs.
    import graft.graph.PropertyGraph
    // different-weight-impl: kinds {x,y}, one weighted + one unweighted edge.
    // ids: (k :x :a)=11 (k :y :b)=21 (k :x :c)=12
    val gw = PropertyGraph(
      Map("x" -> Seq(11L, 12L).toDF("id"), "y" -> Seq(21L).toDF("id")),
      Seq((11L, 21L, "xy", Some(12L)), (11L, 12L, "xy", None: Option[Long]))
        .toDF("src", "dst", "label", "weight"))
    assert(gw.vertices.select("kind").as[String].collect().toSet === Set("x", "y"))
    assert(gw.vertices.select("id").as[Long].collect().toSet === Set(11L, 21L, 12L))
    assert(gw.edges.select("weight").as[Option[Long]].collect().toSet ===
      Set(Some(12L), None)) // p/-weight over out-e: #{12 nil}
    // incorporate-any-interface: a=1 b=2 c=3 zone1=4 zone2=5; the `region`
    // accessor is the :region out-hop.
    val gz = PropertyGraph(
      Map("v" -> Seq(1L, 2L, 3L, 4L, 5L).toDF("id")),
      Seq((1L, 4L, "region", Some(12L)), (2L, 4L, "region", None: Option[Long]),
        (3L, 5L, "region", None), (5L, 4L, "region", None))
        .toDF("src", "dst", "label", "weight"))
    assert(gz.allVertices.df.select("id").as[Long].collect().toSet ===
      Set(1L, 2L, 3L, 4L, 5L))
    // (make-pairs region): every vertex paired with its region (or nil)
    val pairs = gz.vertices.select(col("id"))
      .join(gz.edges.select(col("src").as("id"), col("dst").as("region")), Seq("id"), "left")
      .as[(Long, Option[Long])].collect().toSet
    assert(pairs === Set((1L, Some(4L)), (2L, Some(4L)), (3L, Some(5L)),
      (5L, Some(4L)), (4L, None)))
    // (keep region (keep region ...)): two hops, nils dropped -> [zone1]
    val twice = gz.allVertices.out("region").out("region")
      .df.select("id").as[Long].collect().toSeq
    assert(twice === Seq(4L)) // only c -> zone2 -> zone1
    // (all-edges g): the full edge set with the one weighted doc
    val edges = gz.edges.select("src", "dst", "weight")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(edges === Set((1L, 4L, Some(12L)), (2L, 4L, None),
      (3L, 5L, None), (5L, 4L, None)))
  }
}
