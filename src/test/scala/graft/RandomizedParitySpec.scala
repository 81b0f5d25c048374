package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.algos.Algos

/** Randomized cross-checks: each distributed algorithm against a naive
  * driver-side reference implementation over seeded random graphs/documents
  * (deterministic — same cases every run). Catches the edge cases the
  * hand-built graphs miss: disconnected pieces, self-loops, empty inputs,
  * duplicate edges.
  */
class RandomizedParitySpec extends AnyFunSuite {
  lazy implicit val spark = TestSpark.spark
  import spark.implicits._

  private def randomGraph(seed: Int, n: Int, nEdges: Int): (Seq[Long], Seq[(Long, Long)]) = {
    val rnd = new scala.util.Random(seed)
    val vs = (0L until n.toLong).toSeq
    val es = Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    (vs, es)
  }

  private def naiveSccLabels(vs: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Long] = {
    // reachability-based SCC: u ~ v iff u reaches v and v reaches u
    val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def reach(s: Long): Set[Long] = {
      var seen = Set(s); var frontier = Set(s)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty)) -- seen
        seen ++= next; frontier = next
      }
      seen
    }
    val r = vs.map(v => v -> reach(v)).toMap
    vs.map(v => v -> vs.filter(u => r(v)(u) && r(u)(v)).min).toMap
  }

  test("SCC trim+Tarjan matches naive reachability SCC on random graphs") {
    for (seed <- 1 to 8) {
      val (vs, es) = randomGraph(seed, n = 9, nEdges = 14)
      val got = Algos.stronglyConnectedComponents(vs.toDF("id"), es.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(got === naiveSccLabels(vs, es), s"seed=$seed es=$es")
    }
  }

  test("delta BFS matches naive BFS distances on random graphs") {
    for (seed <- 11 to 16) {
      val (vs, es) = randomGraph(seed, n = 10, nEdges = 16)
      val sources = vs.filter(_ % 3 == 0)
      val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      // naive multi-source BFS
      var dist = sources.map(_ -> 0).toMap
      var frontier = sources.toSet
      var d = 0
      while (frontier.nonEmpty) {
        d += 1
        val next = frontier.flatMap(v => adj.getOrElse(v, Seq.empty)).diff(dist.keySet)
        next.foreach(v => dist += v -> d)
        frontier = next
      }
      val got = Algos.bfsDistances(vs.toDF("id"), es.toDF("src", "dst"),
          sources.toDF("id"))
        .as[(Long, Int)].collect().toMap
      assert(got === dist, s"seed=$seed es=$es")
    }
  }

  test("delta topoLevels matches naive bounded longest-path on random graphs") {
    val maxIter = 8
    for (seed <- 21 to 26) {
      val (vs, es) = randomGraph(seed, n = 8, nEdges = 10)
      // naive: level(v) after k rounds = max over path lengths <= k ending at v
      var lvl = vs.map(_ -> 0).toMap
      for (_ <- 1 to maxIter) {
        val bump = es.groupBy(_._2).map { case (v, in) => v -> (in.map(e => lvl(e._1)).max + 1) }
        lvl = lvl.map { case (v, l) => v -> math.max(l, bump.getOrElse(v, 0)) }
      }
      val got = Algos.topoLevels(vs.toDF("id"), es.toDF("src", "dst"), maxIter)
        .as[(Long, Int)].collect().toMap
      assert(got === lvl, s"seed=$seed es=$es")
    }
  }

  test("prefix-filter jaccard finds exactly the naive all-pairs result") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("red", "blue", "fox", "dog", "run", "jump", "lazy", "quick")
    val docs = (1L to 24L).map { i =>
      val n = 4 + rnd.nextInt(8)
      i -> Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    def shingles(t: String): Set[String] = {
      val ts = t.split(" ").filter(_.nonEmpty)
      ts.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val naive = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = shingles(ta); sb = shingles(tb)
      if sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      union = (sa | sb).size
      if inter * 10000 >= 5000 * union
    } yield (ia, ib, inter.toLong, union.toLong)).toSet
    val got = graft.dedup.Dedup.ngramJaccardPairs(
        docs.toDF("doc_id", "text"), "doc_id", "text", k = 3, minBp = 5000)
      .select("id_a", "id_b", "inter_n", "union_n")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === naive)
  }

  test("simhash band candidates contain every pair within the hamming bound") {
    // pigeonhole completeness: ham(a,b) <= 3 => >= 1 of 4 16-bit bands equal
    val rnd = new scala.util.Random(13)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ii", "jj")
    val docs = (1L to 20L).map { i =>
      i -> Seq.fill(12)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    val sigs = graft.dedup.Dedup.simhash(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val within = (for {
      (ia, _) <- docs; (ib, _) <- docs if ia < ib
      if java.lang.Long.bitCount(sigs(ia) ^ sigs(ib)) <= 3
    } yield (ia, ib)).toSet
    val got = graft.dedup.Dedup.simhashPairs(df, "doc_id", "text", maxHam = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === within)
  }
}
