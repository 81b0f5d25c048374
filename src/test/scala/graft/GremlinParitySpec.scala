package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{Descend, PropertyGraph}

/** Parity with the reference's gremlin-recipes test suite
  * (fermor test/fermor/gremlin_examples_test.clj): degree centrality,
  * betweenness centrality, cycle detection, and the recommendation recipe,
  * each with the reference's exact expected values.
  */
class GremlinParitySpec extends AnyFunSuite {
  lazy implicit val spark = TestSpark.spark
  import spark.implicits._

  private def graphOf(vs: Seq[Long], es: Seq[(Long, Long)], label: String) =
    PropertyGraph(
      Map("v" -> vs.toDF("id")),
      es.toDF("src", "dst").withColumn("label", lit(label)))

  test("degree centrality on the job graph (fermor centrality)") {
    // same graph as TraversalSpec.jobGraph; expected degrees from the
    // reference: blueprints 3, rexster 1, everyone else 2
    val es = Seq(
      (1L, 11L), (1L, 12L), (2L, 13L), (2L, 14L),          // completes
      (11L, 21L), (12L, 22L), (13L, 24L), (14L, 23L),      // appliesTo
      (31L, 21L), (31L, 22L), (31L, 23L), (32L, 24L))      // created
      .toDF("src", "dst").withColumn("label", lit("e"))
    val deg = graft.algos.Algos.degrees(es).as[(Long, Long)].collect().toMap
    val expected = Map(31L -> 3L, 32L -> 1L) ++
      Seq(1L, 2L, 11L, 12L, 13L, 14L, 21L, 22L, 23L, 24L).map(_ -> 2L)
    assert(deg === expected)
  }

  test("betweenness centrality via shortest-path enumeration (fermor betweeness-centrality)") {
    // a-b-c-d-e-f graph from the TinkerPop recipe; expected
    // {a 15, b 29, c 21, d 21, e 29, f 15}
    val ids = Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L, "e" -> 5L, "f" -> 6L)
    val base = Seq("a" -> "b", "b" -> "c", "b" -> "d", "c" -> "e", "d" -> "e", "e" -> "f")
      .map { case (x, y) => (ids(x), ids(y)) }
    val undirected = base ++ base.map(_.swap)
    val g = graphOf(ids.values.toSeq, undirected, "next")
    // first-class operator: enumerate simple paths, keep the shortest per
    // (origin, destination), count vertex occurrences
    val counts = graft.algos.Algos.betweennessByEnumeration(g, maxDepth = 6)
      .as[(Long, Long)].collect().toMap
    val expected = Map("a" -> 15L, "b" -> 29L, "c" -> 21L, "d" -> 21L, "e" -> 29L, "f" -> 15L)
      .map { case (k, n) => ids(k) -> n }
    assert(counts === expected)
  }

  test("cycle detection (fermor find-all-cycles)") {
    val ids = Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L)
    val es = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "d", "c" -> "d")
      .map { case (x, y) => (ids(x), ids(y)) }
    val g = graphOf(ids.values.toSeq, es, "knows")
    val cycles = Descend.allCycles(g, g.kind("v").select("id"), Nil,
        forward = true, maxDepth = 3)
      .select("path").as[Seq[Long]].collect().toSet
    // the reference finds the one 3-cycle from each of its members
    val expected = Set(
      Seq("a", "b", "c", "a"), Seq("b", "c", "a", "b"), Seq("c", "a", "b", "c"))
      .map(_.map(ids))
    assert(cycles === expected)
  }

  test("recommendation recipe (fermor recommend-stuff)") {
    // people buy products; recommend what co-purchasers also bought,
    // excluding own products (and, as the reference's test does, excluding
    // alice from the co-purchaser set), grouped by occurrence count
    val person = Map("alice" -> 101L, "bob" -> 102L, "jon" -> 103L,
      "jack" -> 104L, "jill" -> 105L)
    def p(i: Int) = 200L + i
    val bought: Seq[(Long, Long)] =
      (3 to 7).map(i => person("alice") -> p(i)) ++
      (1 to 5).map(i => person("bob") -> p(i)) ++
      (6 to 10).map(i => person("jon") -> p(i)) ++
      (1 to 10 by 2).map(i => person("jack") -> p(i)) ++
      (2 to 10 by 2).map(i => person("jill") -> p(i))
    val own = bought.toDF("person", "product")
    val others = own.select(col("product"), col("person").as("other"))
      .where(col("other") =!= person("alice"))
    val rec = own.join(others, "product")
      .where(col("person") =!= col("other"))
      .select(col("person"), col("other"))
      .join(own.select(col("person").as("other"), col("product").as("rec_product")), "other")
      .join(own.select(col("person"), col("product").as("rec_product")),
        Seq("person", "rec_product"), "left_anti") // with-set remove: drop own products
      .groupBy("person", "rec_product").count()
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (pid, rows) =>
        pid -> rows.groupBy(_._3).map { case (n, v) => n -> v.map(_._2).toSet }
      }
    def ps(is: Int*): Set[Long] = is.map(p(_).toLong).toSet
    val expected = Map(
      person("jon")   -> Map(2L -> ps(1, 3, 5), 3L -> ps(2, 4)),
      person("alice") -> Map(4L -> ps(8, 10), 5L -> ps(2, 9), 6L -> ps(1)),
      person("bob")   -> Map(2L -> ps(6, 8, 10), 3L -> ps(7, 9)),
      person("jill")  -> Map(2L -> ps(1, 3, 5), 3L -> ps(7, 9)),
      person("jack")  -> Map(2L -> ps(6, 8, 10), 3L -> ps(2, 4)))
    assert(rec === expected)
  }
}
