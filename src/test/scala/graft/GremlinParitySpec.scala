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

  test("traversal between vertices (fermor traverse-graph / TinkerPop recipe)") {
    // gremlin_examples_test.clj:68 — for a person, every (job, company,
    // creationDate, application) where one of the person's applications
    // applies to the job. ids: bob=1 stephen=2, apps 11-14, jobs 21-24,
    // blueprints=31 rexster=32 (the degree-centrality test's mapping).
    val vs = (Seq(1L, 2L) ++ (11L to 14L) ++ (21L to 24L) ++ Seq(31L, 32L)).toDF("id")
    val es = Seq(
      (1L, 11L, "completes", None), (1L, 12L, "completes", None),
      (2L, 13L, "completes", None), (2L, 14L, "completes", None),
      (11L, 21L, "appliesTo", None), (12L, 22L, "appliesTo", None),
      (13L, 24L, "appliesTo", None), (14L, 23L, "appliesTo", None),
      (31L, 21L, "created", Some("12/20/2015")), (31L, 22L, "created", Some("12/15/2015")),
      (31L, 23L, "created", Some("12/16/2015")), (32L, 24L, "created", Some("12/18/2015")))
      .toDF("src", "dst", "label", "creationDate")
    val g = PropertyGraph(Map("v" -> vs), es)
    val created = es.where(col("label") === "created")
      .select(col("dst").as("job"), col("src").as("company"), col("creationDate"))
    // version 1 — the fluent form the reference refactors INTO (for-macro /
    // f->> composition): jobs → in(appliesTo) with a lookahead on the
    // applicant, origin job carried through the hop
    def fluent(person: Long) = {
      val jobs = vs.where(col("id") >= 21L && col("id") <= 24L)
        .select(col("id"), col("id").as("job"))
      g.from(jobs).in("appliesTo").lookahead(_.in("completes").withId(person))
        .df.select(col("job"), col("id").as("application"))
        .join(created, "job")
        .select("job", "company", "creationDate", "application")
    }
    // version 2 — the direct gremlin-port shape: plain relational joins
    def port(person: Long) = {
      val completes = es.where(col("label") === "completes" && col("src") === person)
        .select(col("dst").as("application"))
      val appliesTo = es.where(col("label") === "appliesTo")
        .select(col("src").as("application"), col("dst").as("job"))
      completes.join(appliesTo, "application").join(created, "job")
        .select("job", "company", "creationDate", "application")
    }
    val stephen = fluent(2L).as[(Long, Long, String, Long)].collect().toSet
    assert(stephen === Set(
      (23L, 31L, "12/16/2015", 14L),
      (24L, 32L, "12/18/2015", 13L)))
    // the reference asserts its two formulations agree over [stephen bob];
    // ours must too (bag equality — seq order is adjudicated N/A)
    val both1 = (fluent(2L).as[(Long, Long, String, Long)].collect() ++ fluent(1L).as[(Long, Long, String, Long)].collect()).toSet
    val both2 = (port(2L).as[(Long, Long, String, Long)].collect() ++ port(1L).as[(Long, Long, String, Long)].collect()).toSet
    assert(both1 === both2)
    assert(both1.size === 4) // bob's two blueprints jobs + stephen's two
    // version 3 — the SAME query on the motif surface (the worked example
    // published in SURVEY §2.2): the cypher_examples-style MATCH
    //   MATCH (p)-[:completes]->(ap)-[:appliesTo]->(j)<-[:created]-(co)
    //   WHERE id(p) = $person RETURN j, co, ap
    // translated term-for-term into one motif string — the id anchor is the
    // WHERE equality, the shared variables are the chain/close joins. Motifs
    // bind VERTEX variables; the created-edge property joins back on its
    // (job, company) endpoint key.
    def viaMotif(person: Long) =
      g.motif(s"(p=$person)-[completes]->(ap); (ap)-[appliesTo]->(j); (co)-[created]->(j)")
        .select(col("j").as("job"), col("co").as("company"), col("ap").as("application"))
        .join(created, Seq("job", "company"))
        .select("job", "company", "creationDate", "application")
    val both3 = (viaMotif(2L).as[(Long, Long, String, Long)].collect() ++
      viaMotif(1L).as[(Long, Long, String, Long)].collect()).toSet
    assert(both3 === both1) // all three surfaces agree, row for row
  }

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

  test("cypher subquery example: coactors + directors per role (fermor cypher_examples)") {
    // The movie query cypher_examples.clj builds toward (its Neo4j subquery
    // flagship): for each (actor, movie) role — coactors whose name
    // contains 'T' (distinct, excluding self) and each director of the
    // movie with their full filmography. Here the whole thing is ONE
    // declarative plan: semi-structured per-role arrays built by
    // grouped sorted collect_list, every step a keyed join.
    val people = Seq((1L, "Alice"), (2L, "Tom"), (3L, "Tina"), (4L, "Dan"), (5L, "Don"))
      .toDF("id", "name")
    val movies = Seq((101L, "Matrix"), (102L, "Speed"), (103L, "Heat")).toDF("id", "title")
    val acted = Seq((1L, 101L), (2L, 101L), (3L, 101L), (1L, 102L), (2L, 102L), (5L, 103L))
      .toDF("src", "dst").withColumn("label", lit("acted_in"))
    val directed = Seq((4L, 101L), (4L, 103L), (5L, 102L))
      .toDF("src", "dst").withColumn("label", lit("directed"))
    val g = PropertyGraph(Map("person" -> people, "movie" -> movies),
      acted.unionByName(directed))
    // roles: (actor a, movie m)
    val roles = g.ofKind("person").tag("a").out("acted_in").df
      .select(col("a"), col("id").as("m"))
    val cast = acted.select(col("dst").as("m"), col("src").as("co"))
    val coactors = roles.join(cast, "m").where(col("co") =!= col("a"))
      .join(people.select(col("id").as("co"), col("name").as("co_name")), "co")
      .where(col("co_name").contains("T"))
      .groupBy("a", "m").agg(sort_array(collect_set(col("co_name"))).as("coactors"))
    val filmography = directed.select(col("src").as("d"), col("dst").as("m2"))
      .join(movies.select(col("id").as("m2"), col("title").as("t2")), "m2")
      .groupBy("d").agg(sort_array(collect_set(col("t2"))).as("movies"))
    val directors = directed.select(col("dst").as("m"), col("src").as("d"))
      .join(people.select(col("id").as("d"), col("name").as("d_name")), "d")
      .join(filmography, "d")
      .groupBy("m").agg(sort_array(collect_list(struct(col("d_name"), col("movies"))))
        .as("directors"))
    val out = roles
      .join(people.select(col("id").as("a"), col("name").as("a_name")), "a")
      .join(movies.select(col("id").as("m"), col("title").as("m_title")), "m")
      .join(coactors, Seq("a", "m"), "left")
      .join(directors, Seq("m"), "left")
      .select(col("a_name"), col("m_title"),
        coalesce(col("coactors"), array().cast("array<string>")).as("coactors"),
        col("directors"))
      .as[(String, String, Seq[String], Seq[(String, Seq[String])])]
      .collect().toSet
    val matrixDirs = Seq(("Dan", Seq("Heat", "Matrix")))
    val speedDirs = Seq(("Don", Seq("Speed")))
    assert(out === Set(
      ("Alice", "Matrix", Seq("Tina", "Tom"), matrixDirs),
      ("Tom", "Matrix", Seq("Tina"), matrixDirs),
      ("Tina", "Matrix", Seq("Tom"), matrixDirs),
      ("Alice", "Speed", Seq("Tom"), speedDirs),
      ("Tom", "Speed", Seq.empty[String], speedDirs),
      ("Don", "Heat", Seq.empty[String], Seq(("Dan", Seq("Heat", "Matrix"))))))
  }

  test("cypher MATCH patterns express directly as motifs (fermor cypher_examples)") {
    // the Cypher MATCH clauses underlying the movie examples, written in
    // the motif surface instead of the fluent DSL — same graph, same rows
    val people = Seq((1L, "Alice"), (2L, "Tom"), (3L, "Tina"), (4L, "Dan"), (5L, "Don"))
      .toDF("id", "name")
    val movies = Seq((101L, "Matrix"), (102L, "Speed"), (103L, "Heat")).toDF("id", "title")
    val acted = Seq((1L, 101L), (2L, 101L), (3L, 101L), (1L, 102L), (2L, 102L), (5L, 103L))
      .toDF("src", "dst").withColumn("label", lit("acted_in"))
    val directed = Seq((4L, 101L), (4L, 103L), (5L, 102L))
      .toDF("src", "dst").withColumn("label", lit("directed"))
    val g = PropertyGraph(Map("person" -> people, "movie" -> movies),
      acted.unionByName(directed))
    // MATCH (a)-[:ACTED_IN]->(m)<-[:ACTED_IN]-(co) WHERE a <> co
    val coact = g.motif("(a:person)-[acted_in]->(m:movie); (co)-[acted_in]->(m)")
      .where(col("a") =!= col("co"))
    assert(coact.count() === 8) // Matrix: 3·2 ordered pairs, Speed: 2, Heat: 0
    // MATCH (a)-[:ACTED_IN]->() WHERE NOT (a)-[:DIRECTED]->() — pure actors
    val pure = g.motif("(a:person)-[acted_in]->(); !(a)-[directed]->()")
    assert(pure.as[Long].collect().toSeq.sorted === Seq(1L, 1L, 2L, 2L, 3L))
    // MATCH (d)-[:DIRECTED]->(m)<-[:ACTED_IN]-(d) — directed AND acted in
    // the same movie (cycle-closing on both endpoints): Don in Speed? Don
    // directed Speed but acted in Heat only -> empty; nobody self-acts
    assert(g.motif("(d)-[directed]->(m); (d)-[acted_in]->(m)").count() === 0)
  }

  test("cypher hyperedge example: common groups via shared roles (fermor cypher_examples)") {
    // the Neo4j hyperedges cookbook pattern: (user)->(hyperedge)->(group)
    // and (hyperedge)->(role); common groups of two users counted by shared
    // (group, role) pairs — relationally an intersect of two keyed routes
    val hrig = Seq((1L, 11L), (1L, 12L), (2L, 13L), (2L, 14L))
      .toDF("src", "dst").withColumn("label", lit("hasRoleInGroup"))
    val hg = Seq((11L, 21L), (12L, 22L), (13L, 21L), (14L, 22L))
      .toDF("src", "dst").withColumn("label", lit("hasGroup"))
    val hr = Seq((11L, 31L), (12L, 32L), (13L, 31L), (14L, 33L))
      .toDF("src", "dst").withColumn("label", lit("hasRole"))
    val g = PropertyGraph(Map("v" -> (1L to 33L).toDF("id")),
      hrig.unionByName(hg).unionByName(hr))
    def rolePairs(u: Long) = {
      val he = g.from(Seq(u).toDF("id")).out("hasRoleInGroup").df.select(col("id").as("he"))
      he.join(hg.select(col("src").as("he"), col("dst").as("grp")), "he")
        .join(hr.select(col("src").as("he"), col("dst").as("role")), "he")
        .select("grp", "role")
    }
    val common = rolePairs(1L).intersect(rolePairs(2L))
      .groupBy("grp").agg(count(lit(1)).as("n_roles"))
      .as[(Long, Long)].collect().toMap
    // users share role 31 in group 21; their group-22 roles differ (32 vs 33)
    assert(common === Map(21L -> 1L))
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
