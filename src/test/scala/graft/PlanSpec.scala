package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.Tpch

/** Plan-shape guarantees (SURVEY.md §4): these assertions pin the properties
  * that make the engine survive a 100× scale-up — filter/projection pushdown
  * to the parquet scan, broadcast of dimension sides in traversal joins, and
  * whole-stage codegen over the hot expressions. A regression here is a
  * scale bug even when results stay correct.
  */
class PlanSpec extends AnyFunSuite {
  lazy implicit val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("property filters reach the parquet scan (PushedFilters)") {
    val q = SparkEntry.queries("q_has_property")(spark, dir)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("c_acctbal"),
      "expected c_acctbal filter pushed to scan:\n" + scan.take(2000))
  }

  test("column pruning: a two-column projection reads a two-column schema") {
    val df = Tpch.table(spark, dir, "customer").select("c_custkey", "c_name")
    val scan = executedPlan(df)
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("c_custkey") && readSchema.contains("c_name"))
    assert(!readSchema.contains("c_acctbal"), "pruned column still read:\n" + readSchema)
  }

  test("labeledEdges: registered exact counts broadcast small slices; mutations lose the hint") {
    import spark.implicits._
    import graft.graph.{PropertyGraph, Traversal}
    val es = Seq((1L, 2L, "a"), (2L, 3L, "b")).toDF("src", "dst", "label")
    val g0 = PropertyGraph(Map("v" -> Seq(1L, 2L, 3L).toDF("id")), es)
    // unregistered: no hint, no crash
    assert(g0.labelRows(Seq("a")).isEmpty)
    PropertyGraph.registerLabelRows(es, 2L, Map("a" -> 1L, "b" -> 1L))
    assert(g0.labelRows(Seq("a")).contains(1L))
    assert(g0.labelRows(Nil).contains(2L))
    assert(g0.labelRows(Seq("missing")).contains(0L)) // absent label = 0 rows, exact
    val hop = Traversal(g0, Seq(1L).toDF("id")).out("a").df
    assert(executedPlan(hop).contains("BroadcastHashJoin"),
      "counted-small label slice should broadcast:\n" + executedPlan(hop).take(2000))
    // an edge MUTATION builds a new DataFrame — the identity-keyed registry
    // must miss, so a stale count can never hint an oversized broadcast
    val g1 = g0.addEdges(Seq((3L, 1L, "a")).toDF("src", "dst", "label"))
    assert(g1.labelRows(Seq("a")).isEmpty)
  }

  test("multi-hop traversal broadcasts the dimension side") {
    val q = SparkEntry.queries("q_out_path2")(spark, dir)
    assert(executedPlan(q).contains("BroadcastHashJoin"),
      "expected broadcast join for nation/region dims")
  }

  test("traversal joins run inside whole-stage codegen") {
    val q = SparkEntry.queries("q_out_path2")(spark, dir)
    q.collect() // AQE finalizes THIS plan's stages (count() would plan anew)
    val plan = executedPlan(q)
    assert(plan.contains("*("), "no whole-stage-codegen stage marker in:\n" + plan.take(2000))
  }

  test("native expressions stay in codegen (no CodegenFallback wrapper)") {
    val df = Tpch.table(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.sim.Ann.quantize(col("embedding")).as("q"))
      .localCheckpoint(false)
      .select(graft.functions.NativeOps.longArrayDot(col("q"), col("q")).as("nq"))
    val plan = executedPlan(df)
    // the `*(n)` prefix marks a WholeStageCodegen stage; the native dot must
    // sit inside one, not behind a CodegenFallback
    assert(plan.contains("*(") && plan.contains("long_array_dot"),
      "native dot not inside a codegen stage:\n" + plan)
    assert(df.agg(sum("nq")).head().getLong(0) > 0L)
  }

  test("bucketed ANN pairs plan contains no all-pairs join; brute baseline does") {
    val lsh = SparkEntry.queries("q_ann_pairs_lsh")(spark, dir)
    lsh.collect() // finalize AQE stages for THIS plan
    val lshPlan = executedPlan(lsh)
    assert(!lshPlan.contains("CartesianProduct") && !lshPlan.contains("BroadcastNestedLoopJoin"),
      "bucketed path must be keyed joins only:\n" + lshPlan.take(3000))
    // the contrast: the brute cosine query IS the all-pairs baseline
    val brute = SparkEntry.queries("q_ann_pairs")(spark, dir)
    brute.collect()
    val brutePlan = executedPlan(brute)
    assert(brutePlan.contains("CartesianProduct") || brutePlan.contains("BroadcastNestedLoopJoin"))
  }

  test("q_edge_log_prune: the date slice prunes partitions at the scan") {
    val q = SparkEntry.queries("q_edge_log_prune")(spark, dir)
    val plan = executedPlan(q)
    assert(plan.contains("PartitionFilters") && plan.contains("dt"),
      "expected the dt predicate as a partition filter at the scan:\n" + plan.take(2000))
    // the slice is a strict subset: the scan must NOT read all partitions
    val partLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(partLine.contains("2024-01-08") || partLine.contains("dt"), partLine)
    assert(q.count() > 0L)
  }

  test("stripBoilerplate never shuffles the corpus side") {
    import graft.functions.TextOps
    val docs = Tpch.table(spark, dir, "documents")
    val grams = TextOps.boilerplateGrams(docs, "doc_id", "text", k = 3, minDf = 5L)
    val stripped = TextOps.stripBoilerplate(docs, "doc_id", "text", grams)
    stripped.collect() // finalize AQE stages
    val plan = executedPlan(stripped)
    // the inventory collapses to one broadcast row; the docs scan feeds a
    // BroadcastNestedLoopJoin (1-row build side: a constant-cost probe, not
    // an all-pairs hazard) with NO Exchange on the corpus branch
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "expected a broadcast of the 1-row gram inventory:\n" + plan.take(2000))
    // in the printed tree the streamed corpus child (`:-`) sits between the
    // BNLJ line and the build-side BroadcastExchange; the gram inventory
    // branch below it shuffles legitimately (count-distinct on gram, doc_id)
    val start = plan.indexOf("BroadcastNestedLoopJoin")
    val end = plan.indexOf("BroadcastQueryStage", start) max plan.indexOf("BroadcastExchange", start)
    val corpusBranch = plan.substring(start, if (end > start) end else plan.length)
    assert(!corpusBranch.contains("Exchange hashpartitioning"),
      "corpus side of the strip join must not shuffle:\n" + corpusBranch.take(2000))
  }

  test("mixtureSample is a pure scan predicate: zero Exchange, zero shuffle") {
    import graft.pipeline.Corpus
    val docs = Tpch.table(spark, dir, "documents")
    val sampled = Corpus.mixtureSample(docs, col("lang"), col("doc_id"),
      Seq("en" -> 2500, "de" -> 10000), defaultBp = 1250)
    sampled.collect()
    val plan = executedPlan(sampled)
    // the whole mixture decision rides the scan's filter: at 100 TB the op
    // costs exactly one read, never a shuffle or a second pass per stratum
    assert(!plan.contains("Exchange"),
      "mixture sampling must not shuffle:\n" + plan.take(2000))
    // the weight-proportional sibling rides the scan the same way
    val ws = Corpus.weightedSample(docs, col("doc_id"), col("n_chars"), wMax = 1000L)
    ws.collect()
    assert(!executedPlan(ws).contains("Exchange"),
      "weighted sampling must not shuffle:\n" + executedPlan(ws).take(2000))
  }

  test("sq8Encode is a zero-Exchange zero-Join scan pass (literal codec)") {
    import graft.sim.Ann
    val vecs = Tpch.table(spark, dir, "embeddings")
    val (mins, rgs) = Ann.trainSq8(vecs, "vec_id", "embedding")
    val enc = Ann.sq8Encode(vecs, "vec_id", "embedding", mins, rgs)
    enc.collect()
    // the codec rides the plan as literal arrays: at 100 TB the encode
    // pass costs one read — no join, no shuffle, stream-applicable
    val plan = executedPlan(enc)
    assert(!plan.contains("Exchange"),
      "sq8 encode must not shuffle:\n" + plan.take(2000))
    assert(!plan.contains("Join"),
      "sq8 encode must not join:\n" + plan.take(2000))
  }

  test("ivfPqTopK candidates come from the cell equi-join, never all pairs") {
    import graft.sim.Ann
    val vecs = Tpch.table(spark, dir, "embeddings")
    val q = Ann.ivfPqTopK(vecs, "vec_id", "embedding", kTop = 3,
      querySide = _.where(col("id") < 100), nlist = 16, nprobe = 4)
    q.collect()
    val plan = executedPlan(q)
    // the only all-pairs-shaped op allowed is the broadcast against the
    // 16-row leader table (the semanticDedup rule); candidate scoring joins
    // are keyed on cell / id_n / id_q
    assert(!plan.contains("CartesianProduct"),
      "ivf-pq search must never build an all-pairs join:\n" + plan.take(3000))
  }

  test("ivfPqResTopK stays keyed: anchors ride as literals, ADC joins on (id_q, cell)") {
    import graft.sim.Ann
    val vecs = Tpch.table(spark, dir, "embeddings")
    val q = Ann.ivfPqResTopK(vecs, "vec_id", "embedding", kTop = 3,
      querySide = _.where(col("id") < 100), nlist = 16, nprobe = 4)
    q.collect()
    val plan = executedPlan(q)
    // the residual variant adds only literal-anchor projections and the
    // (id_q, cell)-keyed ADC join on top of the raw plan — still never an
    // all-pairs shape (the broadcast against the 16-row leader table is
    // the one allowed exception, the ivfPqTopK rule)
    assert(!plan.contains("CartesianProduct"),
      "residual ivf-pq search must never build an all-pairs join:\n" + plan.take(3000))
  }

  test("grepMany and pHashPairs join keyed: no cartesian, no BNLJ") {
    import graft.functions.TextOps
    val docs = Tpch.table(spark, dir, "documents")
    val spark2 = spark; import spark2.implicits._
    val pats = Seq("merge batch", "hash join", "qqqqzz").toDF("pattern")
    val gm = TextOps.grepMany(TextOps.trigramIndex(docs, "doc_id", "text"),
      docs, "doc_id", "text", pats)
    gm.collect()
    val gmPlan = executedPlan(gm)
    // posting join keyed on gram, candidates on (pattern, doc), verify on
    // doc_id — the contains predicate FILTERS a keyed join, it never
    // becomes the join condition of a nested loop
    assert(!gmPlan.contains("CartesianProduct") &&
      !gmPlan.contains("BroadcastNestedLoopJoin"),
      "grepMany must stay keyed:\n" + gmPlan.take(3000))
    val ph = graft.multimodal.Multimodal.pHashPairs(
      graft.multimodal.Multimodal.withPayload(docs, "doc_id", "text"), maxHam = 3)
    ph.collect()
    val phPlan = executedPlan(ph)
    assert(!phPlan.contains("CartesianProduct") &&
      !phPlan.contains("BroadcastNestedLoopJoin"),
      "pHashPairs candidates must come from the band equi-join:\n" + phPlan.take(3000))
  }

  test("pqEncode is a zero-Exchange zero-Join scan pass (literal codebooks)") {
    import graft.sim.Ann
    val vecs = Tpch.table(spark, dir, "embeddings")
    val books = Ann.pqTrain(vecs, "vec_id", "embedding", m = 4, k = 4, iters = 2)
    val enc = Ann.pqEncode(vecs, "vec_id", "embedding", books)
    enc.collect()
    val plan = executedPlan(enc)
    assert(!plan.contains("Exchange"),
      "pq encode must not shuffle:\n" + plan.take(2000))
    assert(!plan.contains("Join"),
      "pq encode must not join:\n" + plan.take(2000))
  }

  test("kmeans assignment is a zero-Exchange scan pass; clusterSample pre-trims map-side") {
    import graft.sim.Ann
    val vecs = Tpch.table(spark, dir, "embeddings")
    val assigned = Ann.kmeans(vecs, "vec_id", "embedding", k = 4, iters = 3)
    assigned.collect()
    // the centroids are LITERALS in the plan, so the final assignment is a
    // pure projection over the checkpointed quantized corpus: at 100 TB
    // the labeling pass costs one read — no join, no window, no shuffle
    val plan = executedPlan(assigned)
    assert(!plan.contains("Exchange"),
      "kmeans assignment must not shuffle:\n" + plan.take(2000))
    assert(!plan.contains("Join"),
      "kmeans assignment must not join:\n" + plan.take(2000))
    // the per-cluster cap compiles to the domainCap shape: a PARTIAL
    // WindowGroupLimit pre-trims each task to cap rows per cluster
    val sampled = Ann.clusterSample(vecs, "vec_id", "embedding", k = 4, iters = 3, cap = 5)
    sampled.collect()
    val capPlan = executedPlan(sampled)
    assert(capPlan.contains("WindowGroupLimit") && capPlan.contains("Partial"),
      "expected a map-side partial group limit:\n" + capPlan.take(3000))
  }

  test("domainCap pre-trims map-side (WindowGroupLimit); semanticDedup has no cartesian") {
    import graft.pipeline.Corpus
    val docs = Tpch.table(spark, dir, "documents")
    val capped = Corpus.domainCap(docs, col("source"), col("doc_id"), cap = 3)
    capped.collect()
    val capPlan = executedPlan(capped)
    // the rank filter compiles to a PARTIAL WindowGroupLimit before the
    // shuffle: every task sends at most cap rows per domain, so a hot
    // domain reaches its reducer as tasks*cap rows, never its total
    assert(capPlan.contains("WindowGroupLimit") && capPlan.contains("Partial"),
      "expected a map-side partial group limit:\n" + capPlan.take(3000))
    assert(!capPlan.contains("Exchange rangepartitioning"),
      "domainCap must never global-sort:\n" + capPlan.take(2000))
    val vecs = Tpch.table(spark, dir, "embeddings")
    val sd = graft.sim.Ann.semanticDedup(vecs, "vec_id", "embedding",
      tauPm = 450, nlist = 16)
    sd.collect()
    val sdPlan = executedPlan(sd)
    // candidate generation is the cell equi-join; the only all-pairs-shaped
    // op allowed is the broadcast against the 16-row leader table
    assert(!sdPlan.contains("CartesianProduct"),
      "semanticDedup must never build an all-pairs join:\n" + sdPlan.take(3000))
  }

  test("gopherQuality is zero-shuffle; dupSpanCoverage joins keyed (no cartesian)") {
    import graft.functions.TextOps
    val docs = Tpch.table(spark, dir, "documents")
    val gq = TextOps.gopherQuality(docs, "doc_id", "text")
    gq.collect()
    val gqPlan = executedPlan(gq)
    // every Gopher rule is column algebra over the one scan: at 100 TB the
    // gate costs exactly one read — no shuffle, no second pass
    assert(!gqPlan.contains("Exchange"),
      "gopher quality gate must not shuffle:\n" + gqPlan.take(2000))
    val sc = graft.dedup.Dedup.dupSpanCoverage(docs, "doc_id", "text", k = 3, minDf = 2L)
    sc.collect()
    val scPlan = executedPlan(sc)
    // candidate generation is the gram-keyed semi join; coverage is doc-keyed
    // windows — never an all-pairs shape
    assert(!scPlan.contains("CartesianProduct") &&
      !scPlan.contains("BroadcastNestedLoopJoin"),
      "span coverage must never build an all-pairs join:\n" + scPlan.take(3000))
    assert(scPlan.contains("LeftSemi"),
      "dup-span filter should be a semi join:\n" + scPlan.take(3000))
  }

  test("lookahead compiles to a left-semi join, negLookahead to left-anti") {
    val g = Tpch.load(spark, dir)
    val semi = g.ofKind("customer").lookahead(_.in("order_customer")).df
    assert(executedPlan(semi).toLowerCase.contains("leftsemi"))
    val anti = g.ofKind("customer").negLookahead(_.in("order_customer")).df
    assert(executedPlan(anti).toLowerCase.contains("leftanti"))
  }

  test("incrementalExact plans one batch agg + a hash-keyed anti join against the store") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val store = graft.dedup.Dedup
      .exact(docs.where(col("doc_id") % 2 === 0), "doc_id", "text")
      .select(col("h"), col("keep_id"))
    val (kept, _) = graft.dedup.Dedup.incrementalExact(
      docs.where(col("doc_id") % 2 === 1), "doc_id", "text", store)
    val plan = executedPlan(kept).toLowerCase
    assert(plan.contains("leftanti"), "store exclusion must be an anti join")
    assert(!plan.contains("cartesian") && !plan.contains("broadcastnestedloop"),
      "no unkeyed join anywhere in the incremental dedup plan")
  }

  test("sparseCosinePairs is keyed through the inverted index: no cartesian/BNLJ") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = executedPlan(
      graft.sim.Ann.sparseCosinePairs(docs, "doc_id", "text", maxDf = 50, minCos2Ppm = 500000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "sparse cosine must meet only through the term join:\n" + plan.take(3000))
  }

  test("bloomFilter probe side is a pure scan predicate: zero Exchange, zero joins") {
    import graft.functions.Sketch
    val spark2 = spark; import spark2.implicits._
    val members = (1L to 100L).toDF("k")
    val bits = Sketch.bloomBuild(members, col("k"), m = 4096, k = 4)
    val probe = spark.read.parquet(s"$dir/orders.parquet")
    val plan = executedPlan(Sketch.bloomFilter(probe, col("o_custkey"), bits, 4096, 4))
    assert(!plan.contains("Exchange"),
      "the bloom probe must filter at the scan, never shuffle:\n" + plan.take(2000))
    assert(!plan.toLowerCase.contains("join"),
      "the packed-literal predicate needs no join:\n" + plan.take(2000))
  }

  test("motif compiles to keyed joins: no cartesian, negation is left-anti") {
    val g = Tpch.load(spark, dir)
    val diamond = g.motif(
      "(l)-[lineitem_order]->(o); (o)-[order_customer]->(c); " +
      "(c)-[customer_nation]->(n); (l)-[lineitem_supplier]->(sp); " +
      "(sp)-[supplier_nation]->(n)")
    val dPlan = executedPlan(diamond)
    assert(!dPlan.contains("CartesianProduct") && !dPlan.contains("BroadcastNestedLoopJoin"),
      "the motif diamond must stay a keyed hash-join cascade:\n" + dPlan.take(3000))
    val neg = g.motif("(c)-[customer_nation]->(n); !()-[order_customer]->(c)")
    assert(executedPlan(neg).toLowerCase.contains("leftanti"),
      "motif negation must compile to a left-anti join")
  }

  test("chunkDocs / upsampleEpochs / splitAssign are zero-Exchange scan passes") {
    import graft.pipeline.Corpus
    val docs = Tpch.table(spark, dir, "documents")
    for ((name, df) <- Seq(
        "chunkDocs" -> Corpus.chunkDocs(docs, "doc_id", "text", size = 8, stride = 4),
        "upsampleEpochs" -> Corpus.upsampleEpochs(docs.select("doc_id", "source"),
          col("source"), Seq("src0" -> 3, "src2" -> 0)),
        "splitAssign" -> Corpus.splitAssign(docs.select("doc_id"), col("doc_id"),
          Seq("train" -> 9000, "val" -> 500, "test" -> 500)))) {
      df.collect()
      val plan = executedPlan(df)
      // each is pure per-row column algebra: at 100 TB the op costs exactly
      // one read — no shuffle, no second pass
      assert(!plan.contains("Exchange"),
        s"$name must not shuffle:\n" + plan.take(2000))
    }
  }

  test("rangeJoin plans as an equi-join on buckets, never BNLJ/cartesian") {
    import graft.plans.Scale
    val ev = Tpch.events(spark, dir).select(unix_micros(col("ts")).as("t"))
    val t0 = ev.agg(min("t")).head().getLong(0)
    val h = 3600000000L
    val wins = spark.range(0, 24).select(col("id").as("win"),
      (lit(t0) + col("id") * (h * 9 / 4)).as("lo"),
      (lit(t0) + col("id") * (h * 9 / 4) + h * 5 / 2).as("hi"))
    val rj = Scale.rangeJoin(ev, "t", wins, "lo", "hi", grain = h)
    rj.collect()
    val plan = executedPlan(rj)
    // a raw BETWEEN join predicate would plan as BroadcastNestedLoopJoin —
    // the bucket explode keeps the join keyed at any interval-table size
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      "rangeJoin must stay a keyed join:\n" + plan.take(2000))
  }

  test("winnowFingerprints is a zero-Exchange scan pass") {
    import graft.functions.TextOps
    val docs = Tpch.table(spark, dir, "documents")
    val fp = TextOps.winnowFingerprints(docs, "doc_id", "text")
    fp.collect()
    // gram hashing, window minima, AND the per-doc dedup are all per-row
    // array algebra: the span index of a 100 TB corpus costs one read
    assert(!executedPlan(fp).contains("Exchange"),
      "winnowFingerprints must not shuffle:\n" + executedPlan(fp).take(2000))
  }

  test("buildVocab and bm25Rank take top-k without a global sort") {
    import graft.functions.TextOps
    val docs = Tpch.table(spark, dir, "documents")
    val vocab = TextOps.buildVocab(docs, "text", vocabSize = 16)
    vocab.collect()
    val vPlan = executedPlan(vocab)
    // the unigram table is never globally sorted: the cut is a streaming
    // top-K (TakeOrderedAndProject); only the K surviving rows see a window
    assert(vPlan.contains("TakeOrderedAndProject"),
      "vocab cut should be TakeOrderedAndProject:\n" + vPlan.take(3000))
    val bm = TextOps.bm25Rank(docs, "doc_id", "text", Seq("dup", "hash"), k = 20)
    bm.collect()
    val bPlan = executedPlan(bm)
    assert(bPlan.contains("TakeOrderedAndProject"),
      "bm25 rank should be TakeOrderedAndProject:\n" + bPlan.take(3000))
  }

  test("trainOrder ranks inside hash-bucket windows, never a global range sort") {
    import graft.pipeline.Corpus
    val ordered = Corpus.trainOrder(
      Tpch.table(spark, dir, "documents").select("doc_id"), "doc_id", "ep0")
    ordered.collect()
    val plan = executedPlan(ordered)
    // the permutation is exact yet assembled from bucket-partitioned
    // windows + broadcast offsets: a rangepartitioning Exchange here would
    // mean the op degenerated to the global sort it exists to avoid
    assert(!plan.contains("Exchange rangepartitioning"),
      "trainOrder must not global-sort:\n" + plan.take(3000))
    assert(plan.contains("hashpartitioning"),
      "expected bucket-hash partitioning for the rank windows:\n" + plan.take(3000))
    // negativeSamples inherits the shape: its successor lookup must stay a
    // position-KEYED equi-join on top of the same no-global-sort ranking
    val negs = Corpus.negativeSamples(
      Tpch.table(spark, dir, "documents").select("doc_id"), "doc_id", k = 2, seed = "s")
    negs.collect()
    val nplan = executedPlan(negs)
    assert(!nplan.contains("Exchange rangepartitioning"),
      "negativeSamples must not global-sort:\n" + nplan.take(3000))
    assert(!nplan.contains("BroadcastNestedLoopJoin") && !nplan.contains("CartesianProduct"),
      "successor lookup must stay a keyed join:\n" + nplan.take(3000))
  }

  test("butterflyCount wedge join is keyed (no cartesian); hll/dsir stay keyed aggregations") {
    val bf = SparkEntry.queries("q_butterflies")(spark, dir)
    bf.collect()
    val bfPlan = executedPlan(bf)
    // exactly ONE non-keyed join is legitimate: the final 1-row × 1-row
    // (wedges, butterflies) combine. The wedge enumeration itself must stay
    // an equi-join on the shared right vertex. (AdaptiveSparkPlan prints
    // final + initial plans — count only the final section.)
    val finalSection = bfPlan.split("== Initial Plan ==").head
    val nonKeyed = "CartesianProduct|BroadcastNestedLoopJoin".r
      .findAllIn(finalSection).size
    assert(nonKeyed <= 1, s"wedge join went cartesian ($nonKeyed non-keyed joins):\n" +
      bfPlan.take(3000))
    assert(bfPlan.contains("hashpartitioning") || bfPlan.contains("BroadcastHashJoin"),
      "expected keyed wedge join:\n" + bfPlan.take(3000))
    // hll: the sketch is ONE keyed max-agg — no join until the 64-row
    // range fill; the input side never joins row-to-row
    val hll = SparkEntry.queries("q_hll")(spark, dir)
    hll.collect()
    val hllPlan = executedPlan(hll)
    assert(!hllPlan.contains("CartesianProduct"),
      "hll must not cartesian:\n" + hllPlan.take(3000))
    // dsir: the bucket distribution table joins back BROADCAST (fixed-size
    // by construction) — the corpus side never shuffles for the join
    val ds = SparkEntry.queries("q_dsir")(spark, dir)
    ds.collect()
    val dsPlan = executedPlan(ds)
    assert(dsPlan.contains("BroadcastHashJoin"),
      "dsir bucket join must broadcast:\n" + dsPlan.take(3000))
  }
}
