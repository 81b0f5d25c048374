package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Scratch profiler for hot operators (not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graph.Tpch.shareScans = true // measure under Bench's scan-sharing regime
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = graph.Tpch.table(spark, dir, "documents")

    time("shingle only (native)") {
      docs.select(col("doc_id"), graft.functions.NativeOps.wordShingles(col("text"), 3).as("sh"))
        .select(sum(size(col("sh")))).head().getLong(0)
    }
    val raw = docs.select(col("doc_id").as("id"),
        graft.functions.NativeOps.wordShingles(col("text"), 3).as("sh0"))
      .where(size(col("sh0")) > 0).localCheckpoint(false)
    val ex = raw.select(col("id"), explode(col("sh0")).as("s"))
    time("dfreq") { ex.groupBy("s").agg(count(lit(1)).as("df")).count() }
    val dfreq = ex.groupBy("s").agg(count(lit(1)).as("df"))
    val base = ex.join(dfreq, "s").groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("df"), col("s")))),
        x => x.getField("s")).as("sh"))
      .withColumn("n", size(col("sh")))
      .withColumn("plen", col("n") - floor((col("n") * 5000 + 9999) / 10000).cast("int") + 1)
      .localCheckpoint(true)
    time("freq-sorted base (ckpt)") { base.count() }
    val prefix = base.select(col("id"), col("n"), explode(slice(col("sh"), lit(1), col("plen"))).as("s"))
    time("prefix rows") { prefix.count() }
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
        col("b.n") * 10000 >= lit(5000) * col("a.n") &&
        col("a.n") * 10000 >= lit(5000) * col("b.n"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    time("candidate pairs") { cands.count() }
    val cked = cands.localCheckpoint(true)
    time("rescore only") {
      cked
        .join(base.select(col("id").as("id_a"), col("sh").as("sha"), col("n").as("na")), "id_a")
        .join(base.select(col("id").as("id_b"), col("sh").as("shb"), col("n").as("nb")), "id_b")
        .withColumn("i", size(array_intersect(col("sha"), col("shb"))).cast("long"))
        .where(col("i") * 10000 >= lit(5000) * (col("na") + col("nb") - col("i")))
        .count()
    }
    time("full jaccard") {
      graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 5000).count()
    }
    time("minhash") {
      graft.dedup.Dedup.minhashLsh(docs, "doc_id", "text", 3, 64, 16, 5000).count()
    }
    time("minhash==jaccard symdiff") {
      val mh = graft.dedup.Dedup.minhashLsh(docs, "doc_id", "text", 3, 64, 16, 5000)
        .select("id_a", "id_b").localCheckpoint(false)
      val jc = graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 5000)
        .select("id_a", "id_b").localCheckpoint(false)
      mh.exceptAll(jc).count() + jc.exceptAll(mh).count()
    }
    val emb = graph.Tpch.table(spark, dir, "embeddings")
    time("ann_topk") {
      graft.sim.Ann.bruteTopK(emb, "vec_id", "embedding", 3, _.where(col("id") < 100)).count()
    }
    val gr = graph.Tpch.load(spark, dir)
    val asiaKey = graph.Tpch.table(spark, dir, "region")
      .where(col("r_name") === "ASIA").select("r_regionkey").head().getInt(0)
    val entry = graph.Vid.tag("region") * graph.Vid.SPAN + asiaKey
    val te = gr.transpose.edges
    time("dom: reachableEdges") { algos.Algos.reachableEdges(entry, te).count() }
    time("dom: collect") {
      import spark.implicits._
      algos.Algos.reachableEdges(entry, te).as[(Long, Long)].collect().length.toLong
    }
    time("dom: full idom") { algos.Algos.immediateDominators(entry, te).count() }

    // q_between / q_deepest breakdown
    {
      import spark.implicits._
      implicit val sp: SparkSession = spark
      val asiaNations = graph.Tpch.table(spark, dir, "nation").where(col("n_regionkey") === asiaKey)
      val from = graph.Tpch.table(spark, dir, "customer")
        .join(asiaNations.select(col("n_nationkey")), col("c_nationkey") === col("n_nationkey"))
        .select(graph.Vid.vid("customer", col("c_custkey")).as("id"))
      val to = spark.range(1).select(lit(entry).as("id"))
      time("between: fwd bfs only") {
        algos.Algos.bfsDistances(gr.vertices.select("id"), gr.edges, from, maxIter = 2).count()
      }
      time("between: bwd bfs only") {
        algos.Algos.bfsDistances(gr.vertices.select("id"), gr.edges, to, reverse = true, maxIter = 4).count()
      }
      time("between: full concurrent") {
        algos.Algos.verticesBetween(gr.vertices.select("id"), gr.edges, from, to, 2, 4).count()
      }
      time("deepest: run only (acyclic)") {
        graph.Descend.run(gr, gr.kind("region").select("id"), Nil, forward = false,
          maxDepth = 4, checkpointEvery = 1, acyclic = true).count()
      }
      time("deepest: full") {
        graph.Descend.deepest(gr, gr.kind("region").select("id"), Nil, forward = false,
          maxDepth = 4, acyclic = true).count()
      }
      time("shortest_weighted") {
        algos.Algos.weightedShortestPath(gr.edges,
          gr.kind("region").where(col("r_name") === "ASIA").select("id"),
          coalesce(col("quantity").cast("long"), lit(1L)), reverse = true, maxIter = 8).count()
      }
      // LSH parameterization sweep: recall must be EXACTLY complete for the
      // oracled query; report sym-diff vs brute + wall time per config
      val brute = graft.sim.Ann.cosinePairs(emb, "vec_id", "embedding", tauPm = 450)
        .select("id_a", "id_b").localCheckpoint(false)
      for ((nb, bands) <- Seq((16, 16), (32, 16), (24, 24))) {
        time(s"lsh nb=$nb bands=$bands symdiff") {
          val lsh = graft.sim.Ann.lshPairs(emb, "vec_id", "embedding", dim = 64,
              tauPm = 450, numBits = nb, bands = bands)
            .select("id_a", "id_b").localCheckpoint(false)
          brute.exceptAll(lsh).count() + lsh.exceptAll(brute).count()
        }
      }
    }
    // --- q_token_budget stage bisect -------------------------------------
    {
      val toks = TextOps.tokens(col("text"))
      val scored = docs.select(col("doc_id"),
        (lit(10000L) - TextOps.repetitionBp(toks, 2)).as("score"),
        size(toks).cast("long").as("n_tok"))
      time("tb: scored count") { scored.count() }
      val base = scored.select(col("doc_id"), col("score"), col("n_tok"),
          substring(md5(col("doc_id").cast("string")), 1, 4).as("__h16"))
        .localCheckpoint(eager = false)
      time("tb: hist collect") {
        base.groupBy("score").agg(sum("n_tok")).collect().length.toLong
      }
      time("tb: hist collect again") {
        base.groupBy("score").agg(sum("n_tok")).collect().length.toLong
      }
      time("tb: full tokenBudget") {
        graft.pipeline.Corpus.tokenBudget(scored, "doc_id", "score", "n_tok", 12000L).count()
      }
      time("tb: full again") {
        graft.pipeline.Corpus.tokenBudget(scored, "doc_id", "score", "n_tok", 12000L).count()
      }
      // variant: token array materialized once in a preceding projection
      val scored2 = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("__ts"))
        .select(col("doc_id"),
          (lit(10000L) - TextOps.repetitionBp(col("__ts"), 2)).as("score"),
          size(col("__ts")).cast("long").as("n_tok"))
      time("tb2: full (pre-tokenized)") {
        graft.pipeline.Corpus.tokenBudget(scored2, "doc_id", "score", "n_tok", 12000L).count()
      }
      time("tb2: again") {
        graft.pipeline.Corpus.tokenBudget(scored2, "doc_id", "score", "n_tok", 12000L).count()
      }
      // and with the input spread over the cores first (the small-file
      // single-partition artifact)
      val scored3 = docs.repartition(32)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__ts"))
        .select(col("doc_id"),
          (lit(10000L) - TextOps.repetitionBp(col("__ts"), 2)).as("score"),
          size(col("__ts")).cast("long").as("n_tok"))
      time("tb3: full (pretok + 32 parts)") {
        graft.pipeline.Corpus.tokenBudget(scored3, "doc_id", "score", "n_tok", 12000L).count()
      }
    }
    spark.stop()
  }
}
