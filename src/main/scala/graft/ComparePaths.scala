package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B: guarded-local vs distributed paths on the sf0.1 graph. */
object ComparePaths {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    implicit val sp: SparkSession = spark
    spark.sparkContext.setLogLevel("WARN")
    graph.Tpch.shareScans = true
    val gr = graph.Tpch.load(spark, dir)
    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[cmp] $tag rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
    }
    // small pair-graph shape (the dedup-cluster CC case): ~5k edges
    val smallE = spark.range(5000).selectExpr("id as src", "id % 977 as dst")
      .localCheckpoint(true)
    val smallV = spark.range(5000).selectExpr("id").localCheckpoint(true)
    time("cc_small_local") { algos.Algos.connectedComponents(smallV, smallE,
      localMaxEdges = Long.MaxValue).count() }
    time("cc_small_dist") { algos.Algos.connectedComponents(smallV, smallE, localMaxEdges = 0L).count() }
    val midE = spark.range(50000).selectExpr("id as src", "id % 9973 as dst")
      .localCheckpoint(true)
    val midV = spark.range(50000).selectExpr("id").localCheckpoint(true)
    time("cc_mid_local") { algos.Algos.connectedComponents(midV, midE,
      localMaxEdges = Long.MaxValue).count() }
    time("cc_mid_dist") { algos.Algos.connectedComponents(midV, midE, localMaxEdges = 0L).count() }
    val vs = gr.kind("customer").select("id").unionAll(gr.kind("orders").select("id"))
      .localCheckpoint(true)
    val oc = gr.edges.where(col("label") === "order_customer").select("src", "dst")
      .localCheckpoint(true)
    // guard = MaxValue FORCES the local replay regardless of the measured
    // 50k default (these arms exist to re-measure the crossover, so they
    // must not silently collapse onto the distributed path)
    time("cc_local") { algos.Algos.connectedComponents(vs, oc,
      localMaxEdges = Long.MaxValue).count() }
    time("cc_dist") { algos.Algos.connectedComponents(vs, oc, localMaxEdges = 0L).count() }
    val allV = gr.vertices.select("id").localCheckpoint(true)
    val allE = gr.edges.select("src", "dst").localCheckpoint(true)
    time("topo_local") { algos.Algos.topoLevels(allV, allE, maxIter = 4,
      localMaxEdges = Long.MaxValue).count() }
    time("topo_dist") { algos.Algos.topoLevels(allV, allE, maxIter = 4, localMaxEdges = 0L).count() }
    val asia = gr.kind("region").where(col("r_name") === "ASIA").select("id")
      .localCheckpoint(true)
    val t = graph.Vid.tag("lineitem")
    val wedges = gr.edges.localCheckpoint(true)
    graph.Tpch.shareScans = false // relax memo off: measure compute both times
    time("accept_local") {
      algos.Algos.cheapestAccepted(wedges, asia,
        coalesce(col("quantity").cast("long"), lit(1L)),
        accept = col("id") >= t * graph.Vid.SPAN && col("id") < (t + 1) * graph.Vid.SPAN,
        reverse = true, maxIter = 8, localMaxEdges = Long.MaxValue).count()
    }
    time("accept_dist") {
      algos.Algos.cheapestAccepted(wedges, asia,
        coalesce(col("quantity").cast("long"), lit(1L)),
        accept = col("id") >= t * graph.Vid.SPAN && col("id") < (t + 1) * graph.Vid.SPAN,
        reverse = true, maxIter = 8, localMaxEdges = 0L).count()
    }
    spark.stop()
  }
}
