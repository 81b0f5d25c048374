package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Force-directed graph layout — the Spark re-expression of the reference's
  * Force-Atlas-derived engine (fermor force_atlas.clj / force_atlas/graph.clj).
  *
  * The reference iterates spring + repulsion forces over in-heap vertex
  * arrays. Distributed re-design:
  *  - attraction: one equi-join positions⋈edges per iteration, aggregated
  *    per vertex (map-side combine) — shuffle keyed by vertex id;
  *  - repulsion: NOT all-pairs — vertices are bucketed into grid cells and
  *    repulse from per-cell centroids (a Barnes-Hut-flavored approximation),
  *    so each iteration is O(V + cells) with the centroid table broadcast;
  *  - deterministic: initial positions derive from xxhash64(id), no RNG
  *    state, so layouts are reproducible across runs and engines.
  * Each iteration localCheckpoints to keep lineage flat (same pattern as
  * [[Algos.topoLevels]]).
  */
object ForceLayout {

  /** Returns (id, x, y) after `iters` rounds.
    *
    * Layout graphs come in two regimes, and like [[Algos.immediateDominators]]
    * we pick the execution site per regime: at or below `localMax` vertices
    * (the reference's own regime — fermor lays out in-heap arrays,
    * force_atlas/graph.clj) the whole loop runs on driver arrays — one
    * collect, zero per-iteration jobs; above it, the distributed
    * join+grid-centroid path below, whose per-iteration cost is O(V + cells)
    * and which survives graphs that don't fit one heap. */
  def run(vertices: DataFrame, edges: DataFrame, iters: Int = 30,
      attraction: Double = 0.05, repulsion: Double = 1.0, cell: Double = 2.0,
      localMax: Long = 100000): DataFrame = {
    val idc = col(vertices.columns.head).as("id")
    var pos = vertices.select(idc)
      .withColumn("x", (pmod(xxhash64(col("id")), lit(10000L)) / 1000.0) - 5.0)
      .withColumn("y", (pmod(xxhash64(col("id") + 1), lit(10000L)) / 1000.0) - 5.0)
      .localCheckpoint(false)
    val e2 = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))

    if (pos.count() <= localMax)
      return runLocal(pos, e2, iters, attraction, repulsion, cell)

    var i = 0
    while (i < iters) {
      val step = 0.9 * math.pow(0.95, i) // cooling
      // attraction along edges: pull each vertex toward its neighbors
      val withNbr = pos.as("p").join(e2, col("p.id") === col("src"))
        .join(pos.select(col("id").as("nid"), col("x").as("nx"), col("y").as("ny")),
          col("dst") === col("nid"))
      val att = withNbr.groupBy(col("p.id").as("id"))
        .agg(avg(col("nx") - col("p.x")).as("ax"), avg(col("ny") - col("p.y")).as("ay"))
      // repulsion from grid-cell centroids
      val cells = pos
        .withColumn("cx", floor(col("x") / cell)).withColumn("cy", floor(col("y") / cell))
        .groupBy("cx", "cy")
        .agg(avg("x").as("mx"), avg("y").as("my"), count(lit(1)).as("m"))
      val rep = pos.crossJoin(broadcast(cells))
        .withColumn("dx", col("x") - col("mx"))
        .withColumn("dy", col("y") - col("my"))
        .withColumn("d2", col("dx") * col("dx") + col("dy") * col("dy") + lit(0.01))
        .groupBy("id")
        .agg(sum(col("m") * col("dx") / col("d2")).as("rx"),
             sum(col("m") * col("dy") / col("d2")).as("ry"))
      pos = pos.join(att, Seq("id"), "left").join(rep, Seq("id"), "left")
        .select(col("id"),
          (col("x") + lit(step) * (lit(attraction) * coalesce(col("ax"), lit(0.0)) +
            lit(repulsion) * coalesce(col("rx"), lit(0.0)))).as("x"),
          (col("y") + lit(step) * (lit(attraction) * coalesce(col("ay"), lit(0.0)) +
            lit(repulsion) * coalesce(col("ry"), lit(0.0)))).as("y"))
        .localCheckpoint(false)
      i += 1
    }
    pos
  }

  /** Driver-array loop — identical force model to the distributed path
    * (avg-toward-neighbors attraction, grid-cell-centroid repulsion, same
    * cooling schedule); deterministic by fixed iteration order. */
  private def runLocal(pos0: DataFrame, e2: DataFrame, iters: Int,
      attraction: Double, repulsion: Double, cell: Double): DataFrame = {
    val spark = pos0.sparkSession
    import spark.implicits._
    val rows = pos0.select("id", "x", "y").as[(Long, Double, Double)].collect().sortBy(_._1)
    val ids = rows.map(_._1)
    val idx = ids.zipWithIndex.toMap
    val x = rows.map(_._2); val y = rows.map(_._3)
    val nbrs: Array[Array[Int]] = {
      val raw = e2.select("src", "dst").as[(Long, Long)].collect()
      val b = Array.fill(ids.length)(scala.collection.mutable.ArrayBuffer[Int]())
      raw.foreach { case (s, d) =>
        (idx.get(s), idx.get(d)) match {
          case (Some(si), Some(di)) => b(si) += di
          case _ => ()
        }
      }
      b.map(_.sorted.toArray)
    }
    var i = 0
    while (i < iters) {
      val step = 0.9 * math.pow(0.95, i)
      // grid centroids (repulsion approximation — same cells as distributed)
      val cells = scala.collection.mutable.LinkedHashMap[(Long, Long), (Double, Double, Long)]()
      var v = 0
      while (v < ids.length) {
        val key = (math.floor(x(v) / cell).toLong, math.floor(y(v) / cell).toLong)
        val (sx, sy, m) = cells.getOrElse(key, (0.0, 0.0, 0L))
        cells(key) = (sx + x(v), sy + y(v), m + 1)
        v += 1
      }
      val cellArr = cells.toArray.map { case (_, (sx, sy, m)) => (sx / m, sy / m, m.toDouble) }
      val nx = new Array[Double](ids.length); val ny = new Array[Double](ids.length)
      v = 0
      while (v < ids.length) {
        var ax = 0.0; var ay = 0.0
        val ns = nbrs(v)
        if (ns.nonEmpty) {
          var j = 0
          while (j < ns.length) { ax += x(ns(j)) - x(v); ay += y(ns(j)) - y(v); j += 1 }
          ax /= ns.length; ay /= ns.length
        }
        var rx = 0.0; var ry = 0.0
        var c = 0
        while (c < cellArr.length) {
          val (mx, my, m) = cellArr(c)
          val dx = x(v) - mx; val dy = y(v) - my
          val d2 = dx * dx + dy * dy + 0.01
          rx += m * dx / d2; ry += m * dy / d2
          c += 1
        }
        nx(v) = x(v) + step * (attraction * ax + repulsion * rx)
        ny(v) = y(v) + step * (attraction * ay + repulsion * ry)
        v += 1
      }
      System.arraycopy(nx, 0, x, 0, ids.length)
      System.arraycopy(ny, 0, y, 0, ids.length)
      i += 1
    }
    ids.indices.map(v => (ids(v), x(v), y(v))).toDF("id", "x", "y")
  }
}
