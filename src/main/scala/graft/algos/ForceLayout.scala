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

  /** Returns (id, x, y) after `iters` rounds. */
  def run(vertices: DataFrame, edges: DataFrame, iters: Int = 30,
      attraction: Double = 0.05, repulsion: Double = 1.0, cell: Double = 2.0): DataFrame = {
    val idc = col(vertices.columns.head).as("id")
    var pos = vertices.select(idc)
      .withColumn("x", (pmod(xxhash64(col("id")), lit(10000L)) / 1000.0) - 5.0)
      .withColumn("y", (pmod(xxhash64(col("id") + 1), lit(10000L)) / 1000.0) - 5.0)
      .localCheckpoint(false)
    val e2 = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))

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
}
