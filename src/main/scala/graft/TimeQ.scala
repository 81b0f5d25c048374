package graft

import org.apache.spark.sql.SparkSession

/** Scratch per-query timer: `runMain graft.TimeQ <query> [reps]`. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graph.Tpch.shareScans = true
    args(0).split(",").foreach { q =>
      val fn = SparkEntry.queries(q)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"[timeq] $q rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
        System.gc()
      }
    }
    spark.stop()
  }
}
