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
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        val n = df.count()
        val t2 = System.nanoTime()
        println(f"[timeq] $q rep$i ${(t2 - t0) / 1e9}%.3f s rows=$n " +
          f"(build ${(t1 - t0) / 1e9}%.3f, count ${(t2 - t1) / 1e9}%.3f)")
        System.gc()
      }
    }
    spark.stop()
  }
}
