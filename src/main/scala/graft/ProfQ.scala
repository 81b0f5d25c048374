package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Scratch per-query job profiler (not part of the driver contract):
  * `runMain graft.ProfQ <query>[,<query>…]` prints, for ONE warm run of each
  * query, the job/stage/task counts and the aggregate task time vs wall —
  * separating "many tiny scheduled jobs" (iterative floor) from "real
  * compute" so head-query tuning attacks the right axis. */
object ProfQ {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graph.Tpch.shareScans = true
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    args(0).split(",").foreach { q =>
      val fn = SparkEntry.queries(q)
      fn(spark, dir).count() // warm-up: scan caches, JIT, shuffle files
      System.gc()
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener drain
      println(f"[profq] $q%-26s wall=$wall%7.2f s  jobs=${jobs.get}%4d stages=${stages.get}%5d " +
        f"tasks=${tasks.get}%6d taskTime=${taskMs.get / 1e3}%8.1f s  par=${taskMs.get / 1e3 / wall}%5.1f  rows=$n")
    }
    spark.stop()
  }
}
