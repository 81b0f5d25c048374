package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{PropertyGraph, Tpch, Traversal, Vid}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def g(s: SparkSession, dir: String): PropertyGraph = Tpch.load(s, dir)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_out_path2")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 out: nation -> region (1 hop, bag semantics = FK join)
    "q_out" -> ((s, dir) => {
      g(s, dir).ofKind("nation").props("nation")
        .out("nation_region").props("region")
        .df.select("n_name", "r_name")
    }),
    // §2.2 out 2-hop: customer -> nation -> region
    "q_out_path2" -> ((s, dir) => {
      val gr = g(s, dir)
      gr.from(gr.kind("customer").select("id", "c_custkey"))
        .out("customer_nation").out("nation_region").props("region")
        .df.select("c_custkey", "r_name")
    }),
    // §2.2 in: region <- nations (reverse traversal)
    "q_in" -> ((s, dir) => {
      g(s, dir).ofKind("region").props("region")
        .in("nation_region").props("nation")
        .df.select("r_name", "n_name")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_out" ->
      "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey",
    "q_out_path2" ->
      "SELECT c_custkey, r_name FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey",
    "q_in" ->
      "SELECT r_name, n_name FROM region JOIN nation ON n_regionkey = r_regionkey"
  )
}
