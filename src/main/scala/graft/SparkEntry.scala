package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{Descend, PropertyGraph, Tpch, Traversal, Vid}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry exercises one operator family from SURVEY.md §2 over the
  * TPC-H-ish property graph (see graft.graph.Tpch for the edge model).
  * Conventions (SURVEY.md §3): column aliases identical to the oracle SQL;
  * money sums go through exact integer cents (round(x*100) → long) so Spark
  * and DuckDB hash-match without float-order sensitivity.
  */
object SparkEntry {

  private def g(s: SparkSession, dir: String): PropertyGraph = Tpch.load(s, dir)

  /** Exact, order-insensitive money aggregation: double → integer cents. */
  private def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_out_path2")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.2 core hops -------------------------------------------------
    "q_out" -> ((s, dir) => {
      g(s, dir).ofKind("nation").props("nation")
        .out("nation_region").props("region")
        .df.select("n_name", "r_name")
    }),
    "q_out_path2" -> ((s, dir) => {
      val gr = g(s, dir)
      gr.from(gr.kind("customer").select("id", "c_custkey"))
        .out("customer_nation").out("nation_region").props("region")
        .df.select("c_custkey", "r_name")
    }),
    "q_in" -> ((s, dir) => {
      g(s, dir).ofKind("region").props("region")
        .in("nation_region").props("nation")
        .df.select("r_name", "n_name")
    }),
    "q_both" -> ((s, dir) => {
      g(s, dir).ofKind("nation").props("nation").both()
        .df.groupBy("n_name").agg(count(lit(1)).as("degree"))
    }),
    "q_out_e" -> ((s, dir) => {
      g(s, dir).ofKind("part").props("part")
        .inE("lineitem_part")
        .df.groupBy("p_name", "label")
        .agg(sum(col("quantity").cast("long")).as("sum_qty"))
    }),
    // ---- §2.2 filters ---------------------------------------------------
    "q_has_property" -> ((s, dir) => {
      g(s, dir).ofKind("customer").props("customer")
        .where(col("c_acctbal") > 9000)
        .out("customer_nation").props("nation")
        .df.select("c_custkey", "n_name")
    }),
    "q_one_of" -> ((s, dir) => {
      g(s, dir).ofKind("customer").props("customer")
        .where(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .df.select("c_custkey", "c_mktsegment")
    }),
    "q_range" -> ((s, dir) => {
      g(s, dir).ofKind("customer").props("customer")
        .where(col("c_custkey").between(100, 200))
        .df.select("c_custkey", "c_name")
    }),
    "q_documents" -> ((s, dir) => {
      g(s, dir).ofKind("supplier").props("supplier").df.select("s_name", "s_acctbal")
    }),
    "q_distinct" -> ((s, dir) => {
      g(s, dir).ofKind("customer")
        .hasProperty("customer", col("c_acctbal") > 9000)
        .out("customer_nation").distinctIds.props("nation")
        .df.select("n_name")
    }),
    // ---- §2.2 lookahead family -----------------------------------------
    "q_lookahead" -> ((s, dir) => {
      g(s, dir).ofKind("customer")
        .lookahead(_.in("order_customer").hasProperty("orders", col("o_totalprice") > 300000))
        .props("customer").df.select("c_custkey")
    }),
    "q_lookahead_minmax" -> ((s, dir) => {
      g(s, dir).ofKind("customer")
        .lookaheadCount(Some(5L), Some(10L))(_.in("order_customer"))
        .props("customer").df.select("c_custkey")
    }),
    "q_neg_lookahead" -> ((s, dir) => {
      g(s, dir).ofKind("customer")
        .negLookahead(_.in("order_customer"))
        .props("customer").df.select("c_custkey")
    }),
    // ---- §2.2 branch / gather / spread / pairs --------------------------
    "q_branch_merge" -> ((s, dir) => {
      g(s, dir).ofKind("nation").props("nation").branch(
        _.in("customer_nation").props("customer")
          .mapDf(_.select(col("id"), col("n_name"), col("c_name").as("member"))),
        _.in("supplier_nation").props("supplier")
          .mapDf(_.select(col("id"), col("n_name"), col("s_name").as("member")))
      ).df.select("n_name", "member")
    }),
    "q_gather_count" -> ((s, dir) => {
      g(s, dir).ofKind("customer").props("customer")
        .in("order_customer").props("orders")
        .df.groupBy("c_custkey")
        .agg(array_join(sort_array(collect_list(col("o_orderkey"))), ",").as("orders_csv"))
    }),
    "q_spread" -> ((s, dir) => {
      g(s, dir).ofKind("customer").props("customer")
        .in("order_customer").props("orders")
        .df.groupBy("c_custkey")
        .agg(collect_list(col("o_orderkey")).as("os"))
        .select(col("c_custkey"), explode(col("os")).as("o_orderkey"))
        .groupBy("c_custkey").agg(count(lit(1)).as("n_orders"))
    }),
    "q_make_pairs" -> ((s, dir) => {
      g(s, dir).ofKind("orders").props("orders")
        .out("order_customer").props("customer")
        .df.select("o_orderkey", "c_name")
    }),
    // ---- §2.2 section / siblings / sorted -------------------------------
    "q_section" -> ((s, dir) => {
      g(s, dir).ofKind("customer").props("customer")
        .in("order_customer").props("orders")
        .df.groupBy("c_custkey")
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("sum_price_cents"))
    }),
    "q_siblings" -> ((s, dir) => {
      g(s, dir).ofKind("orders").props("orders").tag("self")
        .out("order_customer").in("order_customer")
        .where(col("id") =!= col("self"))
        .df.groupBy("o_orderkey").agg(count(lit(1)).as("n_siblings"))
    }),
    "q_topk_per_group" -> ((s, dir) => {
      g(s, dir).ofKind("nation").props("nation")
        .in("customer_nation").props("customer")
        .topKPerGroup("n_name", 3)(col("c_acctbal").desc, col("c_custkey").asc)
        .df.select("n_name", "c_custkey")
    }),
    // ---- §2.2 paths / descend -------------------------------------------
    "q_path" -> ((s, dir) => {
      g(s, dir).ofKind("orders").withPaths
        .out("order_customer").out("customer_nation")
        .df.select(array_join(col("path"), "->").as("path_str"))
    }),
    "q_all_paths_to" -> ((s, dir) => {
      val gr = g(s, dir)
      Descend.allPathsTo(gr, gr.kind("customer").select("id"),
          Seq("customer_nation", "nation_region"), forward = true, maxDepth = 2,
          target = _.where(col("id") >= Vid.tag("region") * Vid.SPAN &&
                           col("id") < (Vid.tag("region") + 1) * Vid.SPAN))
        .select(array_join(col("path"), "->").as("path_str"), col("depth"))
    }),
    "q_descend_all" -> ((s, dir) => {
      val gr = g(s, dir)
      Descend.all(gr, gr.kind("region").select("id"), Nil, forward = false, maxDepth = 3)
    }),
    "q_deepest" -> ((s, dir) => {
      val gr = g(s, dir)
      Descend.deepest(gr, gr.kind("region").select("id"), Nil, forward = false, maxDepth = 4)
    }),
    // ---- §2.1 graph ops --------------------------------------------------
    "q_filter_graph" -> ((s, dir) => {
      g(s, dir).edgeSubgraph("customer_nation", "order_customer")
        .ofKind("nation").props("nation")
        .in("customer_nation").in("order_customer")
        .df.groupBy("n_name").agg(count(lit(1)).as("n_orders"))
    }),
    "q_transpose" -> ((s, dir) => {
      g(s, dir).transpose
        .ofKind("region").props("region")
        .out("nation_region").props("nation")
        .df.select("r_name", "n_name")
    }),
    "q_remove_vertex" -> ((s, dir) => {
      val gr = g(s, dir)
      val bad = gr.kind("customer").where(col("c_acctbal") < 0).select("id")
      gr.removeVertices(bad).edges.groupBy("label").agg(count(lit(1)).as("n"))
    }),
    // ---- §2.3 degree ----------------------------------------------------
    "q_degree" -> ((s, dir) => {
      val gr = g(s, dir)
      val deg = gr.edges.select(col("src").as("id"))
        .unionAll(gr.edges.select(col("dst").as("id")))
        .groupBy("id").agg(count(lit(1)).as("degree"))
      gr.kind("customer").select("id", "c_custkey")
        .join(deg, "id").select("c_custkey", "degree")
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
      "SELECT r_name, n_name FROM region JOIN nation ON n_regionkey = r_regionkey",
    "q_both" ->
      """SELECT n_name, count(*) AS degree FROM (
           SELECT n_nationkey AS k FROM nation
           UNION ALL SELECT c_nationkey FROM customer
           UNION ALL SELECT s_nationkey FROM supplier) t
         JOIN nation ON n_nationkey = t.k GROUP BY n_name""",
    "q_out_e" ->
      """SELECT p_name, 'lineitem_part' AS label, sum(l_quantity::BIGINT)::BIGINT AS sum_qty
         FROM part JOIN lineitem ON l_partkey = p_partkey GROUP BY p_name""",
    "q_has_property" ->
      """SELECT c_custkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
         WHERE c_acctbal > 9000""",
    "q_one_of" ->
      "SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')",
    "q_range" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey BETWEEN 100 AND 200",
    "q_documents" ->
      "SELECT s_name, s_acctbal FROM supplier",
    "q_distinct" ->
      """SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
         WHERE c_acctbal > 9000""",
    "q_lookahead" ->
      """SELECT c_custkey FROM customer WHERE EXISTS
         (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)""",
    "q_lookahead_minmax" ->
      """SELECT c_custkey FROM customer JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey HAVING count(*) BETWEEN 5 AND 10""",
    "q_neg_lookahead" ->
      """SELECT c_custkey FROM customer WHERE NOT EXISTS
         (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q_branch_merge" ->
      """SELECT n_name, c_name AS member FROM customer JOIN nation ON c_nationkey = n_nationkey
         UNION ALL
         SELECT n_name, s_name AS member FROM supplier JOIN nation ON s_nationkey = n_nationkey""",
    "q_gather_count" ->
      """SELECT c_custkey, string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderkey) AS orders_csv
         FROM customer JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey""",
    "q_spread" ->
      """SELECT c_custkey, count(*) AS n_orders
         FROM customer JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey""",
    "q_make_pairs" ->
      "SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey",
    "q_section" ->
      """SELECT c_custkey, count(*) AS n_orders,
                sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS sum_price_cents
         FROM customer JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey""",
    "q_siblings" ->
      """SELECT a.o_orderkey, count(*) AS n_siblings
         FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey AND a.o_orderkey <> b.o_orderkey
         GROUP BY a.o_orderkey""",
    "q_topk_per_group" ->
      """SELECT n_name, c_custkey FROM customer JOIN nation ON c_nationkey = n_nationkey
         QUALIFY row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey ASC) <= 3""",
    "q_path" ->
      """SELECT (6000000000000 + o_orderkey)::VARCHAR || '->' ||
                (3000000000000 + o_custkey)::VARCHAR || '->' ||
                (2000000000000 + c_nationkey)::VARCHAR AS path_str
         FROM orders JOIN customer ON o_custkey = c_custkey""",
    "q_all_paths_to" ->
      """SELECT (3000000000000 + c_custkey)::VARCHAR || '->' ||
                (2000000000000 + c_nationkey)::VARCHAR || '->' ||
                (1000000000000 + n_regionkey)::VARCHAR AS path_str, 2 AS depth
         FROM customer JOIN nation ON c_nationkey = n_nationkey""",
    "q_descend_all" ->
      """SELECT (1000000000000 + r_regionkey)::BIGINT AS id, 0 AS depth FROM region
         UNION ALL SELECT 2000000000000 + n_nationkey, 1 FROM nation
         UNION ALL SELECT 3000000000000 + c_custkey, 2 FROM customer
         UNION ALL SELECT 4000000000000 + s_suppkey, 2 FROM supplier
         UNION ALL SELECT 6000000000000 + o_orderkey, 3 FROM orders
         UNION ALL SELECT 7000000000000 + l_orderkey*8 + l_linenumber, 3 FROM lineitem""",
    "q_deepest" ->
      """SELECT (7000000000000 + l_orderkey*8 + l_linenumber)::BIGINT AS id, 3 AS depth FROM lineitem
         UNION ALL SELECT 7000000000000 + l_orderkey*8 + l_linenumber, 4 FROM lineitem
         UNION ALL SELECT 6000000000000 + o_orderkey, 3 FROM orders
           WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
         UNION ALL SELECT 3000000000000 + c_custkey, 2 FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         UNION ALL SELECT 4000000000000 + s_suppkey, 2 FROM supplier
           WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
         UNION ALL SELECT 2000000000000 + n_nationkey, 1 FROM nation
           WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
             AND NOT EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
         UNION ALL SELECT 1000000000000 + r_regionkey, 0 FROM region
           WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_regionkey = r_regionkey)""",
    "q_filter_graph" ->
      """SELECT n_name, count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "q_transpose" ->
      "SELECT r_name, n_name FROM region JOIN nation ON n_regionkey = r_regionkey",
    "q_remove_vertex" ->
      """SELECT label, n FROM (
           SELECT 'nation_region' AS label, count(*) AS n FROM nation
           UNION ALL SELECT 'customer_nation', count(*) FROM customer WHERE c_acctbal >= 0
           UNION ALL SELECT 'supplier_nation', count(*) FROM supplier
           UNION ALL SELECT 'order_customer', count(*) FROM orders JOIN customer ON o_custkey = c_custkey WHERE c_acctbal >= 0
           UNION ALL SELECT 'lineitem_order', count(*) FROM lineitem
           UNION ALL SELECT 'lineitem_part', count(*) FROM lineitem
           UNION ALL SELECT 'lineitem_supplier', count(*) FROM lineitem) t""",
    "q_degree" ->
      """SELECT c_custkey, 1 + coalesce(n, 0) AS degree FROM customer
         LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1) t
         ON o_custkey = c_custkey"""
  )
}
