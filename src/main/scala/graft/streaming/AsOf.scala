package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (latest right row with ts <= left ts, per key) — the
  * event-attribution operator Spark SQL lacks natively.
  *
  * Compose-first form (SURVEY §2.5): union both sides tagged, sort by
  * (ts, side) inside a key window, and carry the last non-null right value
  * forward — one shuffle, fully codegen'd window. The right side must be
  * unique per (key, ts) (pre-aggregate ties deterministically).
  *
  * For the custom-operator tier of the same semantics see
  * [[org.apache.spark.sql.graft.AsOfJoinExec]] (merge scan over
  * co-partitioned sorted children), spec-verified equivalent.
  */
object AsOf {

  /** `l` keeps all its columns plus `asof_<rValueCol>` from the matching
    * right row (null when none). `ts` must be a long column in both. */
  def viaWindow(l: DataFrame, r: DataFrame, key: String, ts: String, rValueCol: String): DataFrame = {
    val payload = l.columns.filterNot(c => c == key || c == ts)
    val lt = l
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(r.schema(rValueCol).dataType))
    val rt0 = r.select(col(key), col(ts), col(rValueCol))
    val rt = payload.foldLeft(
        rt0.withColumn("__side", lit(0)).withColumnRenamed(rValueCol, "__rv")) {
      (d, c) => d.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lt.unionByName(rt.select(lt.columns.map(col): _*))
      .withColumn(s"asof_$rValueCol", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .drop("__side", "__rv")
  }
}
