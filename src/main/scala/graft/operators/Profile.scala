package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the ANALYZE-style data-quality pass an
  * ingestion pipeline runs on every new drop: per-column null count,
  * exact distinct count, and min/max, in ONE aggregation job.
  *
  * Scale shape: the multi-column exact count-distincts plan through
  * one Expand (k replicas of the scan, one per distinct column) into a
  * single aggregate — k× shuffle volume but one job and one scan pass;
  * for wide tables at 100 TB swap countDistinct for
  * approx_count_distinct and the Expand collapses away. min/max cast
  * to string AFTER aggregating on the native type, so ordering is the
  * column's, not lexicographic.
  */
object Profile {

  def table(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = graft.SparkUtil.ensureParallelism(df)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("n_rows"),
        col(s"${c}__nulls").as("n_null"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }
}
