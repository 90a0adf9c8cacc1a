package graft

import org.apache.spark.sql.DataFrame

object SparkUtil {

  /** Ensure at least default-parallelism partitions before a
    * compute-heavy per-row stage. A small file scans as one partition
    * and would serialize the whole stage on one core; at production
    * scale scans already exceed the target and this is a no-op (no
    * shuffle inserted).
    */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
