package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private-API bridge (the standard Spark-extension pattern —
  * spark-connect, delta, and iceberg all carry one): exposes
  * `Dataset.ofRows` so graft.plans can wrap a custom logical node
  * (TopKPerKeyNode) back into a public DataFrame. Nothing else from the
  * private surface is touched.
  */
object GraftBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan):
      org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** InternalRow RDD → DataFrame without the per-row Row conversion the
    * public createDataFrame pays — for partition-local operators whose
    * input already comes from `queryExecution.toRdd`
    * (graft.ops.MisraGries.summaryLocal's counter pass). */
  def internalCreateDataFrame(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType):
      org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[SparkSession].internalCreateDataFrame(rdd, schema)
}
