package graft.core

import org.apache.spark.sql.SparkSession

/** Single place the engine's session configuration lives — Verify, Bench,
  * and the app mains all build the same session (extensions installed, UTC,
  * nanos-as-long for the TIMESTAMP(NANOS) events table, UI off).
  */
object Sessions {
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
