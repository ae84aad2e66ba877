package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.EditJoin

/** Dev-only A/B for the grouped edit-join overhead (not part of the
  * driver contract): times the grouped twin's stages separately on the
  * K-replicated duplicate-free customer set to locate where the
  * exploded-vs-grouped gap comes from. */
object EditJoinAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 10
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val cust = graft.core.Tables.customer(spark, sfDir).select("c_custkey")
    val cbase = cust.agg(max(col("c_custkey"))).first().getLong(0) + 1L
    val rep = (0 until k).map(i =>
        cust.withColumn("c_custkey", col("c_custkey") + lit(i * cbase)))
      .reduce(_ unionByName _)
      .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))
      .localCheckpoint(eager = true)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[ejab] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    t("exploded")(EditJoin.pairsWithin1(rep, "c_custkey", "c_name").count())
    val g = rep.select(col("c_custkey").as("id"), col("c_name").as("s"))
      .filter(length(col("s")) > 0)
      .groupBy("s").agg(min("id").as("rep"), count(lit(1)).as("n"))
    t("g build (no ckpt)")(g.count())
    val gc = g.localCheckpoint(eager = true)
    t("g checkpoint reuse")(gc.count())
    t("blocked on g (no ckpt)")(
      EditJoin.pairsWithin1(g.select(col("rep"), col("s")), "rep", "s").count())
    t("blocked on gc (ckpt)")(
      EditJoin.pairsWithin1(gc.select(col("rep"), col("s")), "rep", "s").count())
    val pairs = EditJoin.pairsWithin1(gc.select(col("rep"), col("s")), "rep", "s")
      .localCheckpoint(eager = true)
    t("multiplicity joins")(
      pairs.join(gc.select(col("rep").as("id1"), col("n").as("n1")), "id1")
        .join(gc.select(col("rep").as("id2"), col("n").as("n2")), "id2")
        .count())
    println(s"[ejab] rep partitions=${rep.rdd.getNumPartitions} " +
      s"g=${g.rdd.getNumPartitions} gc=${gc.rdd.getNumPartitions}")
    t("blocked on g repart")(
      EditJoin.pairsWithin1(
        g.select(col("rep"), col("s")).repartition(32), "rep", "s").count())
    t("grouped end-to-end")(
      EditJoin.pairsWithin1Grouped(rep, "c_custkey", "c_name").count())
    EditJoin.pairsWithin1Grouped(rep, "c_custkey", "c_name").explain("formatted")
    spark.stop()
  }
}
