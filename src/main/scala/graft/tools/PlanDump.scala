package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dev-only: dump `explain("formatted")` for catalog queries to files, one
  * per query, using the SAME session configuration as Bench/Verify
  * (Sessions.local — GraftExtensions installed, UTC, nanosAsLong), so the
  * captured plans are the plans the bench actually runs.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [q1,q2,...]
  *   writes <outDir>/<query>_<suffix>.txt for each query (default: the
  *   bench set). sfDir from SPARK_GRAFT_SF_DIR (default sf0.1 — the bench
  *   scale, so AQE/broadcast size estimates match what Bench sees).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r16"
    val suffix = if (args.length > 1) args(1) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else graft.SparkEntry.benchQueries
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      try {
        val plan = graft.SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${n}_$suffix.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        println(s"[plandump] wrote $n")
      } catch {
        case e: Throwable => System.err.println(s"[plandump] $n FAILED: $e")
      }
    }
    spark.stop()
  }
}
