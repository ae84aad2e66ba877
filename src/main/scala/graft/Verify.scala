package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = graft.core.Sessions.local()
    new java.io.File(outDir).mkdirs()
    // Schema-drift canary: one named failure beats N opaque analysis errors
    // (round 7 lost 19 queries to a silent events.ts re-encode).
    val drift = graft.core.Tables.schemaDrift(spark, sfDir)
    if (drift.nonEmpty) {
      drift.foreach(d => System.err.println(s"[verify] SCHEMA DRIFT: $d"))
      sys.error(s"testdata schema drift (${drift.size} contract violations) — see [verify] SCHEMA DRIFT lines")
    }
    // Dev loop: SPARK_GRAFT_VERIFY_ONLY=q_a,q_b dumps a subset (the oracle
    // checker reports the rest as MISSING — grep the names you changed).
    // The driver runs without the filter and always gets the full catalog.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names.contains).toMap
      case None        => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
