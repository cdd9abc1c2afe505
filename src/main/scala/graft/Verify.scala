package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.session("graft-verify", cpus)
    new java.io.File(outDir).mkdirs()
    // local-iteration subset (comma-separated names); driver sets nothing
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // per-query output-schema class (VERDICT r6 #7): "scalar" = atomic
    // top-level columns only (safe for a pandas row-sort compare);
    // "nested" = carries array/map/struct columns — a driver can
    // canonicalize those by digest instead of crashing in sort_values.
    // House rule (HouseRulesSpec): every shipped query is "scalar".
    val schemaClasses = scala.collection.mutable.Map.empty[String, String]
    val failures = selected.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val out = fn(spark, sfDir)
        val nested = out.schema.fields.exists(f => f.dataType match {
          case _: org.apache.spark.sql.types.ArrayType |
               _: org.apache.spark.sql.types.MapType |
               _: org.apache.spark.sql.types.StructType => true
          case _ => false
        })
        schemaClasses(name) = if (nested) "nested" else "scalar"
        out.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Some(name)
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
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val classesJson = schemaClasses.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/schema_classes.json"), classesJson)
    spark.stop()
    // Loud-failure contract (VERDICT r5 item 3): all successful outputs
    // and the oracle SQL are already on disk for the driver's DuckDB
    // compare, but a run with ANY erroring query must not exit clean —
    // a green exit here is what let round 5's 16 analysis errors hide
    // behind a stale "0 failed" parity record.
    if (failures.nonEmpty) {
      System.err.println(
        s"[verify] ${failures.size} of ${selected.size} queries FAILED: " +
          failures.mkString(", "))
      sys.exit(1)
    }
  }
}
