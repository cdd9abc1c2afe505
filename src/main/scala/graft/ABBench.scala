package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Scratch interleaved A/B timing harness (not part of the driver
  * contract): runs competing query shapes alternately in one JVM so
  * shared-box load hits both variants equally. */
object ABBench {

  def q22Join(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tri = Text.wordShingles(docs, "doc_id", "text", 3,
        carryCols = Seq("lang", "source"))
      .withColumnRenamed("sh", "tri")
    val n = tri.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = tri.select(col("lang"), col("source"), col("tri"),
      col("doc_id").as("doc_a"))
    val b = tri.select(col("lang").as("lang_b"),
      col("source").as("source_b"), col("tri").as("tri_b"),
      col("doc_id").as("doc_b"))
    val inter = a.join(b,
        col("lang") === col("lang_b") && col("source") === col("source_b")
          && col("tri") === col("tri_b") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(n.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(n.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .filter(col("inter") >= 3)
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("inter") / (col("na") + col("nb") - col("inter"))).as("jac"))
  }

  def q22Group(s: SparkSession, d: String): DataFrame =
    graft.queries.TextQueries.queries("q22_ngram_jaccard")(s, d)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-ab", "32")
    val variants: Seq[(String, (SparkSession, String) => DataFrame)] =
      Seq("A:join" -> q22Join _, "B:group" -> q22Group _)
    // warmup both
    variants.foreach { case (_, f) => f(spark, sfDir).count() }
    val times = collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to 7; (nm, f) <- variants) {
      val t0 = System.nanoTime()
      f(spark, sfDir).count()
      times(nm) ::= (System.nanoTime() - t0) / 1e9
    }
    times.toSeq.sortBy(_._1).foreach { case (nm, ts) =>
      val s = ts.sorted
      println(f"[ab] $nm min=${s.head}%.2f med=${s(s.size / 2)}%.2f " +
        s.map(t => f"$t%.2f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
