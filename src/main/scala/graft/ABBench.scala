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

  /** q110's ROUND-4 shape: per-source running-sum window — each source
    * serializes through one reducer, the exact plan the round-4 verdict
    * flagged. Kept here as the A side of the packing smoke. */
  def packWindow(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = 2048
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("bigint").as("n_toks"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs
      .withColumn("cum", sum(col("n_toks")).over(w))
      .select(col("doc_id"), col("source"), col("n_toks"),
        (col("cum") - col("n_toks")).as("tok_offset"),
        expr(s"(cum - n_toks) div $win").as("bin_first"),
        expr(s"(cum - 1) div $win").as("bin_last"))
  }

  /** q110's current two-phase prefix-sum shape (operators/Prefix). */
  def packPrefix(s: SparkSession, d: String): DataFrame =
    graft.queries.CorpusQueries.queries("q110_sequence_packing")(s, d)

  /** Narrow-input twins: read a pre-tokenized (doc_id, source, n_toks)
    * frame — the realistic 100 TB packing input, where the token counts
    * come out of the curation pipeline and the window's single reducer
    * is the cost, not the tokenization scan. */
  private def narrowDocs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/packing_input.parquet")

  def packWindowNarrow(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    narrowDocs(s, d)
      .withColumn("cum", sum(col("n_toks")).over(w))
      .select(col("doc_id"), col("source"), col("n_toks"),
        (col("cum") - col("n_toks")).as("tok_offset"),
        expr("(cum - n_toks) div 2048").as("bin_first"),
        expr("(cum - 1) div 2048").as("bin_last"))
  }

  def packPrefixNarrow(s: SparkSession, d: String): DataFrame = {
    val win = 2048
    graft.operators.Prefix
      .runningSum(narrowDocs(s, d), "source", "doc_id", "n_toks", "cum")
      .select(col("doc_id"), col("source"), col("n_toks"),
        (col("cum") - col("n_toks")).as("tok_offset"),
        expr(s"(cum - n_toks) div $win").as("bin_first"),
        expr(s"(cum - 1) div $win").as("bin_last"))
  }

  /** q175's A side: exact percentiles via sort-agg percentile_disc —
    * every group's rows sort through its aggregator (q160's exact leg,
    * minus the sketch column). */
  def pctSort(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        expr("percentile_disc(0.50) WITHIN GROUP " +
          "(ORDER BY l_extendedprice)").as("p50"),
        expr("percentile_disc(0.95) WITHIN GROUP " +
          "(ORDER BY l_extendedprice)").as("p95"))

  /** q175's B side: the two-phase value-histogram + prefix-sum path. */
  def pctPrefix(s: SparkSession, d: String): DataFrame =
    graft.queries.WarehouseQueries
      .queries("q175_scalable_percentile")(s, d)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-ab", "32")
    val variants: Seq[(String, (SparkSession, String) => DataFrame)] =
      if (args.headOption.contains("q110"))
        Seq("A:window" -> packWindow _, "B:prefix" -> packPrefix _)
      else if (args.headOption.contains("q110narrow"))
        Seq("A:window" -> packWindowNarrow _,
          "B:prefix" -> packPrefixNarrow _)
      else if (args.headOption.contains("q175"))
        Seq("A:sortagg" -> pctSort _, "B:histprefix" -> pctPrefix _)
      else Seq("A:join" -> q22Join _, "B:group" -> q22Group _)
    // force EVERY output column, not count(): a Window never changes
    // cardinality, so count() lets Catalyst prune the windowed columns
    // and the A side would time a bare parquet row count
    def force(df: DataFrame): Unit = {
      val h = xxhash64(df.columns.map(col): _*)
      df.select(h.as("h")).agg(expr("bit_xor(h)")).collect()
    }
    // reps configurable: adversarial inputs can make one variant slow
    // enough (the measurement's whole point) that 7 reps won't fit a
    // wall-clock budget
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "7").toInt
    // warmup both
    variants.foreach { case (_, f) => force(f(spark, sfDir)) }
    val times = collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to reps; (nm, f) <- variants) {
      val t0 = System.nanoTime()
      force(f(spark, sfDir))
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
