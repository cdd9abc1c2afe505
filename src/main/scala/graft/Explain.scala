package graft

/** Plan inspector: prints the formatted physical plan for the named
  * queries (all when none given). Usage:
  *   sbt "runMain graft.Explain q10_semi_join q07_scd2_closeout"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-explain", "8")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
