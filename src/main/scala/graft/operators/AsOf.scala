package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the most recent right
  * row with the same key and rightTime <= leftTime.
  *
  * Spark has no native ASOF JOIN; the naive formulation (range join +
  * top-1 per left row) materializes O(|L_k|·|R_k|) pairs per key. This
  * implementation is the union+window form: tag both sides, sort within
  * key by (time, tag), and carry the latest right id forward with
  * last_value(ignoreNulls) — O((|L_k|+|R_k|) log ·) per key, one shuffle,
  * no pair blow-up. At equal timestamps the right row sorts first (tag 0)
  * so it is visible to the left row ("at or before" semantics); among
  * equal-time right rows the one latest in (time, tiebreak) order wins.
  */
object AsOf {

  /** Returns the left frame plus `asof_<rightIdCol>`: the matched right
    * row's id (null when no prior right row exists).
    */
  def join(left: DataFrame, right: DataFrame, key: String, timeCol: String,
           rightIdCol: String, tiebreak: String): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__tag", lit(1))
      .withColumn("__rid", lit(null).cast(right.schema(rightIdCol).dataType))
      .withColumn("__tb", lit(null).cast(right.schema(tiebreak).dataType))
    val r = right.select(
      (Seq(col(key), col(timeCol)) ++
        leftCols.filterNot(c => c == key || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("__tag"), col(rightIdCol).as("__rid"),
          col(tiebreak).as("__tb"))): _*)
    val unioned = l.select((leftCols.map(col) ++
      Seq(col("__tag"), col("__rid"), col("__tb"))): _*)
      .unionByName(r.select((leftCols.map(col) ++
        Seq(col("__tag"), col("__rid"), col("__tb"))): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(timeCol).asc, col("__tag").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$rightIdCol",
        last(col("__rid"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .drop("__tag", "__rid", "__tb")
  }
}
