package graft

import org.apache.spark.sql.types.{ArrayType, DecimalType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Repository-wide output contracts.
  *
  * House rule (VERDICT r6 #1): no raw array/struct/map columns in
  * `SparkEntry.queries` output schemas — the correctness driver's
  * pandas canonicalization sorts rows by value and dies on unhashable
  * ndarray cells (the q152 round-6 incident). Queries that compute
  * vectors/arrays must project a deterministic scalar digest
  * (md5 over joined components) plus scalar summary stats instead.
  * Schema-only check: `.schema` triggers analysis, not execution, so
  * this sweeps all queries in seconds.
  */
class HouseRulesSpec extends AnyFunSuite with SparkSpec {

  test("every query output schema is scalar-only (no array/map/struct)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, sf).schema.fields.filter(f =>
          f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType])
        if (bad.isEmpty) None
        else Some(s"$name: ${bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("no query output schema carries a DecimalType column") {
    // House rule (VERDICT r9 #1, the q240 incident): the correctness
    // driver's hasher normalizes DECIMAL differently between the DuckDB
    // oracle (DECIMAL→float64) and Spark's parquet (decimal128), so
    // value-identical rows hash apart. DECIMAL is fine INTERNALLY
    // (exact wide arithmetic); final selects must cast down to
    // int64/double/bool/string.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, sf).schema.fields
          .filter(_.dataType.isInstanceOf[DecimalType])
        if (bad.isEmpty) None
        else Some(s"$name: ${bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("every query has an oracle, and every oracle a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q diff o).isEmpty, s"queries without oracle: ${q diff o}")
    assert((o diff q).isEmpty, s"oracles without query: ${o diff q}")
  }

  test("no raw .persist( in queries/ outside Shared") {
    // House rule (VERDICT r10 #3): an in-query persist has no
    // lifecycle — every bench rep re-persists a fresh copy and leaks
    // it for session lifetime (~10⁷ rows per leak for q258's histogram
    // at 100 TB). Shared.frame tracks, ledgers (shared_builds), and
    // releases run-shared frames; it is the only legal persist site
    // under queries/.
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get("src/main/scala/graft/queries")
    val offenders = java.nio.file.Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".scala"))
      .filterNot(_.getFileName.toString == "Shared.scala")
      .flatMap { p =>
        java.nio.file.Files.readAllLines(p).asScala.zipWithIndex.collect {
          case (line, i) if line.contains(".persist(") =>
            s"${p.getFileName}:${i + 1}: ${line.trim}"
        }
      }.toSeq
    assert(offenders.isEmpty,
      "raw .persist( under queries/ — route through Shared.frame:\n" +
        offenders.mkString("\n"))
  }

  test("COVERAGE.md header quotes the live query count") {
    // VERDICT r8 #4: the committed header said "228 queries" while the
    // suite was 232. The count in the header is now pinned to
    // SparkEntry.queries.size — growing the suite without updating the
    // doc fails here instead of drifting silently.
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get("COVERAGE.md"))
    val m = "(\\d+) queries as of round".r.findFirstMatchIn(txt)
    assert(m.isDefined, "COVERAGE.md header count sentence missing")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"COVERAGE.md header says '${m.get.group(1)} queries'; " +
        s"SparkEntry.queries has ${SparkEntry.queries.size} — update the header")
  }
}
