package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Source/sink round-trips beyond parquet: ORC, JSON lines, and CSV each
 * write a documents slice and read it back identically. Also asserts that
 * predicate pushdown survives the ORC scan (the formats all share Spark's
 * file-source pushdown path).
 */
class SourcesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs() = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "lang", "source", "n_chars")

  private def roundTrip(format: String, opts: Map[String, String] = Map.empty): Unit = {
    val dir = Files.createTempDirectory(s"graft_$format").toString + "/out"
    val original = docs()
    original.write.options(opts).format(format).save(dir)
    var reader = spark.read.options(opts).format(format)
    if (format == "csv" || format == "json") reader = reader.schema(original.schema)
    val back = reader.load(dir)
    assert(back.count() === original.count())
    val a = original.orderBy("doc_id").collect().toSeq
    val b = back.orderBy("doc_id").collect().toSeq
    assert(a === b, s"$format round-trip altered rows")
  }

  test("ORC sink + scan round-trip") { roundTrip("orc") }
  test("JSON-lines sink + scan round-trip") { roundTrip("json") }
  test("CSV sink + scan round-trip") {
    roundTrip("csv", Map("header" -> "true"))
  }

  test("ORC scan gets pushed filters") {
    val dir = Files.createTempDirectory("graft_orc_push").toString + "/out"
    docs().write.orc(dir)
    val plan = spark.read.orc(dir)
      .filter(col("n_chars") > 100)
      .select("doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]"),
      s"expected pushed filter in ORC scan:\n$plan")
  }
}
