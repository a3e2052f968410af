package graft

import org.apache.spark.sql.functions._
import graft.functions.DotProduct.dotp

/** The codegen'd DotProduct must be bit-identical to the interpreted
  * HOF formulation (which in turn matches the DuckDB oracle).
  */
class DotProductSpec extends SparkSpec {

  private def hofDot = expr(
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  test("bit-identical to the HOF dot product on real embeddings") {
    val e = Tables.embeddings(spark, sfDir)
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .join(e.select(col("vec_id").as("ib"), col("embedding").as("b")),
        col("ia") === col("ib") - 1)
    val diff = pairs
      .select(dotp(col("a"), col("b")).as("fast"), hofDot.as("ref"))
      .filter(col("fast") =!= col("ref")) // exact comparison, no tolerance
    assert(diff.count() == 0)
  }

  test("self dot product equals squared norm, positive") {
    val e = Tables.embeddings(spark, sfDir)
    val bad = e.select(dotp(col("embedding"), col("embedding")).as("d"))
      .filter(col("d") <= 0)
    assert(bad.count() == 0)
  }

  test("mixed long/float arrays and null handling") {
    val df = spark.sql(
      """SELECT array(1L, 2L, 3L) AS a,
        |       array(CAST(0.5 AS FLOAT), CAST(NULL AS FLOAT), CAST(2.0 AS FLOAT)) AS b""".stripMargin)
    val v = df.select(dotp(col("a"), col("b")).as("d")).collect()(0).getDouble(0)
    assert(v == 1L * 0.5f + 0.0 + 3L * 2.0f) // null element contributes 0
  }

  test("length mismatch stops at the shorter array") {
    val df = spark.sql("SELECT array(1.0D, 2.0D) AS a, array(3.0D) AS b")
    assert(df.select(dotp(col("a"), col("b"))).collect()(0).getDouble(0) == 3.0)
  }

  test("two dot products in one non-nullable codegen scope don't collide") {
    // non-nullable literal arrays put both expressions in one Java
    // scope; un-fresh locals would be a janino duplicate-variable
    // error and a silent interpreted-mode fallback
    val df = spark.sql("SELECT 1 AS x")
      .select(
        dotp(expr("array(1.0D, 2.0D)"), expr("array(3.0D, 4.0D)")).as("d1"),
        dotp(expr("array(5.0D)"), expr("array(6.0D)")).as("d2"))
    val row = df.collect()(0)
    assert(row.getDouble(0) == 11.0 && row.getDouble(1) == 30.0)
  }
}
