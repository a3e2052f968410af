package graft

import org.apache.spark.sql.functions._
import graft.engine.Engine
import graft.functions.DotProduct.dotp

/** Degenerate inputs: the paths a production pipeline hits on day one. */
class EdgeCasesSpec extends SparkSpec {

  test("LSH bucket is invariant under positive scaling (sign of dot unchanged)") {
    import graft.ops.Vectors
    val e = Tables.embeddings(spark, sfDir)
    // scaling by 4 flips no hyperplane signs → bucket(x) == bucket(4x)
    val scaled = e.withColumn("embedding",
      expr("transform(embedding, x -> x * CAST(4.0 AS FLOAT))"))
    def buckets(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), Vectors.bucket(col("embedding")).as("bkt"))
    assert(buckets(e).exceptAll(buckets(scaled)).count() == 0)
    assert(buckets(scaled).exceptAll(buckets(e)).count() == 0)
  }

  test("engine PUT of an empty frame keeps schema and appends nothing") {
    val e = new Engine(spark.newSession())
    val nation = Tables.nation(e.spark, sfDir)
    e.put("t", nation.limit(0))
    assert(e.count("t") == 0)
    assert(e.get("t").schema == nation.schema)
    e.put("t", nation)
    assert(e.count("t") == 25)
  }

  test("exchange with SQL command on an engine with data routes like GET") {
    val e = new Engine(spark.newSession())
    e.put("nation", Tables.nation(e.spark, sfDir))
    val viaExchange = e.exchange("SELECT count(*) AS c FROM nation", e.spark.emptyDataFrame)
    assert(viaExchange.collect()(0).getLong(0) == 25)
  }

  test("dot product of empty arrays is 0; of orthogonal unit vectors is 0") {
    val df = spark.sql(
      """SELECT CAST(array() AS ARRAY<DOUBLE>) AS e,
        |       array(1.0D, 0.0D) AS ux, array(0.0D, 1.0D) AS uy""".stripMargin)
    val row = df.select(dotp(col("e"), col("e")).as("ee"),
      dotp(col("ux"), col("uy")).as("xy")).collect()(0)
    assert(row.getDouble(0) == 0.0 && row.getDouble(1) == 0.0)
  }

  test("spread passes a pre-split input through without a shuffle") {
    import graft.ops.spread
    // already split ≥ parallelism/2 → must NOT insert an Exchange
    val wide = spark.range(0, 1000, 1,
      spark.sparkContext.defaultParallelism).toDF("i")
    val plan = spread(wide).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    // a single-partition scan still gets rebalanced
    val narrow = spark.range(0, 1000, 1, 1).toDF("i")
    assert(spread(narrow).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("transfer of an empty table verifies zero rows") {
    val (a, b) = Engine.pair(spark)
    a.put("empty", Tables.nation(a.spark, sfDir).limit(0))
    assert(a.transferTable(b, "empty") == 0)
  }
}
