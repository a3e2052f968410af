package graft

import org.apache.spark.sql.functions._
import graft.ops.Bucketing

class BucketingSpec extends SparkSpec {

  test("bucketed join plans without a shuffle exchange") {
    val df = Bucketing.bucketedJoin(spark, sfDir)
    // the join itself (below the final orderBy/agg output exchange)
    // must read both bucketed scans with no ShuffleExchange between
    // scan and join
    val plan = df.queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected SortMergeJoin in:\n$plan")
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("ShuffleExchange") && !belowJoin.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle its inputs:\n$belowJoin")
    // and values match the plain (shuffling) formulation
    val direct = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("c_custkey") === col("o_custkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_custkey"))
    assert(df.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(df).count() == 0)
  }
}
