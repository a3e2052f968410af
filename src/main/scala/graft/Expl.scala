package graft
import org.apache.spark.sql.SparkSession
object Expl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val df = SparkEntry.queries(args(0))(spark, d)
    df.explain("formatted")
    val t0 = System.nanoTime
    println("count=" + df.count() + " in " + (System.nanoTime-t0)/1e9 + "s")
    val t1 = System.nanoTime
    println("count2=" + df.count() + " in " + (System.nanoTime-t1)/1e9 + "s")
    // final ADAPTIVE plan: collect() executes this dataset's own query
    // execution, so the AdaptiveSparkPlan below is isFinalPlan=true —
    // the joins shown are the ones AQE actually chose at runtime
    df.collect()
    println(df.queryExecution.executedPlan)
    spark.stop()
  }
}
