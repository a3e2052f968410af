package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic for the TcpGate Arrow cache path (not part of the
  * driver contract; safe to delete).
  */
object GateDebug {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "0")
      .config("spark.task.maxDirectResultSize", "100m")
      .config("spark.rpc.message.maxSize", "256")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val a = new graft.engine.Engine(spark.newSession())
    a.put("flights", Throughput.flights(a.spark, rows).repartition(16).cache())
    a.get("flights").count()
    a.spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
    sys.env.get("GRAFT_CODEC").foreach(c =>
      a.spark.conf.set("spark.graft.gate.arrowCodec", c))
    val gate = new graft.engine.TcpGate(a)
    try {
      val c = new graft.engine.GateClient("127.0.0.1", gate.boundPort)
      c.format("arrow")
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        val n = c.sqlArrowRowCount("SELECT * FROM flights")
        println(f"trial $i: ${(System.nanoTime() - t0) / 1e9}%.3f s, $n rows, cache=${gate.cacheStats}")
      }
      c.close()
    } finally gate.close()
    spark.stop()
  }
}
