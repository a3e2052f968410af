package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale check for the shapes the engine bets on: replay the
  * events table at N× volume (replicas shifted in time, so per-user
  * per-minute density stays constant — the realistic growth mode) and
  * time the operators whose scaling behavior matters:
  *
  *  - range join NAIVE (join on user_id only, time predicate as
  *    filter): pair space grows quadratically in events-per-user;
  *  - range join BUCKETED (join on user_id + minute bucket, the
  *    `join_range` shape): pair space grows linearly;
  *  - sessionization (window over user partitions): linear.
  *
  * Run: sbt "runMain graft.ScaleProbe [maxFactor]" — prints one JSON
  * line per (shape, factor). SCALE.md records a captured run.
  */
object ScaleProbe {

  private def scaled(e: DataFrame, factor: Int): DataFrame =
    e.select(col("user_id"), col("event_id"), col("ts"),
        explode(sequence(lit(0), lit(factor - 1))).as("r"))
      .select(col("user_id"),
        (col("event_id") * factor + col("r")).as("event_id"),
        expr("timestampadd(DAY, CAST(r AS INT) * 37, ts)").as("ts"))

  private def naiveRange(e: DataFrame): Long = {
    val a = e.select(col("user_id"), col("event_id").as("id_a"), col("ts").as("ts_a"))
    val b = e.select(col("user_id"), col("event_id").as("id_b"), col("ts").as("ts_b"))
    a.join(b, Seq("user_id"))
      .filter(col("id_a") < col("id_b") &&
        col("ts_b") >= col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr("INTERVAL 1 MINUTE"))
      .count()
  }

  private def bucketedRange(e: DataFrame): Long = {
    val keyed = e.withColumn("bkt", expr("unix_timestamp(ts) div 60"))
    val a = keyed.select(col("user_id"), col("event_id").as("id_a"), col("ts").as("ts_a"),
      explode(array(col("bkt"), col("bkt") + 1)).as("jbkt"))
    val b = keyed.select(col("user_id"), col("event_id").as("id_b"), col("ts").as("ts_b"),
      col("bkt").as("jbkt"))
    a.join(b, Seq("user_id", "jbkt"))
      .filter(col("id_a") < col("id_b") &&
        col("ts_b") >= col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr("INTERVAL 1 MINUTE"))
      .count()
  }

  private def sessions(e: DataFrame): Long =
    e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)))
      .count()

  def main(args: Array[String]): Unit = {
    val maxFactor = args.headOption.map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables.events(spark, sfDir).select("user_id", "event_id", "ts")
    for (factor <- Seq(1, maxFactor)) {
      val e = scaled(base, factor)
        .repartition(cpus.toInt).cache()
      val rows = e.count() // materialize outside the timings
      for ((shape, run) <- Seq[(String, DataFrame => Long)](
          "range_naive" -> naiveRange,
          "range_bucketed" -> bucketedRange,
          "sessionize" -> sessions)) {
        val t0 = System.nanoTime()
        val out = run(e)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"""{"shape":"$shape","factor":$factor,"rows":$rows,"out_rows":$out,"secs":$secs%.2f}""")
      }
      e.unpersist()
    }
    spark.stop()
  }
}
