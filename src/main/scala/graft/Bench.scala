package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // dev-loop only: comma-separated key filter (driver runs the full set)
    val only: Set[String] = sys.env.get("SPARK_GRAFT_KEYS")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up once outside the timings: JIT, codegen cache, parquet
    // footer reads — so the first timed query isn't charged for JVM
    // startup the way a long-running cluster never would be.
    try {
      spark.sql("SELECT 1").count()
      SparkEntry.queries("count_star")(spark, sfDir).count()
    } catch { case _: Throwable => () }
    // (succeeded, seconds): failures must NOT feed the min — a run that
    // throws after 0.05s would otherwise beat the honest 3s run and be
    // published as an excellent timing with no error signal
    def once(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Boolean, Double) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      // each query's own cache fills inside its timing; dropping them
      // between queries keeps 100+ successive runs from evicting each
      // other (a long-lived server would scope caches the same way)
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      (ok, secs)
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
        // min-of-2 (min-of-3 for sub-second keys): a single timing is
        // at the mercy of machine contention — round 3's driver bench
        // showed untouched keys "regressing" 4-7× from background load
        // alone. The minimum over SUCCESSFUL runs is the number that
        // reflects the code; all-failed keys report the max elapsed
        // (pessimistic, and the stderr line names the error).
        val two = Seq(once(name, fn), once(name, fn))
        val runs = if (two.exists(r => r._1 && r._2 < 1.0)) two :+ once(name, fn) else two
        val good = runs.filter(_._1).map(_._2)
        name -> (if (good.nonEmpty) good.min else runs.map(_._2).max)
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // the driver's captured stdout tail truncates at 2000 chars, which
    // loses the per-key map — persist the full line so every round's
    // driver bench is diffable (tools/benchdiff.py) from the file alone
    try {
      val p = java.nio.file.Paths.get("/root/repo/bench/BENCH_driver_latest.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, json + "\n")
    } catch {
      case e: Throwable => System.err.println(s"[bench] artifact write failed: $e")
    }
    spark.stop()
  }
}
