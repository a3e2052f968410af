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

  /** The `join_skewed` shape at probe scale: 90% of left rows on one
    * hot key, shuffled join (broadcast disabled), toggling AQE skew
    * handling. With handling OFF the hot partition is one straggler
    * task; ON, the runtime splits it at map-block granularity and the
    * other 31 cores share the work — the wall-clock gap is the
    * measured value of `OptimizeSkewedJoin` at scale.
    */
  private def skewJoin(e: DataFrame, handle: Boolean): Long = {
    val ss = e.sparkSession
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", handle.toString)
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    val left = e.select(
      when(col("event_id") % 10 =!= 7, lit(0L)).otherwise(col("event_id")).as("k"),
      (col("event_id") % 1000).cast("double").as("value"))
    val right = e.sparkSession.range(1).select(lit(0L).as("k"), lit("hub").as("tag"))
      .unionByName(e.filter(col("event_id") % 10 === 7)
        .select(col("event_id").as("k"),
          concat(lit("t"), col("event_id") % 5).as("tag")))
    val n = left.join(right, "k")
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .count()
    // restore defaults so later probe shapes are unaffected
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    ss.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    ss.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    ss.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    ss.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    ss.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    n
  }

  private def sessions(e: DataFrame): Long =
    e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)))
      .count()

  /** MinHash+LSH dedup at N× corpus: replicas get a distinct suffix
    * token (new docs, same near-dup structure per replica) — times the
    * `dedup_near` pipeline shape as the corpus grows.
    */
  /** The `dedup_near` pipeline shape, via the SAME canonical
    * shingle/sig/band helpers the oracled keys use (graft.ops.Text) —
    * the probe cannot silently measure a different shape than the
    * operator it models.
    */
  private def dedupNear(docs: DataFrame): Long = {
    val hsDf = graft.ops.Text.shingleHashes(docs).cache()
    hsDf.count()
    val bands = graft.ops.Text.minhashBands(hsDf)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val jac = size(array_intersect(col("sa.hs"), col("sb.hs"))).cast("double") /
      size(array_union(col("sa.hs"), col("sb.hs")))
    val out = cand
      .join(hsDf.as("sa"), col("sa.doc_id") === col("doc_a"))
      .join(hsDf.as("sb"), col("sb.doc_id") === col("doc_b"))
      .filter(jac >= 0.5)
      .count()
    hsDf.unpersist()
    out
  }

  /** Incremental dedup at N× corpus (the `dedup_incremental` shape):
    * even doc_ids are the existing corpus, odd the arriving batch.
    * Candidate generation is new-bands ⋈ old-bands ONLY — cost tracks
    * (new × collision rate), not corpus², which is the property that
    * lets a 100 TB corpus absorb a daily batch without re-deduping
    * itself.
    */
  private def dedupIncremental(docs: DataFrame): Long = {
    val oldHs = graft.ops.Text.shingleHashes(docs.filter(col("doc_id") % 2 === 0)).cache()
    val newHs = graft.ops.Text.shingleHashes(docs.filter(col("doc_id") % 2 =!= 0)).cache()
    oldHs.count(); newHs.count()
    val jac = size(array_intersect(col("nh.hs"), col("oh.hs"))).cast("double") /
      size(array_union(col("nh.hs"), col("oh.hs")))
    val out = graft.ops.Text.minhashBands(newHs).as("n")
      .join(graft.ops.Text.minhashBands(oldHs).as("o"),
        col("n.b") === col("o.b") && col("n.bkey") === col("o.bkey"))
      .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("old_id"))
      .distinct()
      .join(newHs.as("nh"), col("nh.doc_id") === col("new_id"))
      .join(oldHs.as("oh"), col("oh.doc_id") === col("old_id"))
      .filter(jac >= 0.5)
      .select(col("new_id")).distinct()
      .count()
    oldHs.unpersist(); newHs.unpersist()
    out
  }

  /** Each replica deterministically shuffles the base doc's tokens
    * (sorted by md5(r:token)), so replicas have disjoint shingle
    * adjacencies — corpus grows N× WITHOUT growing the near-dup pair
    * density, which is the realistic ingest-more-documents mode.
    */
  private def scaledDocs(docs: DataFrame, factor: Int): DataFrame =
    docs.select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(factor - 1))).as("r"))
      .select((col("doc_id") * factor + col("r")).as("doc_id"),
        expr("""array_join(
               |  transform(
               |    array_sort(transform(split(text, ' '),
               |      t -> struct(md5(concat(cast(r AS STRING), ':', t)) AS k, t AS v))),
               |    s -> s.v), ' ')""".stripMargin).as("text"))

  def main(args: Array[String]): Unit = {
    val maxFactor = args.headOption.map(_.toInt).getOrElse(8)
    val docsFactor = args.lift(1).map(_.toInt).getOrElse(maxFactor)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docsBase = Tables.documents(spark, sfDir).select("doc_id", "text")
    for (factor <- Seq(1, docsFactor)) {
      val dc = scaledDocs(docsBase, factor).repartition(cpus.toInt).cache()
      val nDocs = dc.count()
      val t0 = System.nanoTime()
      val pairs = dedupNear(dc)
      println(f"""{"shape":"dedup_near","factor":$factor,"rows":$nDocs,"out_rows":$pairs,"secs":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      val t1 = System.nanoTime()
      val dups = dedupIncremental(dc)
      println(f"""{"shape":"dedup_incremental","factor":$factor,"rows":$nDocs,"out_rows":$dups,"secs":${(System.nanoTime() - t1) / 1e9}%.2f}""")
      dc.unpersist()
    }

    val base = Tables.events(spark, sfDir).select("user_id", "event_id", "ts")
    for (factor <- Seq(1, maxFactor)) {
      val e = scaled(base, factor)
        .repartition(cpus.toInt).cache()
      val rows = e.count() // materialize outside the timings
      // the naive range join is the known-quadratic BASELINE; past 32×
      // its pair space is pure waste (measured 23× growth at 32×) —
      // the octave pushes only the shapes the engine actually bets on
      val shapes = Seq[(String, DataFrame => Long)](
        "range_naive" -> naiveRange,
        "range_bucketed" -> bucketedRange,
        "sessionize" -> sessions).filterNot {
        case (n, _) => n == "range_naive" && factor > 32
      }
      for ((shape, run) <- shapes) {
        val t0 = System.nanoTime()
        val out = run(e)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"""{"shape":"$shape","factor":$factor,"rows":$rows,"out_rows":$out,"secs":$secs%.2f}""")
      }
      for (handle <- Seq(false, true)) {
        val t0 = System.nanoTime()
        val out = skewJoin(e, handle)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"""{"shape":"skew_join","handling":$handle,"factor":$factor,"rows":$rows,"out_rows":$out,"secs":$secs%.2f}""")
      }
      e.unpersist()
    }
    spark.stop()
  }
}
