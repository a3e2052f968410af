package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.Pipeline
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
  private def dedupIncremental(docs: DataFrame,
      batchMod: Int = 2, batchRem: Int = 1): Long = {
    val oldHs = graft.ops.Text.shingleHashes(
      docs.filter(col("doc_id") % batchMod =!= batchRem)).cache()
    val newHs = graft.ops.Text.shingleHashes(
      docs.filter(col("doc_id") % batchMod === batchRem)).cache()
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

  /** Round-5 twin of [[dedupIncremental]]: the old side's hs/bands are
    * STORED (parquet, the `Text.stagedBandIndex` layout) in an untimed
    * build step, and the timed batch dedup only scans them — measures
    * what the stored index buys over re-minhashing the corpus each
    * batch (the `dedup_incremental_indexed` key's claim).
    */
  private def dedupIncrementalIndexed(docs: DataFrame, dir: String,
      batchMod: Int = 2, batchRem: Int = 1): Long = {
    val spark = docs.sparkSession
    val newHs = graft.ops.Text.shingleHashes(
      docs.filter(col("doc_id") % batchMod === batchRem)).cache()
    newHs.count()
    val jac = size(array_intersect(col("nh.hs"), col("oh.hs"))).cast("double") /
      size(array_union(col("nh.hs"), col("oh.hs")))
    val out = graft.ops.Text.minhashBands(newHs).as("n")
      .join(spark.read.parquet(s"$dir/bands").as("o"),
        col("n.b") === col("o.b") && col("n.bkey") === col("o.bkey"))
      .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("old_id"))
      .distinct()
      .join(newHs.as("nh"), col("nh.doc_id") === col("new_id"))
      .join(spark.read.parquet(s"$dir/hs").as("oh"), col("oh.doc_id") === col("old_id"))
      .filter(jac >= 0.5)
      .select(col("new_id")).distinct()
      .count()
    newHs.unpersist()
    out
  }

  /** Untimed index build for [[dedupIncrementalIndexed]]. */
  private def buildBandIndex(docs: DataFrame, dir: String,
      batchMod: Int = 2, batchRem: Int = 1): Unit = {
    val spark = docs.sparkSession
    graft.ops.Text.shingleHashes(docs.filter(col("doc_id") % batchMod =!= batchRem))
      .write.mode("overwrite").parquet(s"$dir/hs")
    graft.ops.Text.minhashBands(spark.read.parquet(s"$dir/hs"))
      .write.mode("overwrite").partitionBy("b").parquet(s"$dir/bands")
  }

  // ---- ANN recall octave -------------------------------------------------

  /** N× embeddings corpus: replica r rotates each vector's components
    * by r positions — distinct vectors, same uniform-random character
    * (the adversarial case for LSH), norms preserved.
    */
  /** The planted-cluster embedding corpus shared by the `pqres` and
    * `beam` probe legs (ONE recipe so the two legs cannot drift): 8
    * clusters keyed on xxhash64(id) % 8, rows at the historical seed
    * ids sitting exactly ON their center; every other row is center +
    * per-subspace offset (`os` scale, the 4^8 product structure a PQ
    * residual codebook covers exactly — planted to the codebook index
    * on the residual-seed rows) + i.i.d. jitter (`js` scale). Label
    * column fixture-shaped for microVecsL-based chains.
    */
  private def plantedClusterCorpus(spark: SparkSession, dir: String,
      n: Long, os: Double, js: Double): Unit = {
    val cids = graft.ops.Vectors.ivfCentroidIds
    val rseeds = graft.ops.Vectors.pqResSeedIds
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val kCol = cids.zipWithIndex.foldLeft(
        pmod(xxhash64(col("id")), lit(8)).cast("int")) {
      case (acc, (cid, k)) => when(col("id") === cid, lit(k)).otherwise(acc)
    }
    val cs = 0.8
    // per-subspace offset index: planted to the codebook index on
    // the residual-seed rows, pseudo-random everywhere else
    val oSql = rseeds.zipWithIndex
      .map { case (sid, c) => s"when vec_id = $sid then $c" }
      .mkString("case ", " ", " else pmod(xxhash64(concat('o:', vec_id, ':', j div 8)), 4) end")
    spark.range(n)
      .select(col("id").as("vec_id"), kCol.as("k"),
        (!col("id").isin(cids: _*)).as("noisy"))
      .select(col("vec_id"),
        expr(s"""transform(sequence(0, 63), j -> cast(
             |  $cs * ((xxhash64(concat('c:', k, ':', j)) % 1000001) / 1000000.0)
             |  + (case when noisy then
             |       $os * ((xxhash64(concat('f:', ($oSql), ':', j)) % 1000001) / 1000000.0)
             |     + $js * ((xxhash64(concat('n:', vec_id, ':', j)) % 1000001) / 1000000.0)
             |     else 0.0 end) as float))""".stripMargin).as("embedding"),
        // fixture-shaped label (microVecsL-based chains read it)
        pmod(col("vec_id"), lit(10)).cast("int").as("label"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def scaledEmb(e: DataFrame, factor: Int): DataFrame =
    e.select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(factor - 1))).as("r"))
      .select((col("vec_id") * factor + col("r")).as("vec_id"),
        expr("""transform(sequence(0, 63),
               |  i -> embedding[int((i + r) % 64)])""".stripMargin).as("embedding"),
        // fixture-shaped label so microVecsL-based chains (the staged
        // index builds) run over probe corpora too — derived from the
        // FINAL re-keyed id (label = new vec_id % 10, the same rule
        // plantedClusterCorpus and the synthetic-label oracles use)
        pmod(col("vec_id") * factor + col("r"), lit(10)).cast("int").as("label"))

  private def dotp(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.DotProduct.dotp(a, b)

  /** Multi-probe ANN top-3 for the 20 fixed queries over a bucketed
    * corpus, probing every bucket within hamming distance `ham` of the
    * query's bucket (1 / 9 / 37 probes for ham 0 / 1 / 2) — the
    * recall↔cost dial quantified. Returns (recall@3 vs brute force,
    * search seconds, candidate pairs scored).
    */
  private def annProbe(b: DataFrame, ham: Int): (Double, Double, Long) = {
    val masks = (0L until 256L).filter(m => java.lang.Long.bitCount(m) <= ham)
    val q = b.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("nrm").as("qn"),
        explode(array(masks.map(m => col("bkt").bitwiseXOR(lit(m))): _*)).as("probe"))
    val c = b.select(col("vec_id").as("c_id"), col("embedding").as("ce"),
      col("nrm").as("cn"), col("bkt").as("cbkt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    def top3(joined: DataFrame): DataFrame = joined
      .select(col("q_id"), col("c_id"),
        (dotp(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("c_id"))
    val t0 = System.nanoTime()
    val cand = q.join(c, col("probe") === col("cbkt") && col("c_id") =!= col("q_id"))
    val scored = cand.count()
    val ann = top3(cand).collect().toSet
    val secs = (System.nanoTime() - t0) / 1e9
    val bf = top3(
      b.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("nrm").as("qn"))
        .join(c, col("c_id") =!= col("q_id"))).collect().toSet
    ((ann & bf).size.toDouble / bf.size, secs, scored)
  }

  // ---- streaming state-store probe --------------------------------------

  /** Watermark-delay vs state-size at N× events: the scaled stream is
    * replayed time-ordered in 8 micro-batches (maxFilesPerTrigger=1)
    * through a watermarked per-event dedup — the state the store must
    * hold is exactly the events inside the watermark horizon, so the
    * delay IS the state-sizing knob. Returns (max state rows across
    * batches, wall seconds).
    */
  private def stateProbe(parent: SparkSession, staged: String, delay: String,
      provider: Option[String] = None): (Long, Double, Long, Long) = {
    import org.apache.spark.sql.types._
    val ss = parent.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    provider.foreach(p =>
      ss.conf.set("spark.sql.streaming.stateStore.providerClass", p))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", LongType)))
    val t0 = System.nanoTime()
    val q = ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .withColumn("ts", timestamp_micros(col("ts")))
      .withWatermark("ts", delay)
      // dropDuplicates(keys) without the event-time column in the key
      // NEVER evicts (measured: state = full corpus at every delay);
      // dropDuplicatesWithinWatermark is the API whose state the
      // watermark actually bounds — the delay is the sizing knob
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream
      .format("noop")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    val ops = q.recentProgress
      .flatMap(p => Option(p.stateOperators).toSeq.flatten)
    val maxState = ops.map(_.numRowsTotal).foldLeft(0L)(math.max)
    val maxCommitMs = ops.map(_.commitTimeMs).foldLeft(0L)(math.max)
    val maxMem = ops.map(_.memoryUsedBytes).foldLeft(0L)(math.max)
    (maxState, secs, maxCommitMs, maxMem)
  }

  /** Every file under `p`, recursively, through Hadoop FileSystem
    * (r19, VERDICT r18 #7): the probes measure the same layouts the
    * serves read, and a java.io.File walk silently counts ZERO files
    * for any `hdfs://`/`s3a://` path — a cluster-run probe would
    * report an empty index instead of failing.
    */
  private def hfsFilePaths(spark: SparkSession, p: String)
      : Seq[org.apache.hadoop.fs.Path] = {
    val (fs, hp) = graft.ops.hfs(spark, p)
    if (!fs.exists(hp)) Seq.empty
    else {
      val it = fs.listFiles(hp, true)
      val b = scala.collection.mutable.Buffer[org.apache.hadoop.fs.Path]()
      while (it.hasNext) b += it.next().getPath
      b.toSeq
    }
  }

  /** Child directories of `p` whose name starts with `prefix` —
    * the cell=/shard= layout walks, Hadoop-FS routed.
    */
  private def hfsChildDirs(spark: SparkSession, p: String,
      prefix: String): Seq[org.apache.hadoop.fs.Path] =
    graft.ops.hfsList(spark, p)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(_.getPath)

  /** Stage `e` as 8 time-ordered parquet files (micro-batch replay
    * order = event-time order, so the watermark advances monotonically).
    */
  private def stageTimeOrdered(e: DataFrame, dir: String): Unit = {
    val ranked = e.select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts"))
      .withColumn("part", ntile(8).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts"))))
      .cache()
    ranked.count()
    val spark = e.sparkSession
    for (p <- 1 to 8) {
      val tmp = s"$dir-tmp"
      ranked.filter(col("part") === p).drop("part")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = graft.ops.hfsList(spark, tmp).map(_.getPath)
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      graft.ops.hfsMkdirs(spark, dir)
      val (fs, dst) = graft.ops.hfs(spark, s"$dir/batch$p.parquet")
      if (fs.exists(dst)) fs.delete(dst, false)
      // rename returns false instead of throwing on object-store/
      // cross-FS failure modes — a silently dropped batch would make
      // the probe measure fewer replay windows without erroring
      require(fs.rename(part, dst), s"staging rename failed: $part -> $dst")
    }
    ranked.unpersist()
    ()
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

  /** dedup_components-shaped corpus at `factor`×: each scaled doc (its
    * token order is replica-permuted, so texts are distinct) plus a
    * planted exact copy and a planted last-token truncation — the same
    * triple structure Pipeline.componentCorpus builds from the fixture.
    */
  private def ccCorpus(docs: DataFrame, factor: Int): DataFrame = {
    val base = scaledDocs(docs, factor)
    base
      .unionByName(base.select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))
      .unionByName(base.select((col("doc_id") + 2000000000L).as("doc_id"),
        array_join(expr("slice(split(text, ' '), 1, size(split(text, ' ')) - 1)"), " ").as("text")))
  }

  /** Chained near-duplicates: `chains` clusters, each a PATH of
    * `depth`+1 variants of an 800-token doc where variant k has its
    * first k 50-token windows rewritten (noise tokens consistent
    * across variants). Adjacent variants share 15/16 windows (shingle
    * Jaccard ≈ 0.88 → edge at the 0.8 bar); variants 2 apart are at
    * ≈ 0.78 → NO edge — so the duplicate graph is a path of diameter
    * `depth`, the worst case for label propagation.
    */
  private def ccChainCorpus(spark: SparkSession, chains: Int, depth: Int): DataFrame =
    spark.range(chains.toLong).select(col("id").as("chain"),
        explode(sequence(lit(0), lit(depth))).as("step"))
      .select((col("chain") * 100 + col("step")).as("doc_id"),
        expr("""array_join(transform(sequence(0, 799), i ->
               |  CASE WHEN i < 50 * step THEN concat('n', chain, '_', i)
               |       ELSE concat('w', chain, '_', i) END), ' ')""".stripMargin).as("text"))

  def main(args: Array[String]): Unit = {
    // modes: all (default) | events | dedup | indexed | ann | state |
    // state-rocks | cc | ccdelta | ccchain | batchlog | bpe | decontam |
    // span | pq | pqres | beam | beamscan | ivfidx | ivfstream |
    // ivffilter | perq | geom |
    // sqrtn | twolevel | rcte | knn | phash | media | buckets |
    // triangles | pagerank — first non-numeric arg selects; numeric
    // args keep their meaning
    val modes = args.filter(a => !a.forall(_.isDigit) && a.nonEmpty).toSet
    def on(m: String) = modes.isEmpty || modes.contains(m)
    val nums = args.filter(a => a.nonEmpty && a.forall(_.isDigit))
    val maxFactor = nums.headOption.map(_.toInt).getOrElse(8)
    val docsFactor = nums.lift(1).map(_.toInt).getOrElse(maxFactor)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmpRoot = graft.ops.purgeOnExit(
      s"${graft.ops.scratchRoot(spark)}/scaleprobe_${ProcessHandle.current().pid()}")

    if (on("batchlog")) {
      // Many-small-files probe for the streaming index commit log:
      // ingest the documents corpus as MANY tiny windows (the
      // long-running-ingest regime), then measure label extraction and
      // on-disk file counts before and after generation consolidation
      // + edge compaction. The claim under test: read cost grows with
      // window count and consolidation returns it to O(1) directories
      // per half with byte-identical semantics (byte-equality itself
      // is spec-pinned in ExactlyOnceSpec; this probe measures cost).
      import graft.streaming.{BatchLog, ClusterStream}
      val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      val idx = s"$tmpRoot/blidx"
      val nWin = 48
      ClusterStream.seedIndex(spark, docs.limit(0), idx)
      val tIn0 = System.nanoTime()
      (0 until nWin).foreach { w =>
        ClusterStream.ingestBatch(spark,
          docs.filter(pmod(xxhash64(col("doc_id")), lit(nWin)) === w),
          idx, BatchLog.key("probe", w.toLong))
      }
      val ingestSecs = (System.nanoTime() - tIn0) / 1e9
      def labelSecs(): Double = {
        val t0 = System.nanoTime()
        ClusterStream.labels(spark, idx)._1.count()
        (System.nanoTime() - t0) / 1e9
      }
      def report(stage: String): Unit = {
        val dirs = Seq("hs", "bands", "digests", "edges")
          .map(h => s""""$h":${BatchLog.committedDirs(spark, idx, h).size}""")
          .mkString("{", ",", "}")
        val nf = hfsFilePaths(spark, idx).size
        val s1 = labelSecs(); val s2 = labelSecs()
        println(f"""{"shape":"batchlog_$stage","windows":$nWin,"dirs":$dirs,"files":$nf,"labels_secs":[$s1%.2f,$s2%.2f],"ingest_secs":$ingestSecs%.1f}""")
      }
      report("fragmented")
      val tc0 = System.nanoTime()
      ClusterStream.consolidateIndex(spark, idx)
      ClusterStream.compactIndex(spark, idx)
      val consolidateSecs = (System.nanoTime() - tc0) / 1e9
      println(f"""{"shape":"batchlog_consolidate_cost","secs":$consolidateSecs%.2f}""")
      report("consolidated")
    }

    if (on("bpe")) {
      // BPE training-cost split: the corpus-sized initial word count vs
      // the vocab-sized per-round pair-count/argmax. scaledDocs keeps
      // the TOKEN MULTISET of each replica identical (it only permutes
      // order), so the vocabulary is invariant across factors while
      // token instances grow by `factor` — exactly the regime where the
      // fast-BPE claim ("rounds don't touch the corpus") is testable:
      // count_secs should scale ~linearly, round_secs stay ~flat.
      val docsBase = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      for (factor <- Seq(1, 8, 64).filter(_ <= maxFactor)) {
        val dc = scaledDocs(docsBase, factor).repartition(cpus.toInt)
        val t0 = System.nanoTime()
        val reps = graft.ops.Text.bpeStartVocab(dc).localCheckpoint(true)
        val vocab = reps.count()
        val countSecs = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val (l, r, c) = graft.ops.Text.bpeTopPair(reps)
          .getOrElse(("", "", 0L)) // scaled fixture always has pairs
        val roundSecs = (System.nanoTime() - t1) / 1e9
        println(f"""{"shape":"bpe","factor":$factor,"vocab":$vocab,"count_secs":$countSecs%.2f,"round_secs":$roundSecs%.2f,"top":"$l+$r","cnt":$c}""")
        // rounds-to-vocab ratio of the batched trainer (VERDICT r12
        // #7): 16 merges through bpeLearnBatchedOver — the operator's
        // real path — reporting how many counting rounds they cost.
        // merges/rounds is the amortization factor a 30k-merge vocab
        // would enjoy; sequential is by definition 1.0.
        val t2 = System.nanoTime()
        val (bm, _, rounds) = graft.ops.Text.bpeLearnBatchedOver(reps, 16, 8)
        val batchedSecs = (System.nanoTime() - t2) / 1e9
        println(f"""{"shape":"bpe_batched","factor":$factor,"merges":${bm.length},"rounds":$rounds,"merges_per_round":${bm.length.toDouble / rounds}%.2f,"secs":$batchedSecs%.2f}""")
      }
    }

    if (on("decontam")) {
      // Fuzzy-decontamination scaling: the claim (PLANS.md) is O(train)
      // per pass with the eval side broadcast both times. Hold the eval
      // set FIXED (the base corpus's %50 slice) and grow only the train
      // side by replication octaves — cost should scale ~linearly with
      // the train factor, and the candidate count with the planted-leak
      // count, never train².
      import graft.ops.Text
      val docsBase = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      val evalDocs = docsBase.filter(col("doc_id") % 50 === 0)
      val ehs = Text.shingleHashes(evalDocs).cache()
      ehs.count()
      for (factor <- Seq(1, 8, 64).filter(_ <= maxFactor)) {
        // plain replication (id offset, text unchanged) — exactly what a
        // crawl's duplication looks like, and each replica of an
        // eval-adjacent doc must hit, so hits scale with the factor.
        // Materialize BEFORE t0: the timed section is the decontam pass
        // — Text.fuzzyPairs, the SAME code path the operator runs, with
        // the train hs cached so shingling+MinHashing is paid once.
        val train = docsBase.filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0), lit(factor - 1))).as("r"))
          .select((col("doc_id") * factor + col("r")).as("doc_id"), col("text"))
          .repartition(cpus.toInt).cache()
        train.count()
        val t0 = System.nanoTime()
        val ths = Text.shingleHashes(train).cache()
        val hits = Text.fuzzyPairs(ths, ehs)
          .filter(col("jac_micro") >= 500000)
          .count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"""{"shape":"decontam","train_factor":$factor,"hits":$hits,"secs":$secs%.2f}""")
        ths.unpersist(); train.unpersist()
      }
    }

    if (on("ann")) {
      val embBase = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      for (factor <- Seq(1, 64)) {
        val ec = scaledEmb(embBase, factor).repartition(cpus.toInt)
          .select(col("vec_id"), col("embedding"),
            sqrt(dotp(col("embedding"), col("embedding"))).as("nrm"),
            graft.ops.Vectors.bucket(col("embedding")).as("bkt"))
          .cache()
        val nVec = ec.count()
        for (ham <- Seq(0, 1, 2)) {
          val (recall, secs, scored) = annProbe(ec, ham)
          val probes = (0 until 256).count(m => Integer.bitCount(m) <= ham)
          println(f"""{"shape":"ann_multiprobe","factor":$factor,"rows":$nVec,"probes":$probes,"recall_at_3":$recall%.3f,"cand_pairs":$scored,"secs":$secs%.2f}""")
        }
        ec.unpersist()
      }
    }

    if (on("span")) {
      // span_dedup_apply octave via the operator's own spanDedupClean
      // (no drift). Two regimes:
      //  - realistic growth: replica r prefixes every token with r —
      //    disjoint vocabularies, so cross-replica grams never repeat
      //    and the repeated-span density stays the base corpus's;
      //    window rows and runtime should scale ~linearly;
      //  - adversarial: scaledDocs' md5-sort canonicalizes every doc's
      //    token ORDER globally, so docs become near-sorted sequences
      //    sharing massive substrings (~92% of all windows repeat) —
      //    the worst-case repeated-mass regime, probed at one factor to
      //    show the pipeline and its repeat-free residual survive it.
      def probe(label: String, dc0: DataFrame, factor: Int): Unit = {
        val dc = dc0.repartition(cpus.toInt).cache()
        val nDocs = dc.count()
        val t0 = System.nanoTime()
        val cleaned = graft.ops.Text.spanDedupClean(dc).cache()
        val stats = cleaned.agg(sum(col("n_tokens")), sum(col("n_dropped")))
          .collect()(0)
        val cleanSecs = (System.nanoTime() - t0) / 1e9
        val (toks, dropped) = (stats.getLong(0), stats.getLong(1))
        val t1 = System.nanoTime()
        val residual = graft.ops.Text
          .spanRepGramCount(cleaned, "cleaned_text", "n")
          .collect()(0).getLong(0)
        val residSecs = (System.nanoTime() - t1) / 1e9
        println(f"""{"shape":"$label","factor":$factor,"docs":$nDocs,"tokens":$toks,"dropped":$dropped,"dropped_frac_micro":${1000000L * dropped / toks},"residual_rep_grams":$residual,"clean_secs":$cleanSecs%.2f,"residual_secs":$residSecs%.2f}""")
        cleaned.unpersist(); dc.unpersist()
        spark.catalog.clearCache()
      }
      val docsBase = Tables.documents(spark, sfDir).select("doc_id", "text")
      for (factor <- Seq(1, 8, 32).filter(_ <= maxFactor)) {
        val distinctVocab = docsBase
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0), lit(factor - 1))).as("r"))
          .select((col("doc_id") * factor + col("r")).as("doc_id"),
            expr("""array_join(transform(split(text, ' '),
                   |  t -> concat('r', CAST(r AS STRING), '_', t)), ' ')""".stripMargin)
              .as("text"))
        probe("span_apply", distinctVocab, factor)
      }
      probe("span_apply_adversarial", scaledDocs(docsBase, 8), 8)
    }

    if (on("pq")) {
      // PQ/ADC octave: the claim (PLANS/SCALE) is strict linearity —
      // the encoder is one pass over the corpus (8 subspaces × 4 codes
      // per row against a broadcast codebook) and the ADC search joins
      // every code row to a broadcast query table, so candidate rows
      // are EXACTLY |Q|·(n−1) (one ADC sum per query×candidate, self
      // excluded). The probe runs the operator's own pqAdcChain (the
      // shared stage sim_pq_adc/sim_pq_rerank execute) and asserts the
      // exact count.
      val embBase = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      for (factor <- Seq(1, 8, 64).filter(_ <= maxFactor)) {
        val dir = s"$tmpRoot/pq_$factor"
        scaledEmb(embBase, factor).repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
        val t0 = System.nanoTime()
        val (_, adist) = graft.ops.Vectors.pqAdcChain(spark, dir)
        val adRows = adist.count()
        val secs = (System.nanoTime() - t0) / 1e9
        val expect = 20L * (n - 1)
        assert(adRows == expect, s"ADC candidate rows $adRows != ${expect}")
        println(f"""{"shape":"pq_adc","factor":$factor,"rows":$n,"adc_rows":$adRows,"expected":$expect,"secs":$secs%.2f}""")
        spark.catalog.clearCache()
      }
    }

    if (on("pqres")) {
      // Residual-vs-flat PQ encoding (sim_ivf_pq_residual vs
      // sim_ivf_pq) is a STRUCTURE dial, not a free win — and at the
      // keys' deliberately brutal 2 bits/subspace the requirement is
      // sharper than "the corpus has clusters": residual encoding
      // wins exactly when the WITHIN-cell residual distribution is
      // itself coverable by the 4-entry sub-codebooks. The synthetic
      // embeddings fixture is isotropic (~0.5% between-label
      // variance, measured), so there flat ≈ residual within noise
      // (SCALE.md table). This probe plants both regimes over a
      // corpus of 8 planted clusters (rows at the historical seed ids
      // sit exactly ON their cluster center; since round 15 the
      // operators train their own scaled-Lloyd quantizer over the
      // corpus, whose cells sub-divide the planted clusters — the
      // within-CELL residual keeps the planted per-subspace offset
      // structure up to a constant shift, which a codebook covers
      // exactly) and every other row is center + residual:
      //   iso        — residual = i.i.d. noise. Even with strong
      //                coarse clusters, 4 codes cannot rank ~2k
      //                near-equidistant cell members: flat ≈
      //                residual ≈ chance. Coarse structure ALONE
      //                does not buy the lift.
      //   structured — residual = per-subspace choice among 4 shared
      //                offsets (+ tiny jitter): the product space
      //                (4^8 codewords) is exactly what a PQ residual
      //                codebook can represent and a flat center-bred
      //                codebook cannot (every cell member flat-codes
      //                to its own center ⇒ intra-cell ADC ties).
      //                The 4 residual-seed rows are planted on the 4
      //                offset indices so the learned codebook covers
      //                them — the miniature of FAISS training the
      //                sub-quantizers on residuals (Jégou 2011 §II).
      // Both legs run the operators' OWN adist chains (no-drift rule)
      // over the written corpus; candidate counts are asserted equal
      // (identical coarse assignment ⇒ identical scan — the recall
      // difference is pure ranking).
      val n = 16000L
      for ((regime, os, js) <- Seq(("iso", 0.0, 0.60), ("structured", 0.40, 0.05))) {
        val dir = s"$tmpRoot/pqres_$regime"
        plantedClusterCorpus(spark, dir, n, os, js)
        val t0 = System.nanoTime()
        def top3AndCount(ad: org.apache.spark.sql.DataFrame): (Set[(Long, Long)], Long) = {
          val c = ad.cache()
          val cnt = c.count()
          val top = graft.ops.Vectors.ivfPqTop3(c).select("q_id", "c_id")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          (top, cnt)
        }
        val (flatTop, nFlat) = top3AndCount(graft.ops.Vectors.ivfPqFlatAdist(spark, dir))
        val (resTop, nRes) = top3AndCount(graft.ops.Vectors.ivfPqResidualAdist(spark, dir))
        val secs = (System.nanoTime() - t0) / 1e9
        assert(nFlat == nRes,
          s"equal-scan violated: flat candidates $nFlat != residual $nRes")
        // exact micro-unit L2 ground truth (20 broadcast queries)
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), expr(
            "transform(embedding, x -> cast(floor(cast(x as double) * 1000000 + 0.5) as bigint))")
            .as("qe"))
        val q = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("qe").as("qq"))
        val d2 = aggregate(zip_with(col("qq"), col("qe"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("d2"), col("c_id"))
        val gt = e.select(col("vec_id").as("c_id"), col("qe"))
          .join(broadcast(q), col("c_id") =!= col("q_id"))
          .select(col("q_id"), col("c_id"), d2.as("d2"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select("q_id", "c_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val rf = flatTop.count(gt.contains) / gt.size.toDouble
        val rr = resTop.count(gt.contains) / gt.size.toDouble
        println(f"""{"shape":"pqres","regime":"$regime","rows":$n,"cand_flat":$nFlat,"cand_res":$nRes,"recall_flat":$rf%.3f,"recall_res":$rr%.3f,"secs":$secs%.1f}""")
        spark.catalog.clearCache()
      }
    }

    if (on("beam")) {
      // Graph-ANN (sim_graph_beam) vs the IVF dial at matched
      // candidate budgets, on BOTH corpus regimes: the isotropic
      // fixture (ANN-adversarial — a knn graph over uniform-random
      // vectors has no navigable small-world structure, so greedy
      // beam gets stuck near its entries) and the planted clustered
      // corpus (where proximity graphs actually navigate). Each dial
      // runs the OPERATOR's own beamParts chain; candidates counted
      // from the operator's per-round frames; recall@3 vs exact
      // micro-unit L2 brute force over the 20 queries.
      for (regime <- Seq("fixture", "structured")) {
        val dir = if (regime == "fixture") sfDir else {
          val d0 = s"$tmpRoot/beam_structured"
          plantedClusterCorpus(spark, d0, 16000L, 0.40, 0.05)
          d0
        }
        // exact L2 ground truth through the same micro-unit frame
        // 100 queries, not the operators' 20: recall over 20 queries
        // has a ±0.05–0.07 sampling band that made successive probe
        // runs look like regressions (r16); the keys stay at 20, the
        // MEASUREMENT widens
        val e0 = graft.ops.Vectors.microVecs(spark, dir)
        val q = e0.filter(col("vec_id") < 100)
          .select(col("vec_id").as("q_id"), col("qe").as("qq"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("d2"), col("c_id"))
        val gt = e0.select(col("vec_id").as("c_id"), col("qe"))
          .join(broadcast(q), col("c_id") =!= col("q_id"))
          .select(col("q_id"), col("c_id"),
            aggregate(zip_with(col("qq"), col("qe"), (x, y) => (x - y) * (x - y)),
              lit(0d), (acc, v) => acc + v).cast("bigint").as("d2"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select("q_id", "c_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        for ((bw, rounds, deg) <- Seq((8, 3, 3), (16, 3, 3), (32, 5, 3),
            (8, 3, 8), (16, 5, 8), (32, 5, 8))) {
          val t0 = System.nanoTime()
          val (cands, beamDf) =
            graft.ops.Vectors.beamParts(spark, dir, 100L, bw, rounds, deg)
          val nCand = cands.map(_.count()).sum
          val top3 = beamDf
            .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
            .select("q_id", "c_id")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          val secs = (System.nanoTime() - t0) / 1e9
          val rec = top3.count(gt.contains) / gt.size.toDouble
          println(f"""{"shape":"beam","regime":"$regime","beam":$bw,"rounds":$rounds,"degree":$deg,"candidates":$nCand,"recall":$rec%.3f,"secs":$secs%.1f}""")
          spark.catalog.clearCache()
        }
      }
    }

    if (on("beamscan")) {
      // Per-round SCANNED ROWS of the bucket-pruned beam serve (r19,
      // VERDICT r18 #1): the flat layout re-scanned the full edge
      // list (n·degree rows) and the full float corpus every
      // expansion round; the bucketed graph reads ≤ frontier-buckets
      // × ~125·degree edge rows and ≤ expansion-buckets × ~125 vector
      // rows per round — QUERY-sized, so the per-round read must stay
      // FLAT across the corpus octave once bMod exceeds the
      // frontier's residue count (the single-query row is the clean
      // flat signal; the 20-query batch flattens past factor 8).
      val embBase = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      for (factor <- Seq(1, 8, 64).filter(_ <= maxFactor)) {
        val dir = s"$tmpRoot/beamscan_$factor"
        scaledEmb(embBase, factor).repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
        graft.ops.Vectors.stagedKnnGraph(spark, dir, degree = 8) // untimed build
        for (qb <- Seq(1L, 20L)) {
          val reads = scala.collection.mutable.Buffer[(DataFrame, DataFrame)]()
          val t0 = System.nanoTime()
          val (_, beamDf) = graft.ops.Vectors.beamParts(spark, dir, qb,
            beamW = 8, rounds = 3, degree = 8, reads = Some(reads))
          beamDf.count()
          val secs = (System.nanoTime() - t0) / 1e9
          val eRows = reads.map(_._1.count()).mkString("[", ",", "]")
          val eFiles = reads.map(_._1.inputFiles.length).mkString("[", ",", "]")
          val vRows = reads.map(_._2.count()).mkString("[", ",", "]")
          val vFiles = reads.map(_._2.inputFiles.length).mkString("[", ",", "]")
          println(f"""{"shape":"beam_scan","factor":$factor,"rows":$n,"queries":$qb,"edge_rows_total":${n * 8},"edge_rows_read":$eRows,"edge_files_read":$eFiles,"vec_rows_read":$vRows,"vec_files_read":$vFiles,"secs":$secs%.1f}""")
          spark.catalog.clearCache()
        }
        // FILTERED + TOMBSTONED serve at the same dial (r20): the
        // label predicate sits below the accumulator's BeamTopW cut
        // (a query-sized wanted-label broadcast) and the tombstone
        // anti-join below the expansion — the tombstone side is
        // DELETE-SET-sized (~n/17 under the %17 rule: it grows with
        // the corpus, and a deployment whose delete set outgrows
        // broadcast would key it on the candidates' buckets instead —
        // r20 advice), so the claim here is only that the per-round
        // BUCKET reads stay in the unfiltered 20-query dial's class
        // (navigation is unfiltered by design: hnswlib/FAISS
        // IDSelector semantics), and the persisted scored leaf means
        // the accumulator's second consumption of each round's scored
        // frame re-reads NO vector buckets.
        {
          val reads = scala.collection.mutable.Buffer[(DataFrame, DataFrame)]()
          val t0 = System.nanoTime()
          val (_, beamDf) = graft.ops.Vectors.beamParts(spark, dir, 20L,
            beamW = 8, rounds = 3, degree = 8, reads = Some(reads),
            labelMod = Some(4), tomb = true)
          beamDf.count()
          val secs = (System.nanoTime() - t0) / 1e9
          val eRows = reads.map(_._1.count()).mkString("[", ",", "]")
          val vRows = reads.map(_._2.count()).mkString("[", ",", "]")
          println(f"""{"shape":"beam_scan_filtered","factor":$factor,"rows":$n,"queries":20,"edge_rows_total":${n * 8},"edge_rows_read":$eRows,"vec_rows_read":$vRows,"secs":$secs%.1f}""")
          spark.catalog.clearCache()
        }
      }
    }

    if (on("ivfidx")) {
      // Persisted IVF×PQ index serve: the claim (SCALE.md / PLANS.md)
      // is that the inverted lists land on disk PARTITIONED BY cell,
      // so a serve scan reads files ∝ nprobe/cells — literal directory
      // pruning, independent of everything outside the probed cells.
      // The probe builds the staged index once per replicated corpus,
      // then for each nprobe counts the files the PRUNED single-query
      // scan enumerates (distinct input_file_name over the operator's
      // own lists frame) against the index total, and times the full
      // 20-query serve at that nprobe.
      val embBase = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      for (factor <- Seq(1, 8, 64).filter(_ <= maxFactor)) {
        val dir = s"$tmpRoot/ivfidx_$factor"
        scaledEmb(embBase, factor).repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
        val idx = graft.ops.Vectors.stagedIvfPqIndex(spark, dir) // untimed — once per corpus
        val total = hfsFilePaths(spark, s"$idx/lists")
          .count(_.getName.endsWith(".parquet"))
        for (nprobe <- Seq(1, 2, 4, 8)) {
          val (lists1, _, _) =
            graft.ops.Vectors.ivfPqIndexedParts(spark, dir, 1L, nprobe)
          val read1 = lists1.select(input_file_name()).distinct().count()
          // the scaled-quantizer claim: per-query SCANNED CODES stay
          // FLAT across the octaves (≈ nprobe·perCell·8 subspace
          // rows), because cells grows ∝ n — the fixed-8-seed
          // quantizer scanned nprobe·n/8 here instead
          val codes1 = lists1.count()
          val t0 = System.nanoTime()
          val out = graft.ops.Vectors.ivfPqIndexedServe(spark, dir, 20L, nprobe).count()
          val secs = (System.nanoTime() - t0) / 1e9
          println(f"""{"shape":"ivfpq_indexed","factor":$factor,"rows":$n,"nprobe":$nprobe,"files_read_q1":$read1,"codes_read_q1":$codes1,"files_total":$total,"out_rows":$out,"secs":$secs%.2f}""")
          spark.catalog.clearCache()
        }
      }
    }

    if (on("ivfstream")) {
      // Streaming IVF×PQ ingest octave: the claim (PLANS.md) is that
      // the per-micro-batch plan is Scan → Project → posexplode →
      // FileSink with ZERO exchanges, so ingest cost is per-row flat —
      // 64× the arrivals cost ~64× the wall clock on fixed cores,
      // never worse (no shuffle, no state store to grow). The probe
      // streams each scaled corpus through the REAL operator code
      // (frozen quantizers from the batch build, untimed — trained
      // once) in 4 micro-batches, and reports rows/s plus the on-disk
      // append layout (files per cell directory grows with COMMITS,
      // not rows — the compaction story BatchLog already measures).
      // The 256× octave (4,096 cells at the sf0.1 base) is the r16
      // two-level acceptance gate: per-row encode cost must read FLAT
      // there, where the r15 flat assigner was O(cells) per row
      // (84 s at the 64×/1,024-cell octave — total ingest O(n²/125)).
      val embBase = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      for (factor <- Seq(1, 8, 64, 256).filter(_ <= maxFactor)) {
        val dir = s"$tmpRoot/ivfstream_$factor"
        scaledEmb(embBase, factor).repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
        graft.ops.Vectors.stagedIvfPqResIndex(spark, dir) // quantizers: once, untimed
        val t0 = System.nanoTime()
        val idx = graft.ops.Vectors.streamIvfPqIngest(spark, dir,
          srcDir = Some(s"$dir/embeddings.parquet"),
          maxFilesPerTrigger = Some(math.max(1, cpus.toInt / 4)))
        val secs = (System.nanoTime() - t0) / 1e9
        val rows = spark.read.parquet(idx).count()
        val cellDirs = hfsChildDirs(spark, idx, "cell=")
        val filesPerCell = cellDirs.map(cd =>
          graft.ops.hfsList(spark, cd.toString)
            .count(_.getPath.getName.endsWith(".parquet")))
        // serve cost on the raw streamed layout vs the compacted one
        // (one file per cell): same rows, fewer open/footer costs
        val quant = graft.ops.Vectors.stagedIvfPqResIndex(spark, dir) // stamped: no rebuild
        def warmServe(lists: String): Double = {
          graft.ops.Vectors.resIndexServe(spark, dir, lists, quant).count()
          val t0 = System.nanoTime()
          graft.ops.Vectors.resIndexServe(spark, dir, lists, quant).count()
          (System.nanoTime() - t0) / 1e9
        }
        val sStream = warmServe(idx)
        val comp = graft.ops.Vectors.compactStreamedLists(spark, idx)
        val sComp = warmServe(s"$comp/lists")
        // r17 layout: compacted cell dirs nest under shard=K — walk
        // both levels; dirs_listed_serve is the LISTING-cost metric
        // the shard level exists to bound (directories a compacted
        // 2-cell serve enumerates: probed shards' subtrees only,
        // vs every cell dir in the flat layout)
        val compShards = hfsChildDirs(spark, s"$comp/lists", "shard=")
        val compCellDirs = compShards
          .flatMap(sh => hfsChildDirs(spark, sh.toString, "cell="))
        val cFiles = compCellDirs.map(cd =>
          graft.ops.hfsList(spark, cd.toString)
            .count(_.getPath.getName.endsWith(".parquet"))).sum
        // r18 guard telemetry (VERDICT r17 #3): the driver-side
        // frozen-quantizer collect the geometry rule bounds — rows
        // and the guard's own per-row heap estimate at this octave
        // (4,096 cells at factor 256). streamIvfPqIngest now REFUSES
        // geometries past 6M cells / 4 GiB; this records how far
        // under the budget the measured octaves sit.
        val qcells = spark.read.parquet(s"$quant/centroids").count()
        val qsups = spark.read.parquet(s"$quant/supers").count()
        val qchl = spark.read.parquet(s"$quant/children").count()
        val collectedBytes = (qcells + qsups) * 600L + qchl * 48L + 256L * 120L
        println(f"""{"shape":"ivfpq_stream","factor":$factor,"vectors":$n,"code_rows":$rows,"secs":$secs%.1f,"rows_per_sec":${(n / secs).toLong},"us_per_row":${secs * 1e6 / n}%.1f,"cells":${cellDirs.length},"files_per_cell_max":${filesPerCell.max},"serve_streamed_s":$sStream%.2f,"serve_compacted_s":$sComp%.2f,"compacted_files":$cFiles,"shards":${compShards.size},"dirs_per_shard_mean":${if (compShards.isEmpty) 0 else compCellDirs.size / compShards.size},"quant_collect_rows":${qcells + qsups + qchl + 256},"quant_collect_bytes_est":$collectedBytes}""")
        spark.catalog.clearCache()
      }
    }

    if (on("ivffilter")) {
      // Filtered-ANN serving dial: a filter of selectivity s thins
      // each probed cell to s·|cell|, so the fraction of queries that
      // still get their full k grows with nprobe and shrinks with
      // 1/s. The probe runs the OPERATOR'S chain (filteredTop3) on
      // the 64×-scaled corpus with synthesized labels
      // label = vec_id mod M (selectivity 1/M) and reports, per
      // (M, nprobe), how many of the 20 queries got all 3 matches and
      // the mean returned count — the table that tells a serving
      // deployment how to set nprobe for a given filter.
      val embBase = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      val factor = math.min(64, maxFactor)
      val e0 = scaledEmb(embBase, factor).repartition(cpus.toInt)
        .select(col("vec_id"), pmod(col("vec_id"), lit(10000)).as("label"),
          expr("transform(embedding, x -> floor(cast(x AS DOUBLE) * 1000000d + 0.5d))").as("qe"))
        .cache()
      val n = e0.count()
      // sweep past 8 where the serving rule nprobe ≳ k/(s·|cell|)
      // says the full-k plateau lives at THIS geometry (n/125 cells,
      // |cell| = 125): 1/1000 → 3/0.125 = 24 (64 = 2.7× margin);
      // 1/10000 → 240 of the 1,024 cells — the rule's own statement
      // that pre-filtered IVF degrades toward a flat scan at sharp
      // filters (the ACORN adaptive flip exists for exactly that).
      // Wide dials only widen the QUERY routing (w = nprobe on 20
      // rows); corpus assignment stays w = 2 (filteredTop3 r17).
      val probesFor = Map(10 -> Seq(1, 2, 4, 8),
        1000 -> Seq(1, 2, 4, 8, 24, 64), 10000 -> Seq(1, 2, 4, 8, 240))
      for (m <- Seq(10, 1000, 10000); nprobe <- probesFor(m)) {
        val lab = e0.select(col("vec_id"),
          pmod(col("vec_id"), lit(m)).cast("int").as("label"), col("qe"))
        val out = graft.ops.Vectors.filteredTop3(lab, nprobe, labelMod = m)
          .groupBy("q_id").count()
        val perQ = out.collect().map(_.getLong(1))
        val fullK = perQ.count(_ == 3L)
        val mean = if (perQ.isEmpty) 0.0 else perQ.sum.toDouble / 20
        println(f"""{"shape":"ivf_filtered","rows":$n,"selectivity":"1/$m","nprobe":$nprobe,"queries_full_k":$fullK,"mean_returned":$mean%.2f}""")
        spark.catalog.clearCache()
        e0.cache(); e0.count()
      }
    }

    if (on("perq")) {
      // Serving-rule octave for the per-query-width keys (r19,
      // VERDICT r18 #5): the claim is that wide widths are paid on
      // the QUERY frame only — the wMax routing frame is ≤ |Q|·wMax
      // rows and the per-query candidates track w·perCell·selectivity
      // — while corpus-side work stays the w = 2 assignment every
      // serve already does. Each factor re-runs the REAL key chain
      // (perQueryWServe) and records the width histogram, the routing
      // and trimmed-plan row counts, and the scanned candidates.
      val embBase = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      for (factor <- Seq(1, 8, 64).filter(_ <= maxFactor)) {
        val dir = s"$tmpRoot/perq_$factor"
        scaledEmb(embBase, factor).repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
        // stage the per-factor quantizer OUTSIDE the timed region
        // (r20, VERDICT r19 #7): the table exists to show SERVE cost,
        // and the octave's wall clock was dominated by quantizer
        // training — ingest-time work every serve path amortizes.
        // Same integer geometry formula as perQueryWServe, so the
        // serve below finds the artifact fresh.
        graft.ops.Vectors.stagedIvfCent(spark, dir, math.max(1L,
          n / (4L * math.ceil(math.sqrt(n.toDouble)).toLong)))
        val trace = scala.collection.mutable.Map[String, DataFrame]()
        val t0 = System.nanoTime()
        val out = graft.ops.Vectors.perQueryWServe(spark, dir, Some(trace)).cache()
        val rows = out.count()
        val secs = (System.nanoTime() - t0) / 1e9
        val widths = out.filter(col("route") === "ivf")
          .groupBy("w").agg(countDistinct("q_id").as("q"))
          .collect().map(r => s""""${r.getLong(0)}":${r.getLong(1)}""")
          .sorted.mkString("{", ",", "}")
        val exactQ = out.filter(col("route") === "exact")
          .select("q_id").distinct().count()
        val routed = trace("probeR").count()
        val trimmed = trace("probes").count()
        val cands = trace("ivfCand").count()
        println(f"""{"shape":"perq","factor":$factor,"rows":$n,"out_rows":$rows,"widths":$widths,"exact_queries":$exactQ,"routing_rows":$routed,"trimmed_probe_rows":$trimmed,"ivf_candidates":$cands,"secs":$secs%.1f}""")
        out.unpersist(); spark.catalog.clearCache()
      }
    }

    if (on("geom")) {
      // Quantizer GEOMETRY dial (r16): cells = ⌈n/125⌉ keeps per-query
      // scanned codes FLAT but grows the centroid artifact linearly
      // with the corpus (~8M centroids ≈ 4 GB at 10⁹ vectors — heavy
      // to ship, and the super layer only softens the ROUTING cost,
      // not the artifact). The FAISS guidance is cells ≈ 4√n…16√n:
      // artifact and per-cell scan both grow as √n. The probe measures
      // the recall / scanned-codes / artifact-size triangle for the
      // three dials on one octave, through the operator's own
      // two-level chain (scaledLloydCent + coarseRanked), so PLANS.md
      // can state which geometry production picks at which corpus
      // size — same exact-d2 top-3 serve on the probed cells for all
      // three, only the geometry moves.
      val embBase = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      val factor = math.min(64, maxFactor)
      val dir = s"$tmpRoot/geom_$factor"
      scaledEmb(embBase, factor).repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val e0 = graft.ops.Vectors.microVecs(spark, dir).cache()
      val n = e0.count()
      // 100-query measurement (see the beam leg's sampling note)
      val q = e0.filter(col("vec_id") < 100)
        .select(col("vec_id").as("q_id"), col("qe").as("qq"))
      val wTop = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("d2"), col("c_id"))
      def sqd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
          lit(0d), (acc, v) => acc + v).cast("bigint")
      val gt = e0.select(col("vec_id").as("c_id"), col("qe").as("ce"))
        .join(broadcast(q), col("c_id") =!= col("q_id"))
        .select(col("q_id"), col("c_id"), sqd(col("qq"), col("ce")).as("d2"))
        .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
        .select("q_id", "c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rootN = math.sqrt(n.toDouble)
      for ((geom, perCell) <- Seq(
          ("n/125", 125L),
          ("4sqrt(n)", math.max(1L, (rootN / 4).toLong)),
          ("16sqrt(n)", math.max(1L, (rootN / 16).toLong)))) {
        val t0 = System.nanoTime()
        val cent = graft.ops.Vectors.scaledLloydCent(e0, perCell).cache()
        val cells = cent.count()
        val ranked = graft.ops.Vectors.coarseRanked(e0, cent, 2).cache()
        ranked.count()
        val asg = ranked.filter(col("rn") === 1)
          .select(col("vec_id").as("c_id"), col("cid").as("cell"))
        val probes = ranked.filter(col("vec_id") < 100)
          .select(col("vec_id").as("q_id"), col("cid").as("pcell"))
        val cand = asg.join(broadcast(probes),
          col("cell") === col("pcell") && col("c_id") =!= col("q_id"))
        val nCand = cand.count()
        val top3 = cand
          .join(e0.select(col("vec_id").as("c_id"), col("qe").as("ce")), Seq("c_id"))
          .join(broadcast(q), Seq("q_id"))
          .select(col("q_id"), col("c_id"), sqd(col("qq"), col("ce")).as("d2"))
          .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
          .select("q_id", "c_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val secs = (System.nanoTime() - t0) / 1e9
        val rec = top3.count(gt.contains) / gt.size.toDouble
        println(f"""{"shape":"geom","rows":$n,"geometry":"$geom","per_cell_target":$perCell,"cells":$cells,"artifact_rows":$cells,"cand_total":$nCand,"cand_per_q":${nCand / 100},"recall":$rec%.3f,"secs":$secs%.1f}""")
        ranked.unpersist(); cent.unpersist()
        spark.catalog.clearCache(); e0.cache(); e0.count()
      }
      e0.unpersist()
    }

    if (on("sqrtn")) {
      // The ORACLED √n production geometry (`sim_ivf_sqrtn`, r17):
      // perCell = max(1, n ÷ 4⌈√n⌉) — pure integer arithmetic both
      // engines mirror exactly. The geom leg priced the 4√n dial
      // through the probe-side approximation perCell = ⌊√n/4⌋; this
      // leg re-runs the SAME two-level serve (scaledLloydCent +
      // coarseRanked, nprobe = 2, exact-d2 top-3, 100-query recall)
      // through the ORACLED formula at 1× (the corpus the key
      // hash-verifies on) and at the geom table's 64× octave, so the
      // probe table's artifact/scan/recall numbers demonstrably
      // reproduce through the oracled chain rather than through a
      // probe-only variant of it.
      val embBase = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      for (factor <- Seq(1, 64).filter(_ <= math.max(1, maxFactor))) {
        val dir = s"$tmpRoot/sqrtn_$factor"
        scaledEmb(embBase, factor).repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        val e0 = graft.ops.Vectors.microVecs(spark, dir).cache()
        val n = e0.count()
        val q = e0.filter(col("vec_id") < 100)
          .select(col("vec_id").as("q_id"), col("qe").as("qq"))
        val wTop = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("d2"), col("c_id"))
        def sqd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
          aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
            lit(0d), (acc, v) => acc + v).cast("bigint")
        val gt = e0.select(col("vec_id").as("c_id"), col("qe").as("ce"))
          .join(broadcast(q), col("c_id") =!= col("q_id"))
          .select(col("q_id"), col("c_id"), sqd(col("qq"), col("ce")).as("d2"))
          .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
          .select("q_id", "c_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        // the key's integer formula, verbatim (Vectors.scala sim_ivf_sqrtn)
        val perCell = math.max(1L,
          n / (4L * math.ceil(math.sqrt(n.toDouble)).toLong))
        val t0 = System.nanoTime()
        val cent = graft.ops.Vectors.scaledLloydCent(e0, perCell).cache()
        val cells = cent.count()
        val ranked = graft.ops.Vectors.coarseRanked(e0, cent, 2).cache()
        ranked.count()
        val asg = ranked.filter(col("rn") === 1)
          .select(col("vec_id").as("c_id"), col("cid").as("cell"))
        val probes = ranked.filter(col("vec_id") < 100)
          .select(col("vec_id").as("q_id"), col("cid").as("pcell"))
        val cand = asg.join(broadcast(probes),
          col("cell") === col("pcell") && col("c_id") =!= col("q_id"))
        val nCand = cand.count()
        val top3 = cand
          .join(e0.select(col("vec_id").as("c_id"), col("qe").as("ce")), Seq("c_id"))
          .join(broadcast(q), Seq("q_id"))
          .select(col("q_id"), col("c_id"), sqd(col("qq"), col("ce")).as("d2"))
          .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
          .select("q_id", "c_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val secs = (System.nanoTime() - t0) / 1e9
        val rec = top3.count(gt.contains) / gt.size.toDouble
        val sups = math.max(1L, math.ceil(math.sqrt(cells.toDouble)).toLong)
        println(f"""{"shape":"sqrtn","rows":$n,"per_cell":$perCell,"cells":$cells,"sups":$sups,"artifact_rows":$cells,"cand_total":$nCand,"cand_per_q":${nCand / 100},"recall":$rec%.3f,"secs":$secs%.1f}""")
        ranked.unpersist(); cent.unpersist(); e0.unpersist()
        spark.catalog.clearCache()
      }
    }

    if (on("twolevel")) {
      // The two-level router is APPROXIMATE: an item's true nearest
      // centroid can live outside its routed super (the same trade
      // FAISS IMI / k-means-tree assignment makes). Price the
      // approximation against the FLAT argmin over the same centroid
      // set at the 64× octave: (a) assignment agreement — fraction of
      // vectors whose routed cell equals the flat argmin cell; (b)
      // probe-set overlap at nprobe = 2; (c) end recall of the
      // exact-d2 top-3 serve under both routings vs brute force. The
      // honest reading this buys: what the O(√cells) routing costs in
      // quality, next to what it saves in work (the ivfstream and
      // geom tables).
      val embBase = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      val factor = math.min(64, maxFactor)
      for (regime <- Seq("isotropic", "structured")) {
      val dir = s"$tmpRoot/twolevel_${regime}_$factor"
      if (regime == "isotropic")
        scaledEmb(embBase, factor).repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      else plantedClusterCorpus(spark, dir, 128000L, 0.40, 0.05)
      val e0 = graft.ops.Vectors.microVecs(spark, dir).cache()
      val n = e0.count()
      val cent = graft.ops.Vectors.scaledLloydCent(e0).cache()
      val cells = cent.count()
      def cd2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        graft.functions.DotProduct.dotp(a, a) -
          lit(2) * graft.functions.DotProduct.dotp(a, b) +
          graft.functions.DotProduct.dotp(b, b)
      // flat argmin over the SAME centroids (the r15 routing)
      val wF = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("d2c"), col("cid"))
      val flat = e0.join(broadcast(cent))
        .select(col("vec_id"), col("cid"), cd2(col("qe"), col("ce")).as("d2c"))
        .withColumn("rn", row_number().over(wF)).filter(col("rn") <= 2)
        .cache()
      val two = graft.ops.Vectors.coarseRanked(e0, cent, 2).cache()
      val agree = two.filter(col("rn") === 1)
        .select(col("vec_id"), col("cid").as("tc"))
        .join(flat.filter(col("rn") === 1)
          .select(col("vec_id"), col("cid").as("fc")), Seq("vec_id"))
        .filter(col("tc") === col("fc")).count()
      val probeOverlap = two.select(col("vec_id"), col("cid"))
        .intersect(flat.select(col("vec_id"), col("cid"))).count()
      // serve recall both ways: exact-d2 top-3 over the probed cells
      // 100-query measurement (see the beam leg's sampling note)
      val q = e0.filter(col("vec_id") < 100)
        .select(col("vec_id").as("q_id"), col("qe").as("qq"))
      def sqd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
          lit(0d), (acc, v) => acc + v).cast("bigint")
      val wTop = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("d2"), col("c_id"))
      val gt = e0.select(col("vec_id").as("c_id"), col("qe").as("ce"))
        .join(broadcast(q), col("c_id") =!= col("q_id"))
        .select(col("q_id"), col("c_id"), sqd(col("qq"), col("ce")).as("d2"))
        .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
        .select("q_id", "c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recallOf(ranked: org.apache.spark.sql.DataFrame): Double = {
        val asg = ranked.filter(col("rn") === 1)
          .select(col("vec_id").as("c_id"), col("cid").as("cell"))
        val probes = ranked.filter(col("vec_id") < 100)
          .select(col("vec_id").as("q_id"), col("cid").as("pcell"))
        val top3 = asg.join(broadcast(probes),
            col("cell") === col("pcell") && col("c_id") =!= col("q_id"))
          .join(e0.select(col("vec_id").as("c_id"), col("qe").as("ce")), Seq("c_id"))
          .join(broadcast(q), Seq("q_id"))
          .select(col("q_id"), col("c_id"), sqd(col("qq"), col("ce")).as("d2"))
          .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
          .select("q_id", "c_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        top3.count(gt.contains) / gt.size.toDouble
      }
      val recTwo = recallOf(two)
      val recFlat = recallOf(flat)
      println(f"""{"shape":"twolevel","regime":"$regime","rows":$n,"cells":$cells,"asg_agree":${agree.toDouble / n}%.4f,"probe_overlap":${probeOverlap.toDouble / (2 * n)}%.4f,"recall_two_level":$recTwo%.3f,"recall_flat":$recFlat%.3f}""")
      two.unpersist(); flat.unpersist(); cent.unpersist(); e0.unpersist()
      spark.catalog.clearCache()
      }
    }

    if (on("knn")) {
      // k-NN graph octave: candidate pairs are Σ|cell|·(|cell|−1) by
      // construction (cell-keyed self-join), asserted exactly against
      // the cell histogram. With the 8 FIXED seed cells the sum is
      // n²/8-shaped — the probe prints the prediction at every octave
      // but only executes it while the pair count stays executable;
      // the production dial (SemDeDup/IVF: k grows with the corpus so
      // cells stay bounded) is the k = 8·factor leg, which holds
      // per-cell size flat and total candidates linear — that leg runs
      // at every octave.
      val embBase = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      for (factor <- Seq(1, 8, 64).filter(_ <= maxFactor)) {
        val ec = scaledEmb(embBase, factor).repartition(cpus.toInt).cache()
        val n = ec.count()
        for (k <- Seq(8, 8 * factor).distinct) {
          val cent = ec.filter(col("vec_id") < k)
            .select(col("vec_id").as("cid"), col("embedding").as("ce"))
          val d2 = dotp(col("embedding"), col("embedding")) -
            lit(2) * dotp(col("embedding"), col("ce")) + dotp(col("ce"), col("ce"))
          // the documented at-scale assignment shape: broadcast expand
          // collapsed by a partial min(struct) — no window sort
          val asg = ec.join(broadcast(cent))
            .groupBy(col("vec_id"))
            .agg(min(struct(d2.as("d2"), col("cid"))).as("best"))
            .select(col("vec_id"), col("best.cid").as("cell"))
            .cache()
          asg.count()
          val predicted = asg.groupBy(col("cell")).count()
            .agg(sum(col("count") * (col("count") - 1)).cast("long"))
            .collect()(0).getLong(0)
          val (measured, secs) =
            if (predicted <= 300000000L) {
              val t0 = System.nanoTime()
              val m = asg.as("a").join(asg.as("b"),
                col("a.cell") === col("b.cell") &&
                  col("a.vec_id") =!= col("b.vec_id")).count()
              (m, (System.nanoTime() - t0) / 1e9)
            } else (-1L, -1.0) // n²/k regime: prediction only
          if (measured >= 0)
            assert(measured == predicted, s"knn pairs $measured != $predicted")
          println(f"""{"shape":"knn_cand","factor":$factor,"rows":$n,"k":$k,"predicted_pairs":$predicted,"measured_pairs":$measured,"secs":$secs%.2f}""")
          asg.unpersist()
        }
        // the OPERATOR's scaled dial (knn_graph_scaled, round 14):
        // cells = max(8, ⌈n/125⌉) inside knnEdgesScaled itself —
        // candidate histogram read from the operator's own centroid
        // rule (scaledKnnCentroids), execution through the operator's
        // real edge chain; per-row candidates must hold ≈ flat
        {
          val dir = s"$tmpRoot/knnsc_$factor"
          ec.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
          val e2 = spark.read.parquet(s"$dir/embeddings.parquet")
          val cent = graft.ops.Vectors.scaledKnnCentroids(e2, 125L)
          val d2s = dotp(col("embedding"), col("embedding")) -
            lit(2) * dotp(col("embedding"), col("ce")) + dotp(col("ce"), col("ce"))
          val asgS = e2.join(broadcast(cent))
            .groupBy(col("vec_id"))
            .agg(min(struct(d2s.as("d2"), col("cid"))).as("best"))
            .select(col("vec_id"), col("best.cid").as("cell"))
          val predS = asgS.groupBy(col("cell")).count()
            .agg(sum(col("count") * (col("count") - 1)).cast("long"))
            .collect()(0).getLong(0)
          val t0 = System.nanoTime()
          val edges = graft.ops.Vectors.knnEdgesScaled(spark, dir, 125L).count()
          val secsS = (System.nanoTime() - t0) / 1e9
          println(f"""{"shape":"knn_scaled","factor":$factor,"rows":$n,"cells":${cent.count()},"cand_pairs":$predS,"per_row":${predS / n},"edges":$edges,"secs":$secsS%.2f}""")
          spark.catalog.clearCache()
        }
        ec.unpersist()
      }
    }

    if (on("phash")) {
      // phash multi-index octave: candidates = Σ_bucket C(|bucket|,2)
      // over all FOUR 16-bit block indexes (exactly the pigeonhole
      // joins the key runs — production width since round 14). 65,536
      // buckets per block ⇒ bucket size ≈ n/65536 and the candidate
      // space is n²/16384-shaped — the former 16-bit/8-bit-block toy
      // was n²/256 and saturated at ~1e5 rows; the 64-bit widening
      // buys 128× fewer candidates at equal n. The probe asserts the
      // histogram prediction and executes the full oracled key while
      // the candidate count stays executable.
      val docsBase = Tables.documents(spark, sfDir).select("doc_id", "text")
      for (factor <- Seq(1, 8, 64).filter(_ <= maxFactor)) {
        val dir = s"$tmpRoot/ph_$factor"
        scaledDocs(docsBase, factor).repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val blocks = graft.ops.Vectors.phashBlocks(spark, dir)
        val n = blocks.count() // corpus + re-encode plants
        def half(key: String): Long = blocks.groupBy(col(key)).count()
          .agg(sum(col("count") * (col("count") - 1)).cast("long"))
          .collect()(0).getLong(0) / 2
        val predicted = (0 to 3).map(k => half(s"b$k")).sum
        val (outRows, secs) =
          if (predicted <= 300000000L) {
            val t0 = System.nanoTime()
            val o = SparkEntry.queries("multimodal_phash")(spark, dir).count()
            (o, (System.nanoTime() - t0) / 1e9)
          } else (-1L, -1.0)
        println(f"""{"shape":"phash_cand","factor":$factor,"rows":$n,"cand_pairs":$predicted,"per_row":${predicted / n},"out_rows":$outRows,"secs":$secs%.2f}""")
        spark.catalog.clearCache()
      }
    }

    if (on("media")) {
      // media dedup: the claim is that payload BYTES never shuffle —
      // only the 32-char fingerprint + ids + lengths do. Two dials:
      // rows (1×/8×/64×) and payload size (32 B vs 2 KiB at the same
      // rows). A SparkListener sums shuffle-write bytes during the
      // operator's own mediaDedup stage (staging/cache excluded):
      // shuffle per row must stay ~constant while payload bytes grow
      // 64×, and scale linearly in rows.
      val shuffled = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffled.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(listener)
      // try/finally: a throw mid-loop must not leak the listener into
      // later octaves' shuffle measurements (review finding)
      try {
        val docsBase = Tables.documents(spark, sfDir).select("doc_id", "text")
        for (factor <- Seq(1, 8, 64).filter(_ <= maxFactor); inflate <- Seq(1, 64)) {
          val media = scaledDocs(docsBase, factor)
            .select(col("doc_id"),
              unhex(expr(s"repeat(md5(text), $inflate)")).as("payload"))
            .repartition(cpus.toInt).cache()
          val n = media.count() // materialize BEFORE the counter resets
          val payloadBytes = 16L * inflate * n
          org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
          shuffled.set(0L)
          val t0 = System.nanoTime()
          val outRows = graft.ops.Vectors.mediaDedup(media).count()
          val secs = (System.nanoTime() - t0) / 1e9
          org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
          val sb = shuffled.get()
          println(f"""{"shape":"media_shuffle","factor":$factor,"inflate":$inflate,"rows":$n,"payload_bytes":$payloadBytes,"shuffle_bytes":$sb,"shuffle_per_row":${sb / n},"out_rows":$outRows,"secs":$secs%.2f}""")
          media.unpersist()
        }
      } finally spark.sparkContext.removeSparkListener(listener)
    }

    if (on("triangles")) {
      // Triangle-counting octave: the claim under test is the one
      // graph_triangles documents — degree orientation bounds wedge
      // candidates (Σ C(out-deg, 2)) by arboricity while id
      // orientation explodes at hubs. Adversarial graph: one hub with
      // n/2 spokes (a knn graph's unbounded in-degree, worst case)
      // plus a squared path of n/2 nodes carrying the actual
      // triangles. Under id orientation the hub (id 0, the LOW id)
      // sources every spoke edge → C(n/2, 2) wedges, quadratic; under
      // degree orientation every spoke (degree 1) points AT the hub →
      // hub out-degree 0, wedges stay ≤ n. Both wedge counts come from
      // the operator's own orientEdges; the executed pipeline is
      // triangleCountsOver — the oracled key's code path — with the
      // exact strip triangle count asserted, and the two orientations
      // cross-checked per node at the base octave.
      for (factor <- Seq(1, 8, 64).filter(_ <= maxFactor)) {
        val n = 4096L * factor
        val h = n / 2
        val spokes = spark.range(1, h + 1)
          .select(lit(0L).as("a_id"), col("id").as("b_id"))
        val strip = spark.range(h + 1, n - 1)
          .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
          .unionByName(spark.range(h + 1, n - 2)
            .select(col("id").as("a_id"), (col("id") + 2).as("b_id")))
        val pairs = spokes.unionByName(strip).repartition(cpus.toInt).cache()
        pairs.count()
        val und = pairs.select(least(col("a_id"), col("b_id")).as("u"),
          greatest(col("a_id"), col("b_id")).as("v")).distinct()
        def wedges(byDeg: Boolean): Long =
          graft.ops.Vectors.orientEdges(und, byDeg)
            .groupBy(col("src")).count()
            .agg((sum(col("count") * (col("count") - 1)) / 2).cast("long"))
            .collect()(0).getLong(0)
        val wDeg = wedges(true)
        val wId = wedges(false)
        assert(wDeg <= n, s"degree-oriented wedges $wDeg not linear at n=$n")
        assert(wId >= h * (h - 1) / 2, s"hub wedges missing from id orientation")
        val t0 = System.nanoTime()
        val out = graft.ops.Vectors.triangleCountsOver(pairs, byDegree = true)
          .agg(sum(col("n_triangles")).cast("long"), count(lit(1))).collect()(0)
        val secs = (System.nanoTime() - t0) / 1e9
        val expected = 3L * (n - 1 - h - 2) // strip triangles × 3 members
        assert(out.getLong(0) == expected, s"triangles ${out.getLong(0)} != $expected")
        if (factor == 1) {
          val a = graft.ops.Vectors.triangleCountsOver(pairs, byDegree = true)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val b = graft.ops.Vectors.triangleCountsOver(pairs, byDegree = false)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(a == b, "orientations disagree on per-node counts")
        }
        println(f"""{"shape":"triangles_hub","factor":$factor,"nodes":$n,"wedges_degree":$wDeg,"wedges_id":$wId,"tri_rows":${out.getLong(1)},"secs":$secs%.2f}""")
        pairs.unpersist()
        spark.catalog.clearCache()
      }
    }

    if (on("rcte")) {
      // WITH RECURSIVE iteration-depth octave: Spark's UnionLoop plans
      // ONE frontier⋈edges join per iteration, so cost tracks the
      // frontier PATH count — 3 seeds × out-degree-3 fan-out, bounded
      // by the hop cap (the cycle guard) and by saturation when the
      // reachable set closes. The probe drives the OPERATOR's edge
      // view (registered by the oracled key) at growing caps and
      // reports path rows, distinct nodes, and wall seconds — the
      // "how deep can the engine loop" table a Datalog-style consumer
      // reads before picking a cap. Caps stop at 10: Spark 4.1 rejects
      // UNION (distinct) inside a recursive CTE
      // (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE — probed), so path
      // enumeration is exactly 3·3^h rows and a deeper traversal on a
      // cyclic graph belongs to the unrolled per-round-dedup pattern
      // (graph_pagerank's shape), not the engine loop.
      SparkEntry.queries("graph_reach_recursive")(spark, sfDir).count()
      for (cap <- Seq(2, 4, 8, 10)) {
        def rec(select: String) = spark.sql(
          s"""WITH RECURSIVE reach(node, hops) AS (
             |  SELECT * FROM VALUES (CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
             |                       (CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
             |                       (CAST(2 AS BIGINT), CAST(0 AS BIGINT)) AS v(node, hops)
             |  UNION ALL
             |  SELECT e.b_id, r.hops + 1
             |  FROM reach r JOIN graft_rcte_edges e ON e.a_id = r.node
             |  WHERE r.hops < $cap)
             |$select""".stripMargin)
        val t0 = System.nanoTime()
        val nodes = rec("SELECT node, min(hops) AS hops FROM reach GROUP BY node").count()
        val secs = (System.nanoTime() - t0) / 1e9
        val paths = rec("SELECT * FROM reach").count()
        println(f"""{"shape":"rcte","hop_cap":$cap,"path_rows":$paths,"nodes_reached":$nodes,"secs":$secs%.2f}""")
      }
    }

    if (on("pagerank")) {
      // PageRank octave: per-iteration cost is one edge-sized shuffle,
      // and the micro-unit floor arithmetic admits CLOSED FORMS on
      // regular graphs — asserted exactly at every octave. Ring leg
      // (out-degree 3, in-degree 3): every rank is 999999 from round 1
      // on (1e6 div 3 = 333333 three times → m = 999999 →
      // 150000 + 849999). Star leg (max in-degree skew — the dst-keyed
      // aggregate's partial combine is what absorbs the hot key):
      // spokes hold 150000 from round 1, the hub ends at
      // 150000 + (850000 · (n−1) · 150000) div 1e6.
      for (factor <- Seq(1, 8, 64).filter(_ <= maxFactor)) {
        val n = 20000L * factor
        val ring = spark.range(n)
          .select(col("id").as("src"), explode(array(lit(1L), lit(2L), lit(3L))).as("o"))
          .select(col("src"), ((col("src") + col("o")) % n).as("dst"))
          .repartition(cpus.toInt).cache()
        ring.count()
        val t0 = System.nanoTime()
        val rr = graft.ops.Vectors.pageRankMicro(ring, 3)
          .groupBy(col("rank_micro")).agg(count(lit(1))).collect()
        val ringSecs = (System.nanoTime() - t0) / 1e9
        assert(rr.length == 1 && rr(0).getLong(0) == 999999L && rr(0).getLong(1) == n,
          s"ring ranks ${rr.mkString(",")}")
        ring.unpersist()
        val star = spark.range(1, n)
          .select(col("id").as("src"), lit(0L).as("dst"))
          .repartition(cpus.toInt).cache()
        star.count()
        val t1 = System.nanoTime()
        val sr = graft.ops.Vectors.pageRankMicro(star, 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val starSecs = (System.nanoTime() - t1) / 1e9
        val hubExpected = 150000L + (850000L * (n - 1) * 150000L) / 1000000L
        assert(sr(0L) == hubExpected, s"hub ${sr(0L)} != $hubExpected")
        assert(sr.forall { case (k, v) => k == 0L || v == 150000L }, "spoke ranks")
        star.unpersist()
        println(f"""{"shape":"pagerank_octave","factor":$factor,"nodes":$n,"ring_edges":${3 * n},"ring_secs":$ringSecs%.2f,"star_secs":$starSecs%.2f,"hub_rank":$hubExpected}""")
        spark.catalog.clearCache()
      }
    }

    if (on("buckets")) {
      // Tercile-threshold invariance under population octaves: exact
      // corpus replication multiplies every histogram cell by k, so
      // the ⌈N/3⌉-rank thresholds — and with them every bucket
      // boundary — must be IDENTICAL at every factor while bucket
      // populations scale exactly ×k (ceil(ceil(kN/3)/k) = ceil(N/3)).
      // That is the quantize-then-rank scale claim: thresholds are
      // rank statistics of a BOUNDED histogram, not of the corpus.
      // Asserted on the operators' real code paths (factored builders).
      val docsBase = Tables.documents(spark, sfDir).select("doc_id", "text")
      // quality_buckets: scaledDocs only permutes token order and the
      // score is bag-of-words, so every replica scores as its base doc
      def qrows(factor: Int) =
        Pipeline.qualityBuckets(scaledDocs(docsBase, factor).repartition(cpus.toInt))
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val q1 = qrows(1)
      for (factor <- Seq(8, 64)) {
        val t0 = System.nanoTime()
        val qk = qrows(factor)
        val secs = (System.nanoTime() - t0) / 1e9
        require(qk.keySet == q1.keySet, s"bucket set changed at $factor×")
        q1.foreach { case (b, (n1, mn, mx, avg)) =>
          val (nk, mnk, mxk, avgk) = qk(b)
          require(nk == n1 * factor, s"$b: population not ×$factor")
          require(mnk == mn && mxk == mx && avgk == avg, s"$b: band drifted at $factor×")
        }
        println(f"""{"shape":"quality_buckets","factor":$factor,"docs":${q1.values.map(_._1).sum * factor},"bands_identical":true,"secs":$secs%.2f}""")
      }
      // rfm_segments: replicate USERS (fresh ids, identical history) —
      // per-user metrics are replica-invariant, so the segment grid
      // must scale ×k in population with identical average spend
      val evBase = Tables.events(spark, sfDir)
        .select("user_id", "event_id", "ts", "event_type", "value")
      def scaledUsers(factor: Int) =
        evBase.select(col("ts"), col("event_type"), col("value"),
            explode(sequence(lit(0), lit(factor - 1))).as("r"),
            col("user_id"), col("event_id"))
          .select((col("user_id") * factor + col("r")).as("user_id"),
            (col("event_id") * factor + col("r")).as("event_id"),
            col("ts"), col("event_type"), col("value"))
      def rrows(factor: Int) =
        graft.ops.Relational.rfmSegments(scaledUsers(factor).repartition(cpus.toInt))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
            ((r.getLong(3), r.getLong(4)))).toMap
      val r1 = rrows(1)
      for (factor <- Seq(8, 64)) {
        val t0 = System.nanoTime()
        val rk = rrows(factor)
        val secs = (System.nanoTime() - t0) / 1e9
        require(rk.keySet == r1.keySet, s"segment grid changed at $factor×")
        r1.foreach { case (k, (n1, avg)) =>
          val (nk, avgk) = rk(k)
          require(nk == n1 * factor, s"$k: users not ×$factor")
          require(avgk == avg, s"$k: average spend drifted at $factor×")
        }
        println(f"""{"shape":"rfm_segments","factor":$factor,"users":${r1.values.map(_._1).sum * factor},"grid_identical":true,"secs":$secs%.2f}""")
      }
    }

    if (on("state")) {
      val base = Tables.events(spark, sfDir).select("user_id", "event_id", "ts")
      for (factor <- Seq(1, maxFactor)) {
        val staged = s"$tmpRoot/state_events_$factor"
        val e = scaled(base, factor)
        stageTimeOrdered(e, staged)
        val rows = spark.read.parquet(staged).count()
        for (delay <- Seq("1 hour", "30 days", "3650 days")) {
          val (stateRows, secs, _, _) = stateProbe(spark, staged, delay)
          println(f"""{"shape":"stream_state","factor":$factor,"rows":$rows,"delay":"$delay","state_rows_max":$stateRows,"secs":$secs%.2f}""")
        }
      }
    }

    if (on("state-rocks")) {
      // HDFS-backed (heap) vs RocksDB state store at the max-state
      // delay (nothing evicts inside the fixture window, so state =
      // full distinct key set — the regime where SCALE.md says "flip
      // spark.sql.streaming.stateStore.providerClass when state
      // outgrows the heap" but never measured it). Same staged stream,
      // same query, only the provider differs; reported: max state
      // rows, end-to-end secs, worst per-batch state commit, state
      // memory held. RocksDB keeps state off-heap/on-disk — the
      // trade is commit latency for heap immunity.
      val base = Tables.events(spark, sfDir).select("user_id", "event_id", "ts")
      for (factor <- Seq(1, maxFactor).distinct) {
        val staged = s"$tmpRoot/staterocks_events_$factor"
        stageTimeOrdered(scaled(base, factor), staged)
        val rows = spark.read.parquet(staged).count()
        for ((label, prov) <- Seq(
            "hdfs" -> None,
            "rocksdb" -> Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))) {
          val (stateRows, secs, commitMs, memBytes) =
            stateProbe(spark, staged, "3650 days", prov)
          println(f"""{"shape":"state_provider","factor":$factor,"rows":$rows,"provider":"$label","state_rows_max":$stateRows,"secs":$secs%.2f,"max_commit_ms":$commitMs,"state_mem_bytes":$memBytes}""")
        }
      }
    }

    if (on("indexed")) {
      val docsBase = Tables.documents(spark, sfDir).select("doc_id", "text")
      for (factor <- Seq(1, docsFactor)) {
        val dc = scaledDocs(docsBase, factor).repartition(cpus.toInt).cache()
        val nDocs = dc.count()
        val dir = s"$tmpRoot/bandidx_$factor"
        // the production shape: the arriving batch is 1/16 of the
        // corpus; recompute pays the other 15/16's minhash every run,
        // the indexed variant only scans it
        buildBandIndex(dc, dir, 16, 0) // untimed — the once-per-corpus cost
        val t0 = System.nanoTime()
        val dups = dedupIncrementalIndexed(dc, dir, 16, 0)
        println(f"""{"shape":"dedup_incremental_indexed","factor":$factor,"rows":$nDocs,"out_rows":$dups,"secs":${(System.nanoTime() - t0) / 1e9}%.2f}""")
        val t1 = System.nanoTime()
        val dups2 = dedupIncremental(dc, 16, 0)
        println(f"""{"shape":"dedup_incremental_recompute","factor":$factor,"rows":$nDocs,"out_rows":$dups2,"secs":${(System.nanoTime() - t1) / 1e9}%.2f}""")
        dc.unpersist()
      }
    }

    if (on("cc")) {
      // connected-components octave: does the min-label propagation
      // loop stay O(diameter) as the corpus grows? Edge count should
      // scale linearly (planted triples per doc; LSH buckets bound the
      // rest), iterations should stay flat (cluster diameter does not
      // grow with corpus size), wall-clock ~linear in edges.
      // Numeric args select the factors (default 1 16 64) so long legs
      // can run as separate invocations.
      val ccBase = Tables.documents(spark, sfDir).select("doc_id", "text")
      val ccFactors = if (nums.nonEmpty) nums.map(_.toInt).toSeq else Seq(1, 16, 64)
      for (factor <- ccFactors) {
        val corpus = ccCorpus(ccBase, factor)
        val rows = corpus.count()
        val t0 = System.nanoTime()
        val (labels, edges, iters) = graft.ops.Pipeline.componentLabels(corpus)
        val nComps = labels.select(col("lbl")).distinct().count() // drives the loop
        val secs = (System.nanoTime() - t0) / 1e9
        val nEdges = edges.count() // checkpointed — cheap re-scan, not re-derivation
        println(f"""{"shape":"dedup_components","factor":$factor,"rows":$rows,"edges":$nEdges,"iterations":$iters,"components":$nComps,"secs":$secs%.2f}""")
      }
    }

    if (on("ccdelta")) {
      // incremental-clustering octave: a FIXED appended batch against
      // a GROWING old corpus. The claim under test is the 100 TB cost
      // shape — the delta path's work is O(batch + edges) regardless
      // of old-corpus size (old×old never re-examined; old artifacts
      // come from the stored index), while the from-scratch rebuild
      // re-shingles everything, so full/delta wall-clock should
      // DIVERGE as the old side grows. Index build is untimed — the
      // once-per-corpus cost continuous ingest amortizes (and in
      // production maintains incrementally).
      val ccBase = Tables.documents(spark, sfDir).select("doc_id", "text")
      val ccdFactors = if (nums.nonEmpty) nums.map(_.toInt).toSeq else Seq(1, 8, 32)
      // batch: the REPLICA-0 texts re-arriving under fresh ids (+3e9).
      // scaledDocs permutes each replica's token order (md5-keyed, so
      // replica texts are distinct across replicas), and replica 0's
      // permutation is factor-independent — so these batch texts are
      // byte-identical to the old corpus's replica-0 docs at every
      // factor, and the batch's own truncation variants are
      // shingle-near them. Cross old×new exact AND near edges all
      // exercise. (A batch built from the ORIGINAL token order would
      // collide with nothing: 3-shingles are order-dependent, so a
      // permuted twin shares no shingles — a silently easy workload.)
      val newCorpus = Pipeline.componentCorpus(
        scaledDocs(ccBase, 1)
          .select((col("doc_id") + 3000000000L).as("doc_id"), col("text")))
        .cache()
      val batchRows = newCorpus.count()
      for (factor <- ccdFactors) {
        val oldCorpus = ccCorpus(ccBase, factor)
        val oldRows = oldCorpus.count()
        val idx = graft.ops.Text.stagedHsIndex(spark, sfDir,
          s"ccdelta_probe_$factor", Pipeline.ccIndexExtras)(oldCorpus)
        // label-level signature, not just component COUNT: the round-9
        // workload postmortem showed a count-only require passes
        // vacuously under bugs that preserve cluster count (swapped
        // members, wrong roots) — same order-free hash trick the
        // contraction loop uses for its convergence signature
        def labelSig(l: DataFrame): (Long, Long) = {
          val r = l.agg(count(lit(1)),
            expr("bit_xor(xxhash64(id, lbl))")).collect()(0)
          (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
        }
        val t0 = System.nanoTime()
        val (dl, dEdges, dIters) = Pipeline.deltaFromIndex(spark, idx, newCorpus)
        val dComps = dl.select(col("lbl")).distinct().count()
        val dSecs = (System.nanoTime() - t0) / 1e9
        val dSig = labelSig(dl)
        val t1 = System.nanoTime()
        val (fl, _, fIters) = Pipeline.componentLabels(oldCorpus.unionByName(newCorpus))
        val fComps = fl.select(col("lbl")).distinct().count()
        val fSecs = (System.nanoTime() - t1) / 1e9
        require(dSig == labelSig(fl),
          s"delta labeling diverges from full rebuild (sig $dSig, comps $dComps vs $fComps)")
        val nEdges = dEdges.count()
        println(f"""{"shape":"dedup_components_delta","factor":$factor,"old_rows":$oldRows,"batch_rows":$batchRows,"edges":$nEdges,"delta_iters":$dIters,"full_iters":$fIters,"components":$dComps,"delta_secs":$dSecs%.2f,"full_secs":$fSecs%.2f}""")
      }
      newCorpus.unpersist()
    }

    if (on("ccchain")) {
      // diameter probe: iterations must track the duplicate-cluster
      // DIAMETER (path-shaped chains), not the corpus size
      for (depth <- Seq(3, 12)) {
        val corpus = ccChainCorpus(spark, 100, depth).repartition(cpus.toInt)
        val rows = corpus.count()
        val t0 = System.nanoTime()
        val (labels, edges, iters) = graft.ops.Pipeline.componentLabels(corpus)
        val nComps = labels.select(col("lbl")).distinct().count()
        val secs = (System.nanoTime() - t0) / 1e9
        val nEdges = edges.count()
        println(f"""{"shape":"dedup_components_chain","depth":$depth,"rows":$rows,"edges":$nEdges,"iterations":$iters,"components":$nComps,"secs":$secs%.2f}""")
      }
    }

    val docsBase = Tables.documents(spark, sfDir).select("doc_id", "text")
    if (on("dedup")) for (factor <- Seq(1, docsFactor)) {
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
    if (on("events")) for (factor <- Seq(1, maxFactor)) {
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
