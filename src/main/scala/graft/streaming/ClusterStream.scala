package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger
import graft.ops.{Pipeline, Text}

/** Continuous duplicate-CLUSTER maintenance: the streaming twin of
  * `dedup_components_delta`. Each micro-batch of arriving documents
  * updates a persisted clustering index — MinHash halves (`hs`,
  * `bands`), the accumulated half-edge list (`edges`), and the
  * md5 → first-seen-rep map (`digests`) — doing only O(batch + new
  * edges) work: the batch is shingled once, its bands probe the
  * (old ∪ new) band table so every candidate pair involves a new doc
  * (old×old pairs were found when THEY were the batch), and one digest
  * join connects same-text groups that span batches. Component labels
  * are then extracted on demand by star contraction over the
  * accumulated edge list — an edge-sized computation, ≪ corpus.
  *
  * The invariant that makes this correct for ANY batch split (and any
  * file-arrival order): after N batches, `edges` holds a set whose
  * connectivity equals the from-scratch build's — near-candidate pairs
  * partition by "which doc arrived last", each found exactly in that
  * doc's batch and Jaccard-verified identically, and every same-text
  * group is a star through its first-seen rep plus one cross link per
  * later batch. Star contraction's fixed point (component-min labels)
  * depends only on connectivity, so `labels` is byte-equal to
  * `dedup_components` — spec-asserted and oracle-checked
  * (`stream_components`).
  *
  * At 100 TB this is the production clustering topology: the corpus is
  * never re-shingled (each doc is MinHashed exactly once, in its own
  * ingest window), the stored band table is only SCANNED per batch by
  * a hash join whose probe side is batch-sized, and label extraction
  * touches edges + a doc_id-only corpus projection. Index appends are
  * EXACTLY-ONCE via [[BatchLog]] (r12, closing the r10/r11
  * at-least-once caveat): each batch's rows land in their own
  * committed subdirectory, reads prune uncommitted partials, and a
  * crash-retry overwrites its own partial files — byte-identical to a
  * crash-free run (spec-pinned). Consumers additionally tolerate the
  * one remaining replay path (a deliberate re-ingest through a FRESH
  * checkpoint): edges/bands feed distinct-ing set-union consumers,
  * digests append behind a left_anti guard, and [[labels]] distincts
  * the hs doc_ids.
  */
object ClusterStream {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  // Index halves are read with EXPLICIT schemas: the empty-seed
  // bootstrap writes zero part files (AQE coalesces an empty frame to
  // zero partitions), so schema inference on a fresh index would fail.
  private val hsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("hs", ArrayType(LongType))))
  private val bandSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("bkey", StringType),
    StructField("b", IntegerType)))
  private val edgeSchema = StructType(Seq(
    StructField("x", LongType), StructField("y", LongType)))
  private val digestSchema = StructType(Seq(
    StructField("k", StringType), StructField("rep", LongType)))

  /** Initialize the index from a seed corpus — hs/bands plus the
    * seed's own internal near edges, exact-dup stars and digest map
    * (the [[Pipeline.ccIndexExtras]] recipe, so a seeded stream and
    * `componentLabelsDelta`'s stored old side are the same artifact).
    * An empty seed (`corpus.limit(0)`) yields empty-but-typed halves:
    * the whole-corpus-replayed-through-the-stream bootstrap.
    */
  def seedIndex(spark: SparkSession, seed: DataFrame, idxDir: String): Unit = {
    val docs = seed.select(col("doc_id"), col("text"))
    // EMPTY seed (the whole-corpus-replayed bootstrap, the shape every
    // bench/oracle run takes): commit the marker and write nothing —
    // BatchLog.read returns empty-but-typed for a half with no live
    // directories, and committedDirs tolerates committed keys without
    // directories by construction, so four empty-frame write jobs plus
    // two read-backs were pure overhead on every fresh index (r22,
    // guide §1.2 "don't compute things you throw away").
    if (docs.isEmpty) { BatchLog.commit(spark, idxDir, "seed"); return }
    BatchLog.write(Text.shingleHashes(docs), s"$idxDir/hs", "seed")
    val written = spark.read.schema(hsSchema).parquet(s"$idxDir/hs/batch=seed")
    BatchLog.write(Text.minhashBands(written), s"$idxDir/bands", "seed")
    val writtenBands = spark.read.schema(bandSchema)
      .parquet(s"$idxDir/bands/batch=seed")
      .select(col("doc_id"), col("b"), col("bkey"))
    BatchLog.write(
      Pipeline.verifiedNearEdges(written, writtenBands)
        .unionByName(Pipeline.ccIndexExtras("exact")(docs, written, writtenBands)),
      s"$idxDir/edges", "seed")
    BatchLog.write(Pipeline.ccIndexExtras("digests")(docs, written, writtenBands),
      s"$idxDir/digests", "seed")
    BatchLog.commit(spark, idxDir, "seed")
  }

  /** One micro-batch's index update; factored out (package-private) so
    * the batch path — including crash-retry — can be spec-driven
    * without a stream. Returns the batch row count (all other state
    * lives in the index directory).
    *
    * Exactly-once: an already-committed `key` is skipped outright; an
    * uncommitted retry recomputes against the committed (pre-batch)
    * index only — [[BatchLog.read]] prunes the failed attempt's partial
    * subdirectories — and its overwrites replace them byte-identically.
    * The marker lands only after every half is written.
    */
  private[graft] def ingestBatch(spark: SparkSession, batch: DataFrame,
      idxDir: String, key: String): Long = {
    if (BatchLog.isCommitted(spark, idxDir, key)) return 0L
    val newDocs = prepared(batch)
    ingestPrepared(spark, newDocs, newDocs.count(), idxDir, key)
  }

  /** The arriving window, spread across the cluster and lazily
    * checkpointed — a staged window is ONE parquet part file = one
    * scan partition, which serialized the whole batch's md5/shingling
    * on a single core (r22 profile: two ~2 s single-task jobs per
    * micro-batch at sf0.1). Hash repartition on doc_id is
    * deterministic under retry; the first action over the frame
    * (the fused key+count aggregate, or the spec path's count)
    * materializes the checkpoint blocks in the same pass.
    */
  private def prepared(batch: DataFrame): DataFrame = {
    val par = batch.sparkSession.sparkContext.defaultParallelism
    batch.select(col("doc_id"), col("text"))
      .repartition(par, col("doc_id"))
      .localCheckpoint(false)
  }

  /** [[ingestBatch]] past the key/count/skip preamble: `newDocs` is
    * the [[prepared]] (checkpointed) window and `n` its row count —
    * the streaming path computes both in ONE aggregate
    * ([[BatchLog.contentKeyAndCount]]); the spec-facing
    * [[ingestBatch]] wrapper derives them classically.
    */
  private def ingestPrepared(spark: SparkSession, newDocs: DataFrame,
      n: Long, idxDir: String, key: String): Long = {
    if (n == 0) { BatchLog.commit(spark, idxDir, key); return 0L }
    // lazy: the first consumer (the newEdges write below) materializes
    // the shingle blocks; every later consumer reads them
    val newHs = Text.shingleHashes(newDocs).localCheckpoint(false)
    val newBands = Text.minhashBands(newHs)
    val oldHs = BatchLog.read(spark, idxDir, "hs", hsSchema)
    val oldBands = BatchLog.read(spark, idxDir, "bands", bandSchema)
      .select(col("doc_id"), col("b"), col("bkey"))
    // near edges involving ≥1 batch doc: batch bands probe ALL bands
    val newNear = Pipeline.verifiedNearEdges(oldHs.unionByName(newHs),
      oldBands.unionByName(newBands), probe = Some(newBands),
      probeHs = Some(newHs))
    // exact-text connectivity: in-batch stars to the batch rep + one
    // link from the batch rep to the stored first-seen rep; digests
    // new to this batch enter the stored map
    val keyed = newDocs.select(col("doc_id"), md5(col("text")).as("k"))
    val reps = keyed.groupBy(col("k")).agg(min(col("doc_id")).as("rep"))
      .localCheckpoint(false) // materialized by the newEdges write
    val stored = BatchLog.read(spark, idxDir, "digests", digestSchema)
    val stars = keyed.join(reps, Seq("k"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("doc_id").as("x"), col("rep").as("y"))
    val cross = reps
      .join(stored.withColumnRenamed("rep", "orep"), Seq("k"))
      .select(col("rep").as("x"), col("orep").as("y"))
    // edges must be computed BEFORE the index mutates: the write below
    // is itself the first mutation AND the action that materializes
    // this lazy checkpoint — ordering preserved with one fewer pass
    // over the verify chain than the old eager checkpoint paid
    val newEdges = newNear.unionByName(stars).unionByName(cross)
      .localCheckpoint(false)
    BatchLog.write(newEdges, s"$idxDir/edges", key)
    // the remaining three halves are INDEPENDENT writes over state the
    // edges write just materialized (newDocs/newHs/reps checkpoint
    // blocks are warm), so they run as overlapped jobs (guide §2.6 —
    // actions are only sequential because the driver calls them
    // sequentially): each write's tail tasks back-fill the others'.
    // Correctness is unchanged: visibility is the commit marker below,
    // not write order — BatchLog.read prunes this batch's uncommitted
    // dirs however the three land or crash, and a retry overwrites its
    // own partials (the existing exactly-once contract).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val halves = Seq(
      Future(BatchLog.write(reps.join(stored, Seq("k"), "left_anti"),
        s"$idxDir/digests", key)),
      Future(BatchLog.write(newHs, s"$idxDir/hs", key)),
      Future(BatchLog.write(newBands, s"$idxDir/bands", key)))
    halves.foreach(Await.result(_, scala.concurrent.duration.Duration.Inf))
    BatchLog.commit(spark, idxDir, key)
    n
  }

  /** Drain every file currently under `inDir` (AvailableNow, one file
    * per micro-batch) through the index at `idxDir`. Returns the number
    * of documents processed by this run; re-running with the same
    * checkpoint processes only newly arrived files.
    */
  def runIngest(parent: SparkSession, inDir: String, idxDir: String,
      checkpoint: String): Long = {
    val spark = parent.newSession()
    // inherit the parent's shuffle width: unlike DedupStream's always-
    // small batches, a clustering window can be corpus-scale (the
    // bench replays 150k-doc windows) and 8 partitions underuses the
    // 32-thread box
    spark.conf.set("spark.sql.shuffle.partitions",
      parent.conf.get("spark.sql.shuffle.partitions"))
    // runtime confs don't cross newSession(): carry the reprocess flag
    spark.conf.set("spark.graft.ingest.reprocess",
      parent.conf.get("spark.graft.ingest.reprocess", "false"))
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // ONE aggregate over the prepared (spread + checkpointed)
        // window computes the content key AND the count, materializing
        // the checkpoint blocks in the same pass — the old path paid a
        // single-task key job over the raw one-partition window plus a
        // separate count job (r22; key value unchanged — the md5 is
        // over the same sorted (doc_id, md5(text)) set regardless of
        // partitioning, so the exactly-once skip contract holds).
        val docsB = prepared(batch)
        if (spark.conf.get("spark.graft.ingest.reprocess", "false").toBoolean) {
          val key = BatchLog.key(checkpoint, batchId)
          if (!BatchLog.isCommitted(spark, idxDir, key))
            seen.addAndGet(ingestPrepared(spark, docsB, docsB.count(), idxDir, key))
        } else {
          val (key, n) = BatchLog.contentKeyAndCount(docsB)
          if (!BatchLog.isCommitted(spark, idxDir, key))
            seen.addAndGet(ingestPrepared(spark, docsB, n, idxDir, key))
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    seen.get()
  }

  /** Stage a (doc_id, text) frame as ONE flat parquet file at `dest` —
    * the file-source arrival unit (the source lists top-level files;
    * each staged file becomes one micro-batch under
    * maxFilesPerTrigger=1).
    */
  def stageFile(df: DataFrame, stageDir: String, dest: String): Unit = {
    val s = df.sparkSession
    df.coalesce(1).write.mode("overwrite").parquet(stageDir)
    val part = graft.ops.hfsList(s, stageDir).map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet")).get
    // write-once: an arrival file is a micro-batch unit — double-
    // staging the same window must fail loudly, not silently replace
    // a possibly-already-ingested file (r18 advice)
    graft.ops.hfsCopyFile(s, part.toString, dest, overwrite = false)
  }

  /** Stage `df` as `n` arrival windows in ONE parallel job: hash-
    * repartition on doc_id writes one part file per window; each part
    * file is copied into `inDir` as its own micro-batch. A serial
    * per-window coalesce(1) rewrite of the corpus would bottleneck on
    * a single task per window.
    */
  def stageWindows(df: DataFrame, n: Int, stageDir: String, inDir: String): Unit = {
    val s = df.sparkSession
    df.repartition(n, col("doc_id")).write.mode("overwrite").parquet(stageDir)
    graft.ops.hfsList(s, stageDir).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .sortBy(_.getName).zipWithIndex.foreach { case (p, i) =>
        // write-once, like stageFile: arrival units must not be
        // silently replaced (r18 advice)
        graft.ops.hfsCopyFile(s, p.toString, s"$inDir/window$i.parquet",
          overwrite = false)
      }
  }

  /** Component labels of everything ingested so far: star contraction
    * over the ACCUMULATED edge list, joined to a doc_id-only corpus
    * projection (from the index's own hs — the stream never stores
    * texts). Edge-sized work; same (id, lbl) contract as
    * [[Pipeline.componentLabels]].
    */
  /** Compact the accumulated edge list to its contracted member→root
    * star set, and return the (labels, stored-edge-row-count) pair.
    *
    * This closes the engine's one unbounded-state hole (VERDICT r9/r10
    * task #1): without compaction `edges` grows with ALL-TIME ingest —
    * every batch appends its near/star/cross edges forever, so
    * [[labels]] contraction cost scales with ingest HISTORY, not live
    * corpus size. The star set has exactly the edge list's
    * connectivity (each component collapses to member→component-min,
    * the contraction fixed point itself), so labels before and after
    * are identical for any future ingest sequence — a new edge into
    * any member still reaches the whole component through the root.
    * Row bound after compaction: one row per doc that has a duplicate,
    * ≤ corpus — O(live members), independent of batch count.
    *
    * Runs at a labels() fixed point the stream already pays for, so a
    * deployment compacts for free whenever it extracts labels. The
    * rewrite rides [[BatchLog]]'s supersession protocol (r12): the
    * star set is written as its own generation directory, then ONE
    * marker atomically commits it AND marks every prior edge batch
    * superseded. A crash before the marker leaves the old generation
    * fully live (the partial generation dir is uncommitted,
    * invisible); a crash after the marker loses nothing and
    * double-counts nothing — the superseded directories are already
    * excluded from reads, and the remaining deletes are idempotent
    * cleanup. Replay tolerance is preserved: a re-appended old batch
    * only adds edges between same-component members.
    */
  def compactIndex(spark: SparkSession, idxDir: String): (DataFrame, Long) = {
    val (lab, _, _) = labels(spark, idxDir)
    // member→root stars; roots in the lab plan are contraction output
    // already materialized via localCheckpoint, so writing the next
    // generation does not re-read the live edge directories
    val stars = lab.filter(col("id") =!= col("lbl"))
      .select(col("id").as("x"), col("lbl").as("y"))
    val gen = BatchLog.nextGenKey(spark, idxDir)
    val old = BatchLog.liveKeys(spark, idxDir, "edges")
      .filter(BatchLog.batchDirExists(spark, idxDir, "edges", _))
    BatchLog.write(stars, s"$idxDir/edges", gen)
    BatchLog.commitSuperseding(spark, idxDir, gen, Map("edges" -> old))
    old.foreach(BatchLog.deleteBatchDir(spark, idxDir, "edges", _))
    // superseded prior generations: repair their cleanup, drop markers
    old.foreach(BatchLog.pruneGenMarker(spark, idxDir, _))
    val rows = BatchLog.read(spark, idxDir, "edges", edgeSchema).count()
    (lab, rows)
  }

  /** Consolidate the append-only halves (hs/bands/digests) into one
    * generation directory each — the many-small-files defense for a
    * long-running ingest; see [[BatchLog.consolidate]]. Run at the
    * same no-concurrent-ingest points as [[compactIndex]].
    */
  def consolidateIndex(spark: SparkSession, idxDir: String): Unit =
    BatchLog.consolidate(spark, idxDir, Seq(
      "hs" -> hsSchema, "bands" -> bandSchema, "digests" -> digestSchema))

  def labels(spark: SparkSession, idxDir: String): (DataFrame, DataFrame, Int) = {
    // distinct: a deliberate full-replay through a FRESH checkpoint
    // appends a batch's hs rows twice (crash-retries within one
    // checkpoint are exactly-once via BatchLog, but a new checkpoint is
    // a new key namespace by design); duplicate ids would otherwise
    // duplicate label rows and inflate comp_size downstream.
    // Edges/bands tolerate replay by construction (set-union into
    // distinct-ing consumers), digests via the left_anti guard — hs
    // needs this distinct.
    val corpusIds = BatchLog.read(spark, idxDir, "hs", hsSchema)
      .select(col("doc_id")).distinct()
    Pipeline.contractToLabels(corpusIds,
      BatchLog.read(spark, idxDir, "edges", edgeSchema))
  }
}
