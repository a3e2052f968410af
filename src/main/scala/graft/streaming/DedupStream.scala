package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger

/** Continuous-ingest dedup: a micro-batch stream of new documents is
  * deduplicated against the STORED MinHash band index, and survivors
  * are appended back into the index — so a novel document admitted in
  * batch N dedups its own copies from batch N+1 onward. This is the
  * end-to-end pipeline the reference's PUT-append semantics imply
  * (`flight_server.py:391-398`: every PUT appends to the live table a
  * later GET serves), composed from the pieces graft already proves
  * separately: the persisted band-index layout
  * (`Text.stagedBandIndex`) and the new×old-only incremental band join
  * (`dedup_incremental` — never old×old).
  *
  * Index layout on disk (all parquet):
  *  - `<idx>/texts`  (doc_id, text)      — exact-dup anti-join side
  *  - `<idx>/hs`     (doc_id, hs)        — Jaccard-verify side
  *  - `<idx>/bands`  (doc_id, b, bkey)   — LSH candidate generation,
  *    partitioned by band number
  *
  * Per micro-batch the work is O(batch): shingle + minhash the batch,
  * three hash joins whose index side is a parquet scan, and appends
  * sized to the survivors. At 100 TB the batch side is always small
  * (it is one ingest window), so every join broadcasts or
  * shuffle-hash-joins on bounded keys — the corpus is only ever
  * SCANNED, never re-hashed.
  *
  * Exactly-once: the checkpoint makes the SOURCE exactly-once (each
  * file is processed in exactly one micro-batch); the foreachBatch
  * appends are at-least-once on crash-retry, like every foreachBatch
  * sink. A production deployment makes the append idempotent by
  * writing `batch_id` into the appended files and pruning duplicates
  * on read (the same bookkeeping Spark's own file sink does via its
  * commit log); the dedup SEMANTICS are unaffected — re-appending the
  * same survivors creates exact duplicates of already-indexed docs,
  * which the next batch's anti-join drops again.
  */
object DedupStream {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Initialize an index directory from a seed corpus (texts + hs +
    * bands) — the batch bootstrap a deployment runs once.
    */
  def seedIndex(spark: SparkSession, seed: DataFrame, idxDir: String): Unit = {
    val docs = seed.select(col("doc_id"), col("text"))
    docs.write.mode("overwrite").parquet(s"$idxDir/texts")
    graft.ops.Text.shingleHashes(docs)
      .write.mode("overwrite").parquet(s"$idxDir/hs")
    graft.ops.Text.minhashBands(spark.read.parquet(s"$idxDir/hs"))
      .write.mode("overwrite").partitionBy("b").parquet(s"$idxDir/bands")
  }

  /** Admitted (non-duplicate) rows of `batch` vs the index at `idxDir`,
    * including batch-internal exact dedup (min doc_id per text wins).
    */
  private def survivors(spark: SparkSession, batch: DataFrame, idxDir: String): DataFrame = {
    import graft.ops.Text.{minhashBands, shingleHashes}
    val newBatch = batch.select(col("doc_id"), col("text"))
    val newHs = shingleHashes(newBatch)
    val jac = size(array_intersect(col("nh.hs"), col("oh.hs"))).cast("double") /
      size(array_union(col("nh.hs"), col("oh.hs")))
    val nearDup = minhashBands(newHs).as("n")
      .join(spark.read.parquet(s"$idxDir/bands").as("o"),
        col("n.b") === col("o.b") && col("n.bkey") === col("o.bkey"))
      .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("old_id"))
      .distinct()
      .join(newHs.as("nh"), col("nh.doc_id") === col("new_id"))
      .join(spark.read.parquet(s"$idxDir/hs").as("oh"), col("oh.doc_id") === col("old_id"))
      .filter(jac >= 0.5)
      .select(col("new_id").as("doc_id"))
      .distinct()
    val batchKeep = newBatch.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    newBatch
      .join(batchKeep.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .join(spark.read.parquet(s"$idxDir/texts").select(col("text")),
        Seq("text"), "left_anti")
      .join(nearDup, Seq("doc_id"), "left_anti")
  }

  /** Run the continuous dedup over every file currently in `inDir`
    * (AvailableNow), appending admitted docs to the index. Returns the
    * number of docs admitted by this run. Re-running with the same
    * checkpoint processes only files that arrived since the last run —
    * the restart-safe ingest loop.
    */
  def runIngest(parent: SparkSession, inDir: String, idxDir: String,
      checkpoint: String): Long = {
    val spark = parent.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val admitted = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream.schema(docSchema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // materialize once: the three appends below must see the SAME
        // survivor set even though each triggers its own job
        val keep = survivors(spark, batch, idxDir)
          .localCheckpoint(true)
        if (!keep.isEmpty) {
          keep.write.mode("append").parquet(s"$idxDir/texts")
          val hs = graft.ops.Text.shingleHashes(keep).localCheckpoint(true)
          hs.write.mode("append").parquet(s"$idxDir/hs")
          graft.ops.Text.minhashBands(hs)
            .write.mode("append").partitionBy("b").parquet(s"$idxDir/bands")
          admitted.addAndGet(keep.count())
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    admitted.get()
  }
}
