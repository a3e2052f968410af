package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming media-ingest dedup — the state-BOUNDED variant.
  *
  * `EventStream.runDedup` uses exact `dropDuplicates`, whose state
  * never evicts (right for a bounded key space like users; measured in
  * SCALE.md round 5). Media fingerprints are the opposite regime: the
  * key space grows with the crawl forever, so production ingest must
  * use `dropDuplicatesWithinWatermark` — per-key state is held only
  * for the watermark delay (state ≈ ingest_rate × delay), trading
  * cross-delay re-uploads for bounded memory. This runner is the
  * oracled exercise of that API: payload fingerprints replayed with
  * event times inside one delay window, so within-delay semantics are
  * exact and the result is deterministic.
  *
  * The surfaced contract is the deduplicated FINGERPRINT SET: which
  * physical doc_id survives is arrival-order-dependent (exactly as
  * `EventStream.runDedup` documents for user dedup).
  */
object MediaStream {

  /** (doc_id, media_fp, ts): the dedup_media corpus — base payloads
    * plus planted re-uploads (+10000) — with a deterministic synthetic
    * event time, all inside one watermark delay.
    */
  private def mediaFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val base = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(hex(unhex(md5(col("text"))))).as("media_fp"))
    base.unionByName(
        base.select((col("doc_id") + 10000).as("doc_id"), col("media_fp")))
      .withColumn("ts",
        timestamp_seconds(lit(1700000000L) + col("doc_id") % 3600))
  }

  def runDedup(parent: SparkSession, sfDir: String): DataFrame = {
    val spark = parent.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val dir = graft.ops.purgeOnExit(
      s"${graft.ops.scratchRoot(spark)}/media_stream_${ProcessHandle.current().pid()}") +
      s"/${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val staged = mediaFrame(spark, sfDir)
    staged.write.mode("overwrite").parquet(dir)
    val sink = s"graft_media_dedup_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = spark.readStream.schema(staged.schema).parquet(dir)
      .withWatermark("ts", "2 hours") // all synthetic ts fall inside one delay
      .dropDuplicatesWithinWatermark("media_fp")
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    spark.table(sink).select(col("media_fp")).distinct().orderBy(col("media_fp"))
  }
}
