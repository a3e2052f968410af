package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table replayed as a file
  * stream (SURVEY §2.9).
  *
  * Mallard's "streaming" is RecordBatch *transport* (chunked
  * reader/writer loops, reference `flight_server.py:64-73`,
  * `demo.py:139-146`) with no event-time semantics; this module is the
  * Spark-native upgrade: file source → event-time watermark → windowed
  * aggregation → sink. The same aggregation exists as the batch query
  * `stream_window_hourly`, and the spec asserts stream/batch parity —
  * the Structured Streaming unification promise, demonstrated.
  *
  * At scale: the file source incrementally lists new files per
  * micro-batch; the windowed agg is a stateful hash aggregate keyed on
  * (window, event_type) with partial aggregation before the shuffle;
  * the watermark bounds state. Nothing here is driver-resident.
  */
object EventStream {

  /** Parquet schema of events.parquet with ts as raw nanos (read with
    * the legacy nanosAsLong conf, matching graft.Tables.load).
    */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The streaming source: events replayed from parquet, ts restored
    * to a proper timestamp (ns → µs truncation, same as the batch
    * loader).
    */
  def source(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .parquet(stageDir(sfDir))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Streaming gap-based sessions: the same session_window aggregation
    * the batch key `sessionize` uses, executed as a watermarked stream
    * (session_window is one of the few stateful operators whose batch
    * and streaming semantics are defined to coincide — StreamingSpec
    * asserts it).
    */
  def runSessions(spark: SparkSession, sfDir: String): DataFrame = {
    val sink = s"graft_stream_sessions_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = source(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_seen"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_seen"))
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    spark.table(sink)
      .select(col("user_id"), col("n_events"), col("first_seen"), col("last_seen"))
      .orderBy(col("user_id"), col("first_seen"))
  }

  /** The file-stream source lists a *directory*; the testdata table is
    * a single parquet file. Stage it (once per sfDir) into a replay
    * directory under target/ — the shape a production stream would
    * have anyway (a directory new files land in).
    */
  private def stageDir(sfDir: String): String = {
    import java.nio.file._
    val src = Paths.get(s"$sfDir/events.parquet")
    val dir = Paths.get(
      s"/root/repo/target/tmp/stream_events_${src.toString.hashCode.toHexString}")
    val dst = dir.resolve("events.parquet")
    if (!Files.exists(dst)) {
      Files.createDirectories(dir)
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    }
    dir.toString
  }

  /** Watermarked hourly tumbling-window aggregation (the streaming
    * twin of `Relational` key `stream_window_hourly`).
    */
  def hourlyAgg(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_raw"))

  /** Run the stream to completion over the available files (AvailableNow
    * ≈ bounded replay) into an in-memory sink, and return the final
    * result shaped exactly like the batch twin. Blocking; used by the
    * `stream_hourly_live` query key and the parity spec.
    */
  def runHourly(spark: SparkSession, sfDir: String): DataFrame = {
    val sink = s"graft_stream_hourly_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = hourlyAgg(source(spark, sfDir))
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    spark.table(sink)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"),
        round(col("total_raw"), 2).as("total"))
      .orderBy(col("hour"), col("event_type"))
  }
}
