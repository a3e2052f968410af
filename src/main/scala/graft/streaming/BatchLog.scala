package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Exactly-once appends for the streaming index directories
  * (VERDICT r10 task #7 / r11 task #4): the same bookkeeping Spark's
  * own file sink does via its `_spark_metadata` log, specialized to the
  * multi-half index layout [[DedupStream]] and [[ClusterStream]]
  * maintain.
  *
  * The problem: `foreachBatch` gives the SOURCE exactly-once semantics
  * (each input file is processed in exactly one micro-batch), but the
  * body's appends are at-least-once — a crash after some appends and
  * before the checkpoint commit makes the restart re-run the batch,
  * duplicating whatever was already written.
  *
  * The fix, per (index, batch):
  *  - every half's rows for one batch land in their own subdirectory,
  *    `<half>/batch=<key>/`, written with OVERWRITE — a retry replaces
  *    the partial files of the failed attempt instead of appending next
  *    to them;
  *  - after ALL halves are written, one zero-byte marker
  *    `<idx>/_commits/<key>` commits the batch atomically (a file
  *    create is the FS's atomic primitive);
  *  - reads only see committed batches: [[read]] lists the half's
  *    `batch=` subdirectories and keeps those whose key has a marker.
  *    Partial state from a crash is invisible, so the retry recomputes
  *    from exactly the pre-batch index and its overwrite is
  *    byte-identical to what the failed attempt would have produced;
  *  - a retry of a FULLY committed batch (crash between the marker and
  *    the checkpoint commit) is skipped up front via [[isCommitted]].
  *
  * Batch keys are `<checkpoint-hash>-<batchId>`: the epoch id alone is
  * only unique within one checkpoint lineage, and a deliberate
  * full-replay through a FRESH checkpoint (StreamingSpec pins one)
  * must re-process, not silently skip. Such a replay appends duplicate
  * rows — the documented at-least-once fallback the index consumers
  * tolerate by construction (distinct-ing unions, anti-join guards).
  *
  * At 100 TB: one subdirectory and one marker per ingest window keeps
  * listing cost proportional to window count, and [[ClusterStream]]
  * compaction already rewrites the unbounded half (edges) to a bounded
  * star set — deleting the superseded batch directories as it goes, so
  * the directory count stays bounded too. All paths go through the
  * Hadoop FileSystem API (HDFS/object stores at scale, local FS here).
  */
object BatchLog {

  /** Marker namespace for one (checkpoint, epoch): stable across
    * crash-retries of the same lineage, distinct across checkpoints.
    */
  def key(checkpoint: String, batchId: Long): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    s"$h-$batchId"
  }

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  def isCommitted(spark: SparkSession, idxDir: String, key: String): Boolean =
    fs(spark, idxDir).exists(new Path(s"$idxDir/_commits/$key"))

  /** Commit `key`: called once after every half of the batch is
    * written. The marker is an empty file; its creation is the atomic
    * commit point.
    */
  def commit(spark: SparkSession, idxDir: String, key: String): Unit = {
    val f = fs(spark, idxDir)
    val p = new Path(s"$idxDir/_commits/$key")
    f.mkdirs(p.getParent)
    f.create(p, true).close()
  }

  /** All committed batch keys of one index. */
  def committed(spark: SparkSession, idxDir: String): Set[String] = {
    val f = fs(spark, idxDir)
    val p = new Path(s"$idxDir/_commits")
    if (!f.exists(p)) Set.empty
    else f.listStatus(p).map(_.getPath.getName).toSet
  }

  /** Write one half's rows for one batch: OVERWRITE into the batch's
    * own subdirectory, so a crash-retry replaces its partial files.
    */
  def write(df: DataFrame, halfDir: String, key: String,
      partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(s"$halfDir/batch=$key")
  }

  /** The committed batch directories of one half (uncommitted partials
    * pruned, committed-but-compacted-away keys tolerated by existence).
    */
  def committedDirs(spark: SparkSession, idxDir: String, half: String): Seq[String] = {
    val halfDir = s"$idxDir/$half"
    val f = fs(spark, halfDir)
    if (!f.exists(new Path(halfDir))) Seq.empty
    else {
      val live = committed(spark, idxDir)
      f.listStatus(new Path(halfDir)).filter(_.isDirectory).map(_.getPath)
        .filter(p => p.getName.startsWith("batch=") &&
          live(p.getName.stripPrefix("batch=")))
        .map(_.toString).toSeq.sorted
    }
  }

  /** One half's committed rows. Each batch directory is passed as its
    * own root, so the `batch=` segment is part of the base path — never
    * inferred as a partition column — while partition layouts BELOW it
    * (the bands' `b=` dirs) resolve normally against the explicit
    * schema. Empty-but-typed when nothing is committed yet.
    */
  def read(spark: SparkSession, idxDir: String, half: String,
      schema: StructType): DataFrame = {
    val dirs = committedDirs(spark, idxDir, half)
    if (dirs.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

  /** Delete every committed batch directory of `half` except `keep` —
    * [[ClusterStream.compactIndex]]'s cleanup after the compacted
    * generation is committed. Idempotent; a crash mid-delete leaves
    * connectivity-redundant directories the next compaction removes.
    */
  def retainOnly(spark: SparkSession, idxDir: String, half: String,
      keep: String): Unit = {
    val f = fs(spark, s"$idxDir/$half")
    val halfPath = new Path(s"$idxDir/$half")
    if (f.exists(halfPath))
      f.listStatus(halfPath).filter(_.isDirectory).map(_.getPath)
        .filter(p => p.getName.startsWith("batch=") && p.getName != s"batch=$keep")
        .foreach(p => f.delete(p, true))
  }
}
