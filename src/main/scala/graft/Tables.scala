package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata (TESTDATA.md / FIXTURES.md).
  *
  * All tables are plain parquet scans — Catalyst prunes columns and
  * pushes predicates down to the vectorized parquet reader, so callers
  * should select/filter on the returned DataFrame and let the optimizer
  * shrink the scan (verified via `.explain`: `PushedFilters`/`ReadSchema`).
  *
  * At 100 TB these would be partitioned/bucketed tables; the loader is
  * the single seam where that layout knowledge would live.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** `events.ts` has shipped in two physical forms across testdata
    * generations: INT64 TIMESTAMP(NANOS) — which Spark's reader rejects
    * by default, so it is read as raw nanos (legacy conf) and truncated
    * to microseconds, matching DuckDB's ns→µs cast — and native
    * timestamp[us] with isAdjustedToUTC=false, which Spark reads as
    * TIMESTAMP_NTZ. Either way the column is normalized to a
    * first-class session-tz TimestampType: the session runs UTC, so the
    * NTZ→TZ cast keeps the wall clock, and the DuckDB oracle's
    * `ts::TIMESTAMP` is the same truncation/no-op on its side.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }

  /** Read one testdata table (see [[normalizeTs]] for `events`). */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
    case other =>
      spark.read.parquet(s"$sfDir/$other.parquet")
  }

  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def events(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Register every testdata table as a temp view in `spark`'s
    * session-local catalog, so `spark.sql` (CTEs, multi-table SQL) can
    * name them exactly as the DuckDB oracle does.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    register(spark, sfDir, names: _*)

  /** Register only the named tables (cheaper for queries that touch
    * one or two — no point planning scans of ten).
    */
  def register(spark: SparkSession, sfDir: String, which: String*): Unit =
    which.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
