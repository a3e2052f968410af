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

  /** Read one testdata table. `events.parquet` carries INT64
    * TIMESTAMP(NANOS) which Spark's parquet reader rejects by default;
    * we read it as raw nanos (legacy conf) and truncate to microseconds
    * (integer division — matches DuckDB's ns→µs truncation) so `ts` is
    * a first-class TimestampType column downstream.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
