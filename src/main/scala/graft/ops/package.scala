package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared helpers for the operator modules.
  *
  * Determinism rules (SURVEY §5.2) enforced here:
  *  - money sums round to 2, averages/ratios to 6 — double summation
  *    order differs between Spark and the DuckDB oracle, so raw sums
  *    of binary-inexact decimals can differ in the last ulps;
  *  - every hash used in dedup/fingerprint operators derives from md5
  *    (identical lowercase-hex output in both engines), never from
  *    engine-native `hash`/`xxhash64` which DuckDB cannot replicate.
  */
package object ops {

  type Q = (SparkSession, String) => DataFrame

  def r2(c: Column): Column = round(c, 2)
  def r4(c: Column): Column = round(c, 4)
  def r6(c: Column): Column = round(c, 6)

  /** Portable rounding for PER-ROW continuous doubles: `round(x, n)`
    * diverges between engines when x·10ⁿ lands near a half (Spark
    * rounds the exact binary value via BigDecimal; DuckDB multiplies
    * then rounds the distorted product). floor(x·10ⁿ + 0.5)/10ⁿ is the
    * same double arithmetic on both sides → bit-identical output.
    * Aggregate outputs (sums/avgs over many rows) keep plain round():
    * their probability of an exact half is ~2⁻⁴⁰, and the SQL stays
    * readable.
    */
  def pr2(c: Column): Column = floor(c * 100 + 0.5) / 100
  def pr4(c: Column): Column = floor(c * 10000 + 0.5) / 10000
  def pr6(c: Column): Column = floor(c * 1000000 + 0.5) / 1000000

  /** DuckDB twins of pr2/pr4/pr6 (inline SQL text). */
  def sqlPr(x: String, pow: Long): String = s"floor(($x) * $pow + 0.5) / $pow"

  /** First 32 bits of md5 as a non-negative long — portable hash.
    * DuckDB twin: `('0x' || substr(md5(x), 1, 8))::BIGINT`.
    */
  def h32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast(LongType)

  /** Bits 33..64 of md5 as a non-negative long (second word). */
  def h32b(c: Column): Column =
    conv(substring(md5(c.cast("string")), 9, 8), 16, 10).cast(LongType)

  /** Seeded portable hash: md5 of "<seed>:<value>".
    * DuckDB twin: `('0x' || substr(md5(s::VARCHAR || ':' || x), 1, 8))::BIGINT`.
    */
  def h32Seeded(seed: Column, c: Column): Column =
    conv(substring(md5(concat(seed.cast("string"), lit(":"), c.cast("string"))), 1, 8), 16, 10)
      .cast(LongType)

  /** Cache a frame that multiple branches of ONE query plan read —
    * UNLESS `spark.graft.plan.cache=false`. Query builders cannot
    * unpersist (the action runs in the caller), so in a long-lived
    * serve session repeated executions would accumulate cached plans
    * in the block manager (advisor finding, round 13); the flag is the
    * escape hatch such a deployment flips, trading one extra
    * computation per branch for bounded block-manager state — the same
    * contract as Vectors.maybeCache (`spark.graft.ann.cache`). Lazy
    * (no eager count): the branches run inside a single action, so the
    * first evaluation fills the cache without a race.
    */
  def maybePlanCache(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get("spark.graft.plan.cache", "true").toBoolean) df.cache()
    else df

  /** ⌈N/3⌉-rank tercile thresholds over one bounded-domain column —
    * the quantize-then-rank move shared by quality_buckets and
    * rfm_segments so the rank convention cannot drift between keys
    * (round-13 review): value histogram → cumulative window over the
    * BOUNDED histogram (never the row set) → the smallest values whose
    * cumulative count reaches ⌈N/3⌉ / ⌈2N/3⌉, returned as a 1-row
    * frame the caller broadcast-joins back. DuckDB twin:
    * [[tercileCutsSql]].
    */
  def tercileCuts(values: DataFrame, vcol: String, a1: String, a2: String): DataFrame = {
    val hist = values.groupBy(col(vcol).as("v")).agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum", sum(col("c")).over(Window.orderBy(col("v"))))
    val n = values.agg(count(lit(1)).as("nn"))
    cum.crossJoin(broadcast(n))
      .agg(min(when(col("cum") >= expr("(nn + 2) div 3"), col("v"))).as(a1),
        min(when(col("cum") >= expr("(2 * nn + 2) div 3"), col("v"))).as(a2))
  }

  /** DuckDB twin of [[tercileCuts]]: given a histogram CTE
    * `<hist>(v, c)` and a 1-row count CTE `n(nn)`, emits the
    * cumulative CTE `c<out>` and the 1-row threshold CTE `<out>(a1, a2)`.
    */
  def tercileCutsSql(hist: String, out: String, a1: String, a2: String): String =
    s"""c$out AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM $hist),
       |$out AS (SELECT min(CASE WHEN cum >= (nn + 2) // 3 THEN v END) AS $a1,
       |              min(CASE WHEN cum >= (2 * nn + 2) // 3 THEN v END) AS $a2
       |       FROM c$out, n)""".stripMargin

  /** Whitespace tokenization of `documents.text` (single-space-joined
    * tokens per FIXTURES.md). DuckDB twin: `string_split(text, ' ')`.
    */
  def toks(c: Column): Column = split(c, " ")

  /** Spread a small-file scan across the cluster before heavy per-row
    * compute. A sub-split-size parquet file arrives as ONE partition,
    * which would serialize hashing/shingling on one core; the shuffle
    * moves only the raw rows (cheap) and parallelizes everything
    * downstream.
    *
    * Guarded: a pre-split input (a 100 TB corpus already arrives in
    * thousands of partitions) passes through untouched — an
    * unconditional `repartition` there would move the entire corpus
    * once before any work. Only a scan narrower than half the cluster
    * gets the rebalancing shuffle.
    */
  /** Session-derived scratch root for staged indexes, replay
    * directories and stream sinks: `spark.graft.scratchDir` when set,
    * else `<spark.sql.warehouse.dir>/_graft_scratch`. Never a
    * hardcoded repo path, so the engine works from any working
    * directory (VERDICT r10 #8). The `file:` scheme is stripped
    * because several consumers also touch these paths through
    * java.nio; a non-local warehouse therefore requires an explicit
    * local `spark.graft.scratchDir` (staging is driver-local I/O).
    */
  def scratchRoot(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.scratchDir")
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir") + "/_graft_scratch")
      .stripPrefix("file:")

  /** Build-once staged publish for derived on-disk artifacts (MinHash
    * band indexes, IVF×PQ inverted lists): if `<scratch>/<name>`'s
    * `_built` marker doesn't match `stamp`, run `build(stageDir)`
    * against a pid-unique staging directory and atomically rename it
    * into place. A concurrent builder that loses the rename race keeps
    * the winner's copy and discards its own — a lost race costs a
    * duplicate build, never a torn index. Returns the published
    * directory. The freshness `stamp` is typically [[sourceStamp]] of
    * the parquet source the artifact derives from, PLUS a
    * build-format token when the build recipe can evolve (see
    * `Vectors.ivfIndexFormat`): source freshness alone would serve an
    * index built by an older code version — silently wrong for every
    * caller outside the oracle harness — after any change to the
    * encode logic, seeds, or layout.
    */
  def stagedArtifact(spark: SparkSession, name: String, stamp: String)(
      build: String => Unit): String = {
    import java.nio.file._
    val dir = Paths.get(s"${scratchRoot(spark)}/$name")
    val marker = dir.resolve("_built")
    val fresh = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), "UTF-8") == stamp
    if (!fresh) {
      val stage = Paths.get(s"$dir.build-${ProcessHandle.current().pid()}")
      build(stage.toString)
      Files.write(stage.resolve("_built"), stamp.getBytes("UTF-8"))
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      try {
        if (Files.exists(dir)) rm(dir.toFile)
        Files.move(stage, dir, StandardCopyOption.ATOMIC_MOVE)
      } catch {
        case _: FileAlreadyExistsException | _: DirectoryNotEmptyException =>
          rm(stage.toFile)
      }
    }
    dir.toString
  }

  /** size+mtime stamp of a source file — the freshness key for
    * [[stagedArtifact]] builds derived from one parquet source.
    */
  def sourceStamp(path: String): String = {
    val p = java.nio.file.Paths.get(path)
    s"${java.nio.file.Files.size(p)}:${java.nio.file.Files.getLastModifiedTime(p)}"
  }

  /** Register `path` for recursive deletion at JVM exit and return it
    * — for pid-scoped staging directories that would otherwise
    * accumulate one copy per run.
    */
  private val purgeRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def purgeOnExit(path: String): String = {
    // one hook per path: repeated calls from per-run operators (the
    // streaming index builds register their pid-scoped root on every
    // invocation) must not stack duplicate shutdown hooks
    if (purgeRegistered.add(path)) {
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(new java.io.File(path))
      }
    }
    path
  }

  def spread(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // max(2, …): at parallelism 2-3 the halved threshold would round
    // down to 1 and never rebalance the single-partition scan this
    // helper exists for
    if (df.rdd.getNumPartitions < math.max(2, parallelism / 2))
      df.repartition(parallelism)
    else df
  }
}
