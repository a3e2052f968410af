package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops.{QueryDef, Relational, EngineOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator contributes one `QueryDef` through the
  * module lists below; the maps the driver consumes are derived, so an
  * operator is "claimed" exactly when its module wires it here.
  */
object SparkEntry {

  /** All judge-facing queries, one per SURVEY §2 operator. */
  def all: Seq[QueryDef] = {
    val defs =
      Relational.defs ++ EngineOps.defs ++ ops.Text.defs ++ ops.Vectors.defs ++
        ops.Multimodal.defs ++ ops.StreamingOps.defs ++ ops.Bucketing.defs ++
        ops.Pipeline.defs
    // a duplicate name would silently drop an operator from the Maps
    // below — one key stops being verified while KEYS.md still lists it
    val dupes = defs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupes.isEmpty, s"duplicate query keys: ${dupes.mkString(", ")}")
    defs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
