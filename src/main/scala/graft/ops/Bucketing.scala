package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Co-located (bucketed) join: both sides pre-bucketed on the join key
  * with the same bucket count, so the join runs with NO shuffle of
  * either side — at 100 TB this is the difference between a join that
  * moves terabytes per run and one that moves nothing (you pay the
  * shuffle once, at write time). The spec asserts the plan is
  * exchange-free; the oracle only checks values, since DuckDB has no
  * bucketing concept.
  */
object Bucketing {

  import QueryDef.sql

  private val nBuckets = 8

  /** Write orders/customer as bucketed+sorted managed tables (idempotent
    * per session — the in-memory catalog keeps them for the JVM). Table
    * names are keyed by sfDir so a second scale factor in the same JVM
    * stages its own tables instead of silently reusing the first's. A
    * table directory left by a previous JVM is swept first: the fresh
    * in-memory catalog doesn't know the table, but saveAsTable refuses
    * a pre-existing managed location.
    */
  private def tag(d: String): String =
    d.replaceAll("[^a-zA-Z0-9]", "_").toLowerCase

  def stage(s: SparkSession, d: String): Unit = {
    def ensure(name: String)(write: => Unit): Unit =
      if (!s.catalog.tableExists(name)) {
        // Hadoop-FS sweep (r18): the warehouse may live on a cluster
        // store, where a java.io walk would miss the stale directory
        val wh = s.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        graft.ops.hfsDelete(s, s"$wh/$name")
        write
      }
    ensure(s"graft_orders_bkt_${tag(d)}") {
      Tables.orders(s, d).write.mode("overwrite")
        .bucketBy(nBuckets, "o_custkey").sortBy("o_custkey")
        .saveAsTable(s"graft_orders_bkt_${tag(d)}")
    }
    ensure(s"graft_customer_bkt_${tag(d)}") {
      Tables.customer(s, d).write.mode("overwrite")
        .bucketBy(nBuckets, "c_custkey").sortBy("c_custkey")
        .saveAsTable(s"graft_customer_bkt_${tag(d)}")
    }
  }

  /** The shuffle-free join over the staged tables. Broadcast is
    * disabled on a child session so the plan must use the bucketing
    * (otherwise the small side would broadcast and prove nothing).
    */
  def bucketedJoin(s: SparkSession, d: String) = {
    val bs = s.newSession()
    bs.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    bs.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    stage(bs, d)
    bs.table(s"graft_orders_bkt_${tag(d)}")
      .join(bs.table(s"graft_customer_bkt_${tag(d)}"), col("c_custkey") === col("o_custkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_custkey"))
  }

  val defs: Seq[QueryDef] = Seq(
    sql("join_bucketed",
      """SELECT o_custkey, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON c_custkey = o_custkey
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
      bucketedJoin(s, d)
    }
  )
}
