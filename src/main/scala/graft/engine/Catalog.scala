package graft.engine

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-table registry with Mallard's PUT append semantics.
  *
  * Mirrors `_insert_table` (reference `flight_server.py:388-400`):
  * `CREATE TABLE IF NOT EXISTS t AS SELECT * FROM tmp LIMIT 0` followed
  * by `INSERT INTO t SELECT * FROM tmp` — i.e. first PUT fixes the
  * schema (schema-on-write), later PUTs append.
  *
  * The map is authoritative; the session temp view is derived from it on
  * every mutation so `spark.sql` can see engine tables by name
  * (≈ `db_conn.register`, `flight_server.py:390`). Appends are lazy
  * `unionByName` plans — nothing materializes until an action, and
  * Catalyst optimizes *through* the union (filter/column pushdown into
  * both branches), which is what keeps this viable at scale.
  */
final class Catalog(val spark: SparkSession) {

  private val tables = TrieMap.empty[String, DataFrame]

  /** First put creates (schema-on-write); later puts append by name. */
  def put(name: String, df: DataFrame): Unit = {
    val next = tables.get(name) match {
      case Some(existing) => existing.unionByName(df)
      case None           => df
    }
    tables.update(name, next)
    next.createOrReplaceTempView(name)
  }

  /** Replace regardless of prior contents (CREATE OR REPLACE). */
  def putReplace(name: String, df: DataFrame): Unit = {
    tables.update(name, df)
    df.createOrReplaceTempView(name)
  }

  def get(name: String): DataFrame =
    tables.getOrElse(name,
      throw new NoSuchElementException(
        s"Table '$name' not found. Available: ${list.mkString(", ")}"))

  def contains(name: String): Boolean = tables.contains(name)

  def drop(name: String): Boolean = {
    tables.remove(name)
    spark.catalog.dropTempView(name)
  }

  def list: Seq[String] = tables.keys.toSeq.sorted
}
