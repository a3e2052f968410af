package graft.engine

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-action metrics for an engine session — the Spark-native form of
  * the reference's `Benchmarker` (`demo.py:284-419`): rows, duration,
  * action name, collected by a driver-side QueryExecutionListener (the
  * listener API is driver-side by design; this is not a data-path
  * collect).
  */
final class Metrics private (spark: SparkSession) {

  import Metrics.Record

  private val records = new ConcurrentLinkedQueue[Record]()

  private val listener = new QueryExecutionListener {
    private def outputRows(qe: QueryExecution): Long =
      qe.executedPlan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      records.add(Record(funcName, outputRows(qe), durationNs / 1000, failed = false))

    override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit =
      records.add(Record(funcName, -1L, -1L, failed = true))
  }

  spark.listenerManager.register(listener)

  def snapshot: Seq[Record] = {
    import scala.jdk.CollectionConverters._
    records.iterator().asScala.toSeq
  }

  def toDF: DataFrame = {
    val s = spark
    import s.implicits._
    snapshot.toDF()
  }

  def clear(): Unit = records.clear()

  def close(): Unit = spark.listenerManager.unregister(listener)
}

object Metrics {
  /** Top-level (not inner) so Spark can derive an Encoder for toDF. */
  final case class Record(action: String, rows: Long, micros: Long, failed: Boolean)

  /** Attach a metrics recorder to an engine's session. */
  def attach(engine: Engine): Metrics = new Metrics(engine.spark)
}
