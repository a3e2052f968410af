package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed partition-wise decode pipeline for opaque binary media
  * (SURVEY §2.10 multimodal).
  *
  * This is the Scala analog of a `mapInPandas` decode stage: media
  * arrives as an opaque binary column with typed metadata, and decoding
  * runs batch-at-a-time per partition through `Dataset.mapPartitions`
  * (so a real codec would amortize its init cost per partition, not pay
  * it per row). The codec itself is STUBBED deterministically — this
  * container has no image/audio libraries — as byte-level features of
  * the payload; the Spark-side plumbing (binary column, case-class
  * schema, partition iteration, encoder round-trip) is real and is what
  * transfers to a production decoder.
  *
  * Everything after ingestion is executor-side; the driver never sees a
  * payload.
  */
object Multimodal {

  import QueryDef.sql

  /** One media item: opaque payload + dimensions from typed metadata. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Stub "decoded" features — deterministic byte-level stand-ins for
    * what a codec would emit (dimensions, first plane sample, checksum).
    */
  final case class MediaFeatures(
      doc_id: Long, byte_len: Long, b0: Long, checksum: Long)

  /** The partition-wise decoder. A real implementation would initialize
    * its codec once here (per partition = per batch) and stream rows
    * through it; the stub computes byte statistics in the same shape.
    */
  def decodePartition(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { m =>
      val bytes = m.payload
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
      MediaFeatures(m.doc_id, bytes.length.toLong,
        if (bytes.nonEmpty) (bytes(0) & 0xff).toLong else 0L, sum)
    }

  /** documents → fake 16-byte payloads (md5 of text) → typed decode. */
  def decodeDocuments(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    graft.ops.spread(Tables.documents(spark, sfDir))
      .select(col("doc_id"), unhex(md5(col("text"))).as("payload"))
      .as[MediaRow]
      .mapPartitions(decodePartition _)
  }

  val defs: Seq[QueryDef] = Seq(
    // Oracle replicates the stub decoder arithmetically from the md5
    // hex twin of the payload bytes.
    sql("multimodal_decode",
      """SELECT doc_id,
        | octet_length(unhex(md5(text))) AS byte_len,
        | ('0x' || substr(md5(text), 1, 2))::BIGINT AS b0,
        | list_sum(list_transform(range(1, 17),
        |   i -> ('0x' || substr(md5(text), 2*i - 1, 2))::BIGINT))::BIGINT AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      decodeDocuments(s, d).toDF().orderBy(col("doc_id"))
    }
  )
}
