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

  /** One sampled "frame": index, byte offset, and the stub-decoded
    * frame payload (one byte — a real sampler would emit a frame
    * tensor; the row shape and fan-out are what transfer).
    */
  final case class FrameRow(
      doc_id: Long, frame_idx: Long, offset: Long, frame_byte: Long)

  /** Frame sampling: each media payload fans out to its strided
    * frames, batch-at-a-time per partition. The fan-out is bounded by
    * payload_len / stride — the video analog of the decode stage, and
    * the shape (bounded flatMap inside mapPartitions, no shuffle until
    * someone aggregates frames) is exactly how a 100 TB video corpus
    * gets frame-sampled: decode parallelism = input partitions.
    */
  def sampleFrames(rows: Iterator[MediaRow], stride: Int): Iterator[FrameRow] =
    rows.flatMap { m =>
      Iterator.range(0, m.payload.length, stride).zipWithIndex.map {
        case (off, idx) =>
          FrameRow(m.doc_id, idx.toLong, off.toLong, (m.payload(off) & 0xff).toLong)
      }
    }

  def sampleDocuments(spark: SparkSession, sfDir: String): Dataset[FrameRow] = {
    import spark.implicits._
    graft.ops.spread(Tables.documents(spark, sfDir))
      .select(col("doc_id"), unhex(md5(col("text"))).as("payload"))
      .as[MediaRow]
      .mapPartitions(rows => sampleFrames(rows, stride = 4))
  }

  /** A 2×2 max-pooled "thumbnail" of the 4×4 byte grid: out pixel
    * (r,c) = max over the 2×2 input block. A real resize kernel would
    * interpolate float planes; the pooling index arithmetic, typed
    * output schema and per-partition batch shape are what transfer.
    */
  final case class ResizedRow(
      doc_id: Long, out_w: Int, out_h: Int,
      p00: Long, p01: Long, p10: Long, p11: Long)

  def resizePartition(rows: Iterator[MediaRow]): Iterator[ResizedRow] =
    rows.map { m =>
      def px(r: Int, c: Int): Long = (m.payload(r * 4 + c) & 0xff).toLong
      def pool(r: Int, c: Int): Long =
        math.max(math.max(px(2 * r, 2 * c), px(2 * r, 2 * c + 1)),
          math.max(px(2 * r + 1, 2 * c), px(2 * r + 1, 2 * c + 1)))
      ResizedRow(m.doc_id, 2, 2, pool(0, 0), pool(0, 1), pool(1, 0), pool(1, 1))
    }

  def resizeDocuments(spark: SparkSession, sfDir: String): Dataset[ResizedRow] = {
    import spark.implicits._
    graft.ops.spread(Tables.documents(spark, sfDir))
      .select(col("doc_id"), unhex(md5(col("text"))).as("payload"))
      .as[MediaRow]
      .mapPartitions(resizePartition _)
  }

  val defs: Seq[QueryDef] = Seq(
    // Resize (2×2 max-pool of the 4×4 byte grid); oracle recomputes
    // the pooled maxima from the md5 hex twin byte-by-byte.
    sql("multimodal_resize", {
      def b(i: Int): String = s"('0x' || substr(md5(text), ${2 * i + 1}, 2))::BIGINT"
      def pool(r: Int, c: Int): String = {
        val i = 2 * r * 4 + 2 * c
        s"greatest(${b(i)}, ${b(i + 1)}, ${b(i + 4)}, ${b(i + 5)})"
      }
      s"""SELECT doc_id, 2 AS out_w, 2 AS out_h,
         | ${pool(0, 0)} AS p00, ${pool(0, 1)} AS p01,
         | ${pool(1, 0)} AS p10, ${pool(1, 1)} AS p11
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      resizeDocuments(s, d).toDF().orderBy(col("doc_id"))
    },

    // Frame sampling over the fake 16-byte "video" payloads: 4 frames
    // per doc at stride 4; the oracle reads the same bytes out of the
    // md5 hex twin.
    sql("multimodal_frames",
      """SELECT doc_id, f AS frame_idx, f * 4 AS "offset",
        | ('0x' || substr(md5(text), f * 8 + 1, 2))::BIGINT AS frame_byte
        |FROM documents, range(0, 4) t(f)
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      sampleDocuments(s, d).toDF().orderBy(col("doc_id"), col("frame_idx"))
    },

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
