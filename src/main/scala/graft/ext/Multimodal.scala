package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The actual codecs (JPEG decode, audio resample, video frame-sample) are
  * NOT available in this environment — [[FakeDecoder]] is a clearly-marked
  * deterministic stand-in. Everything Spark-side is real and tested: the
  * schema, the binary column handling, the mapPartitions batch shape
  * (decode-per-partition, never per-row driver calls), and the
  * pushdown-friendly metadata projection.
  *
  * At 100 TB the layout matters more than the codec: payloads live in their
  * own column (parquet column pruning means metadata-only queries never read
  * bytes), and partition counts are sized by `media_bytes`, not row count.
  */
object Multimodal {
  /** One media row: payload + typed metadata. */
  final case class MediaItem(doc_id: Long, kind: String, media: Array[Byte])

  /** Decoded-media metadata (what a real decoder would emit). */
  final case class MediaMeta(doc_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, checksum: Long)

  /** STUB — deterministic fake decoder. A real deployment swaps this for an
    * image/audio library call; the signature (bytes in, metadata out, called
    * once per item inside a partition batch) is the real contract. */
  object FakeDecoder {
    def decode(item: MediaItem): MediaMeta = {
      val n = item.media.length.toLong
      // xor-fold checksum: stands in for a content hash
      var cs = 0L
      var i = 0
      while (i < item.media.length) { cs = cs * 31 + (item.media(i) & 0xFF); i += 1 }
      MediaMeta(item.doc_id, item.kind, n,
        width = (n % 640).toInt, height = (n % 480).toInt, checksum = cs)
    }
  }

  /** Derives a binary media column from `documents` (text bytes stand in
    * for real payloads; schema/partitioning are what is under test). */
  def attachMedia(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("media"))

  /** Batch decode over partitions: the Spark-side shape of a real codec
    * pass. Dataset+mapPartitions so per-partition setup cost (codec init)
    * amortizes over the batch — the Scala analogue of `mapInPandas`. */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaItem].mapPartitions { items =>
      // real impl: initialize codec once here, then stream the batch
      items.map(FakeDecoder.decode)
    }
  }

  /** STUB resize: deterministically truncates the payload to `maxBytes`
    * (a real impl decodes, scales, re-encodes — same batch shape). */
  def resize(spark: SparkSession, media: DataFrame, maxBytes: Int): Dataset[MediaItem] = {
    import spark.implicits._
    media.as[MediaItem].mapPartitions { items =>
      // real impl: codec init once per partition, then per-item re-encode
      items.map(m => m.copy(media = m.media.take(maxBytes)))
    }
  }

  /** Frame row emitted by [[sampleFrames]]. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Default frames-per-payload for the query entry — shared with the
    * oracle mirror's generate_series bound. */
  val DefaultFrames = 4

  /** STUB frame sampling: splits the payload into `n` evenly-spaced chunks
    * (a real impl seeks keyframes). One input row fans out to n rows — the
    * video-to-training-examples shape; downstream repartitioning should key
    * on (doc_id, frame_idx). */
  def sampleFrames(spark: SparkSession, media: DataFrame, n: Int): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaItem].flatMap { m =>
      val len = m.media.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { i =>
        val from = (len.toLong * i / n).toInt
        val until = (len.toLong * (i + 1) / n).toInt
        Frame(m.doc_id, i, java.util.Arrays.copyOfRange(m.media, from, until))
      }
    }
  }

  /** Repartitions a media frame so each partition holds ≈ `targetBytes` of
    * payload — row counts are the wrong unit when payloads span 1 KB to
    * 1 GB. One cheap stats pass sizes the partition count; hash
    * distribution on the id column spreads rows. (With extreme per-row
    * variance, range-partition on cumulative bytes instead.) */
  def repartitionByBytes(media: DataFrame, idCol: String,
      byteCol: String, targetBytes: Long): DataFrame = {
    val total = media.agg(coalesce(sum(col(byteCol)), lit(0L)))
      .head().getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    media.repartition(parts, col(idCol))
  }

  /** Metadata-only projection computed declaratively (no decode): byte
    * size per payload — the query pattern that must prune the binary column
    * at scan time when metadata is materialized columnar. */
  def mediaByteStats(documents: DataFrame): DataFrame =
    attachMedia(documents)
      .select(col("doc_id"), col("kind"),
        octet_length(col("media")).cast(LongType).as("n_bytes"))
      .orderBy("doc_id")
}
