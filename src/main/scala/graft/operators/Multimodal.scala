package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * processed in partition-sized batches.
  *
  * The decode step (image resize / audio resample / video frame-sample) needs
  * native media libraries that are not in this container, so `StubDecoder`
  * computes deterministic fake features; everything Spark-side — the schema,
  * the binary column handling, the mapPartitions batch shape, the partition
  * parallelism — is real. Swap `Decoder` for a JNI/FFmpeg-backed impl on a
  * real cluster.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, modality: String,
      payload_len: Long, checksum: Long, width: Int, height: Int)

  /** Decode seam: bytes → (width, height) or equivalent modal dimensions. */
  trait Decoder extends Serializable {
    def decode(modality: String, payload: Array[Byte]): (Int, Int)
  }

  /** Deterministic fake: "dimensions" derived from payload length/content. */
  object StubDecoder extends Decoder {
    override def decode(modality: String, payload: Array[Byte]): (Int, Int) = {
      val base = payload.length
      modality match {
        case "image" => (base % 1920, base % 1080)
        case "audio" => (base % 48000, 1)
        case _ => (base % 1920, base % 60) // video: (res, fps-ish)
      }
    }
  }

  /** Documents table → media rows: text bytes stand in for the payload; the
    * modality cycles deterministically. Real pipelines read
    * `spark.read.format("binaryFile")` and carry the same shape.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload")).as[MediaRow]
  }

  final case class ResizedMedia(doc_id: Long, modality: String, width: Int,
      height: Int, payload: Array[Byte])
  final case class FrameSample(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Resize: the per-row transform a real pipeline runs after decode. The
    * stub "resampler" deterministically strides the payload bytes to the
    * target size; the Spark shape (mapPartitions batch, binary in/out,
    * per-task decoder init) is what a JNI/libvips-backed impl would reuse.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val target = math.max(1, math.min(r.payload.length, targetW * targetH / 256))
        val stride = math.max(1, r.payload.length / target)
        val out = Array.tabulate(target)(i => r.payload(math.min(i * stride, r.payload.length - 1)))
        ResizedMedia(r.doc_id, r.modality, targetW, targetH, out)
      }
    }
  }

  /** Frame sampling: one row per sampled frame (UDTF-shaped row expansion —
    * `flatMap` over the partition iterator). The stub cuts the payload into
    * fixed-size "frames" and keeps every `everyN`th.
    */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int = 64, everyN: Int = 2)
      : Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.modality == "video").flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (frame, i) if i % everyN == 0 => FrameSample(r.doc_id, i, frame)
      }
    }
  }

  /** The batch "decode" operator: per-partition decoder instantiation (the
    * expensive native-lib init happens once per task, not per row), then a
    * streaming pass over the rows.
    */
  def featurize(media: Dataset[MediaRow], decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = decoder.decode(r.modality, r.payload)
        var sum = 0L
        var i = 0
        while (i < math.min(r.payload.length, 64)) { sum += (r.payload(i) & 0xFF); i += 1 }
        MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong, sum, w, h)
      }
    }
  }
}
