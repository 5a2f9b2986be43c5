package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (builder contract): media ride along as
  * opaque binary columns with typed metadata; decode / feature-extract run
  * per-partition over batches. The actual codec calls are STUBBED (no
  * image/audio libraries in this container) behind [[FakeCodec]] — a
  * deterministic stand-in — while the Spark-side shape (schema, typed
  * Dataset boundary, partition-batched execution) is real and tested.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class DecodedMeta(doc_id: Long, media_type: String, n_bytes: Long,
                         width: Int, height: Int, n_frames: Int, mean_byte: Double)

  /** STUB decoder — deterministic fake in place of a real image/audio
    * codec. A production build swaps `decode` for the real library call;
    * the partition-batched call pattern and output schema stay identical.
    */
  object FakeCodec {
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Int, Double) = {
      val n = payload.length
      var sum = 0L
      var i = 0
      while (i < n) { sum += (payload(i) & 0xff); i += 1 }
      val mean = if (n == 0) 0.0 else sum.toDouble / n
      val frames = mediaType match {
        case "video" => 1 + (n % 8)
        case "audio" => 1 + (n % 16)
        case _       => 1
      }
      (1 + n % 64, 1 + n % 48, frames, mean)
    }
  }

  /** Synthesize a binary media column from the documents table: payload =
    * UTF-8 bytes of text, media_type assigned round-robin. Stands in for a
    * parquet source with a real binary column.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Decode path: typed Dataset boundary + mapPartitions so a real codec
    * amortizes per-batch init (model load, decoder context) once per
    * partition — the Scala analogue of a batched pandas UDF.
    */
  def decodeMeta(spark: SparkSession, dir: String): Dataset[DecodedMeta] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow].mapPartitions { rows =>
      // per-partition init of the (stubbed) codec would go here
      rows.map { r =>
        val (w, h, f, mean) = FakeCodec.decode(r.media_type, r.payload)
        DecodedMeta(r.doc_id, r.media_type, r.payload.length.toLong, w, h, f,
          math.rint(mean * 10000) / 10000)
      }
    }
  }

  case class TransformedMedia(doc_id: Long, media_type: String,
                              out_w: Int, out_h: Int, sampled_frames: Seq[Int])

  /** Resize + frame-sample over the decoded stream — the other two media
    * transforms a training pipeline needs. The pixel work is stubbed with
    * the decoder (aspect-preserving target dims from the fake geometry;
    * every-nth frame indices); the dataflow — decode once, derive many
    * transforms per partition pass — is the real shape.
    */
  def transformMedia(spark: SparkSession, dir: String,
                     targetW: Int = 32, frameStride: Int = 2): Dataset[TransformedMedia] = {
    import spark.implicits._
    decodeMeta(spark, dir).map { m =>
      val scale = targetW.toDouble / math.max(1, m.width)
      // floor(x + 0.5), not rint: half-even would diverge from the SQL
      // oracle's rounding on exact .5 scale hits
      val outH = math.max(1, math.floor(m.height * scale + 0.5).toInt)
      val frames = (0 until m.n_frames by frameStride).toSeq
      TransformedMedia(m.doc_id, m.media_type, targetW, outH, frames)
    }
  }

  /** Pure-column metadata over the binary payload (oracle-checkable): byte
    * length and the fake geometry derived from it. Shows binary columns
    * flowing through codegen'd expressions without leaving the JVM row
    * format.
    */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"), col("media_type"),
        length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("width", (col("n_bytes") % 64 + 1).cast("long"))
      .withColumn("height", (col("n_bytes") % 48 + 1).cast("long"))
      .orderBy("doc_id")
}
