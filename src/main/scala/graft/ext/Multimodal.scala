package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (builder contract): media ride along as
  * opaque binary columns with typed metadata; decode / feature-extract run
  * per-partition over batches. Image payloads decode through the REAL
  * JDK codec ([[Codec]] sniffs the PNG signature and reads via
  * `javax.imageio` — no extra dependency); audio/video and non-image
  * payloads fall back to [[FakeCodec]], a deterministic stand-in for the
  * libraries this container lacks, while the Spark-side shape (schema,
  * typed Dataset boundary, partition-batched execution) is identical for
  * both paths.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class DecodedMeta(doc_id: Long, media_type: String, n_bytes: Long,
                         width: Int, height: Int, n_frames: Int, mean_byte: Double)

  /** STUB decoder — deterministic fake in place of a real audio/video
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

  /** Real-codec front end: image payloads carrying a PNG signature decode
    * through `javax.imageio.ImageIO` (width/height from the actual raster,
    * mean over all RGB channel samples); everything else — and any
    * undecodable image payload — takes the deterministic stub. PNG is
    * lossless, so the decoded stats are exact functions of the planted
    * pixels: the path is real AND reproducible.
    */
  object Codec {
    private def isPng(p: Array[Byte]): Boolean =
      p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G'

    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Int, Double) =
      if (mediaType == "image" && isPng(payload)) {
        try {
          val img = ImageIO.read(new ByteArrayInputStream(payload))
          if (img == null) FakeCodec.decode(mediaType, payload)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            (w, h, 1, sum.toDouble / (3L * w * h))
          }
        } catch { case _: Exception => FakeCodec.decode(mediaType, payload) }
      } else FakeCodec.decode(mediaType, payload)

    /** Deterministic PNG synthesis for the planted image payloads:
      * geometry derives from the source byte length exactly like
      * [[FakeCodec]] (w = n%64+1, h = n%48+1 — so the real decode
      * round-trips the same dims the stub would fake), pixels are the
      * source bytes tiled as grayscale. Pure function of the input bytes.
      */
    private[graft] def encodePng(src: Array[Byte]): Array[Byte] = {
      val n = src.length
      val w = 1 + n % 64
      val h = 1 + n % 48
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = if (n == 0) 0 else src((y * w + x) % n) & 0xff
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Synthesize a binary media column from the documents table: payload =
    * UTF-8 bytes of text, media_type assigned round-robin. Stands in for a
    * parquet source with a real binary column. (x30/x32's oracles derive
    * geometry from the TEXT byte length, so this table keeps raw text
    * payloads; [[mediaTableWithPng]] plants real PNGs for the decode path.)
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** [[mediaTable]] with REAL PNG bytes in the image rows: each image
    * payload is the document's bytes re-encoded as a grayscale PNG
    * (per-partition, the same batch shape a bulk media transcode uses).
    * Audio/video rows keep their opaque payloads for the stub path.
    */
  def mediaTableWithPng(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow].mapPartitions { rows =>
      ImageIO.setUseCache(false) // per-partition codec init: no disk-backed cache
      rows.map { r =>
        if (r.media_type == "image") r.copy(payload = Codec.encodePng(r.payload)) else r
      }
    }
  }

  /** Decode path: typed Dataset boundary + mapPartitions so the codec
    * amortizes per-batch init (ImageIO cache config, decoder context)
    * once per partition — the Scala analogue of a batched pandas UDF.
    */
  def decodeRows(ds: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      ImageIO.setUseCache(false) // per-partition codec init
      rows.map { r =>
        val (w, h, f, mean) = Codec.decode(r.media_type, r.payload)
        DecodedMeta(r.doc_id, r.media_type, r.payload.length.toLong, w, h, f,
          math.rint(mean * 10000) / 10000)
      }
    }
  }

  /** Stub-path decode over the raw text payloads (feeds x32, whose oracle
    * mirrors the fake geometry).
    */
  def decodeMeta(spark: SparkSession, dir: String): Dataset[DecodedMeta] =
    decodeRows {
      import spark.implicits._
      mediaTable(spark, dir).as[MediaRow]
    }

  /** Real-codec decode (x31): image rows carry planted PNGs and go through
    * `javax.imageio`; by construction the decoded dims equal the derived
    * geometry, so the real decode also VERIFIES the derivation.
    */
  def decodeMetaWithPng(spark: SparkSession, dir: String): Dataset[DecodedMeta] =
    decodeRows(mediaTableWithPng(spark, dir))

  /** Plant the image rows as REAL .png FILES under the run-scoped scratch
    * dir (idempotent per JVM) — the fixture for [[binaryFileIngest]].
    * Writing happens per-partition on the executors (no driver loop); the
    * temp-dir rename publishes the tree atomically after the job finishes.
    */
  private def plantPngFiles(spark: SparkSession, dir: String): String = {
    val out = new java.io.File(s"${graft.RunScoped.ioDir}/png")
    if (!out.exists()) {
      val tmp = new java.io.File(out.getPath + ".tmp")
      mediaTableWithPng(spark, dir)
        .filter(_.media_type == "image")
        .foreachPartition { rows: Iterator[MediaRow] =>
          tmp.mkdirs()
          rows.foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(tmp.getPath, s"doc_${r.doc_id}.png"), r.payload)
          }
        }
      tmp.renameTo(out)
    }
    out.getPath
  }

  /** Multimodal ingestion through Spark's `binaryFile` source — the path a
    * 100 TB media corpus actually takes into the engine: one row per file
    * (path, length, content bytes), scanned in parallel, identity parsed
    * from the file name, payload decoded per-partition by the same
    * [[Codec]] as the in-row path. No SQL oracle exists for a binary file
    * tree (rows-only check); equivalence with the in-row PNG decode is
    * asserted in ExtSpec.
    */
  def binaryFileIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = plantPngFiles(spark, dir)
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(src)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.png", 1).cast("long").as("doc_id"),
        lit("image").as("media_type"),
        col("content").as("payload"))
    decodeRows(rows.as[MediaRow]).toDF().orderBy("doc_id")
  }

  case class TransformedMedia(doc_id: Long, media_type: String,
                              out_w: Int, out_h: Int, sampled_frames: Seq[Int])

  /** Resize + frame-sample over the decoded stream — the other two media
    * transforms a training pipeline needs. The pixel work rides the
    * stub-path geometry (aspect-preserving target dims; every-nth frame
    * indices) so the SQL oracle can mirror it; the dataflow — decode once,
    * derive many transforms per partition pass — is the real shape.
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
