package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.GraftQuery

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in partition-level batches.
  *
  * The Spark-side contract is real and tested — schema (binary payload +
  * metadata struct), partition-batched execution via `mapPartitions` on a
  * typed Dataset (the Scala analog of `mapInPandas` batches), and a
  * downstream relational stage over the extracted features. The codec
  * itself is a clearly-marked deterministic STUB (`FakeCodec`): this
  * container has no image/audio libraries, so decode derives features
  * from the payload bytes alone. Swapping in a real decoder changes only
  * `FakeCodec.decode` — no plan shape, schema, or partitioning changes.
  *
  * Scale notes: payloads stay off the driver; decode is a narrow
  * per-partition transformation (no shuffle), so it scales with input
  * splits. For real media, pair with `spark.sql.files.maxPartitionBytes`
  * sized so a partition's decoded batch fits executor memory, and use
  * binaryFile / parquet-with-binary sources.
  */
object MultimodalOps {

  /** One media row: opaque payload + metadata, as stored at rest. */
  final case class MediaRecord(media_id: Long, format: String, payload: Array[Byte])

  /** Extracted features (what a real image/audio decoder would emit). */
  final case class MediaFeatures(
      media_id: Long,
      format: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      mean_byte: Double)

  /** STUB codec — deterministic fake decode: features are pure functions
    * of the payload bytes. Replace `decode` with a real codec binding
    * (e.g. javax.imageio / ffmpeg JNI) in production; `???` semantics
    * are modeled by the fixed fake below so the pipeline stays runnable
    * and testable in this container. */
  object FakeCodec {
    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.payload.length
      var sum = 0L
      var i = 0
      while (i < n) { sum += (r.payload(i) & 0xff); i += 1 }
      MediaFeatures(
        media_id = r.media_id,
        format = r.format,
        n_bytes = n.toLong,
        width = 64 + (n % 576),
        height = 64 + ((n * 7) % 416),
        n_frames = 1 + (n % 8),
        mean_byte = if (n == 0) 0.0 else sum.toDouble / n)
    }
  }

  /** Partition-batched decode: one iterator pass per partition (batch
    * shape), payload dropped from the output schema (column pruning for
    * the downstream relational stage). */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(FakeCodec.decode))
  }

  /** A media row after resizing: new dims + re-encoded payload. */
  final case class ResizedMedia(media_id: Long, format: String,
      width: Int, height: Int, payload: Array[Byte])

  /** Resize stage (STUB transform, real plumbing): per-partition batched,
    * no shuffle, payload-in/payload-out so downstream stages chain. The
    * stub "resample" deterministically strides the source bytes to
    * exactly w·h output bytes; a real binding would call the codec's
    * scaler here with the same signature. */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    media.mapPartitions(_.map { r =>
      val n = r.payload.length
      val out = new Array[Byte](w * h)
      if (n > 0) {
        var i = 0
        while (i < out.length) {
          out(i) = r.payload(((i.toLong * n) / out.length).toInt)
          i += 1
        }
      }
      ResizedMedia(r.media_id, r.format, w, h, out)
    })
  }

  /** One sampled frame of a (fake-)video payload. */
  final case class Frame(media_id: Long, frame_idx: Int, n_bytes: Long,
      payload: Array[Byte])

  /** Frame sampling (STUB decode, real plumbing): splits each payload
    * into the codec's reported frame count and emits every `every`-th
    * frame — a flatMap, so one media row fans out to many frame rows
    * with NO shuffle; downstream per-frame stages inherit the input
    * partitioning. */
  def sampleFrames(media: Dataset[MediaRecord], every: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    require(every > 0, s"sampling stride must be positive, got $every")
    media.mapPartitions(_.flatMap { r =>
      val nFrames = FakeCodec.decode(r).n_frames
      val n = r.payload.length
      (0 until nFrames by every).iterator.map { f =>
        val from = (f.toLong * n / nFrames).toInt
        val until = ((f + 1).toLong * n / nFrames).toInt
        val bytes = java.util.Arrays.copyOfRange(r.payload, from, until)
        Frame(r.media_id, f, bytes.length.toLong, bytes)
      }
    })
  }

  /** Fabricate a deterministic media table from `documents` (the
    * container ships no real media): payload = utf-8 bytes of the text. */
  def fakeMediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      concat(lit("img/fake-"), col("source")).as("format"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  val all: Seq[GraftQuery] = Seq(
    // ------------------------------------------------------------------
    // m01: binary ingest → partition-batched decode (STUB codec) →
    // relational aggregation over extracted features. Deterministic but
    // mapPartitions logic is not ANSI-SQL-expressible → rows-only; the
    // ScalaTest pins exact feature values for known payloads.
    GraftQuery(
      "m01_multimodal_features",
      "binary payload → stub decode (mapPartitions batches) → per-format feature aggregates",
      (spark, dir) => {
        val t = Tables(spark, dir)
        decodeFeatures(fakeMediaTable(spark, t.documents))
          .toDF()
          .groupBy(col("format"))
          .agg(
            count(lit(1)).as("n_media"),
            sum(col("n_bytes")).as("total_bytes"),
            min(col("width")).as("min_width"),
            max(col("height")).as("max_height"),
            sum(col("n_frames")).as("total_frames"))
          .orderBy(col("format"))
      },
      None
    ),

    // ------------------------------------------------------------------
    // m02: the full media pipeline — resize to a fixed raster, sample
    // every 2nd frame, aggregate per format. Exercises payload-to-payload
    // chaining (resize) and row fan-out without shuffle (frame flatMap).
    GraftQuery(
      "m02_multimodal_resize_frames",
      "binary payload → stub resize(64x64) + every-2nd-frame sample → per-format frame stats",
      (spark, dir) => {
        val t = Tables(spark, dir)
        val media = fakeMediaTable(spark, t.documents)
        import spark.implicits._
        val resized = resize(media, 64, 64)
          .select(col("media_id"), col("width"), col("height"))
        val frames = sampleFrames(media, every = 2)
          .toDF()
          .groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_sampled"),
            sum(col("n_bytes")).as("sampled_bytes"))
        resized.join(frames, Seq("media_id"))
          .groupBy(col("width"), col("height"))
          .agg(count(lit(1)).as("n_media"),
            sum(col("n_sampled")).as("total_frames"),
            sum(col("sampled_bytes")).as("total_bytes"))
          .orderBy(col("width"), col("height"))
      },
      None
    )
  )
}
