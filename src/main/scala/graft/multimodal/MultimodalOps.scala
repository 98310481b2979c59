package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.GraftQuery

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in partition-level batches.
  *
  * The Spark-side contract — schema (binary payload + metadata),
  * partition-batched execution via `mapPartitions` on a typed Dataset
  * (the Scala analog of `mapInPandas` batches), and a downstream
  * relational stage over extracted features — is real and tested, and so
  * is the codec: [[MediaCodec]] decodes actual PNG stills and
  * multi-frame GIF animations with `javax.imageio` (ships in every JDK;
  * zero added dependencies). The test corpus is fabricated
  * deterministically as real encoded images ([[fakeMediaTable]]), since
  * the driver data contains no media. Payload bytes a JDK reader cannot
  * identify fall back to a clearly-marked byte-statistics stub
  * ([[MediaCodec.byteStatsFallback]]) — the slot where an ffmpeg-style
  * JNI binding would plug in for codecs outside the JDK (video, audio).
  *
  * Scale notes: payloads stay off the driver; decode is a narrow
  * per-partition transformation (no shuffle), so it scales with input
  * splits. For real media archives, pair with
  * `spark.sql.files.maxPartitionBytes` sized so a partition's decoded
  * batch fits executor memory, and use binaryFile / parquet-with-binary
  * sources.
  */
object MultimodalOps {

  /** One media row: opaque payload + metadata, as stored at rest. */
  final case class MediaRecord(media_id: Long, format: String, payload: Array[Byte])

  /** Extracted features (what the decoder emits per media row). */
  final case class MediaFeatures(
      media_id: Long,
      format: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      mean_byte: Double,
      pixel_digest: Long)

  /** Real JDK codec: PNG + animated GIF via `javax.imageio`, plus a
    * deterministic byte-stats fallback for payloads no installed reader
    * recognizes. Runs inside executor tasks — everything here must be
    * driver-free and thread-safe (ImageIO reader instances are created
    * per call; the readers themselves are not shared). */
  object MediaCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.{IIOImage, ImageIO}

    // In-memory streams only: ImageIO's default stream cache writes temp
    // files per decode — pure overhead for small in-heap payloads.
    ImageIO.setUseCache(false)

    private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')
    private val GifMagic = "GIF8".getBytes("US-ASCII")

    private def hasMagic(p: Array[Byte], m: Array[Byte]): Boolean =
      p.length >= m.length && java.util.Arrays.equals(p, 0, m.length, m, 0, m.length)

    def isPng(p: Array[Byte]): Boolean = hasMagic(p, PngMagic)
    def isGif(p: Array[Byte]): Boolean = hasMagic(p, GifMagic)

    /** Deterministic 8-bit gray value for a fabricated pixel. */
    def grayAt(mediaId: Long, x: Int, y: Int, frame: Int): Int =
      (((x * 31 + y * 17 + frame * 7).toLong + mediaId * 131) % 256).toInt

    private def frameImage(mediaId: Long, w: Int, h: Int, frame: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = grayAt(mediaId, x, y, frame)
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      img
    }

    /** Encode one real PNG still with the deterministic gray pattern. */
    def encodePng(mediaId: Long, w: Int, h: Int): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(frameImage(mediaId, w, h, frame = 0), "png", bos)
      bos.toByteArray
    }

    /** Encode one real multi-frame GIF animation (the JDK's GIF writer
      * supports sequences; this is the container's stand-in for video). */
    def encodeGif(mediaId: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        (0 until nFrames).foreach { f =>
          writer.writeToSequence(
            new IIOImage(frameImage(mediaId, w, h, f), null, null),
            writer.getDefaultWriteParam)
        }
        writer.endWriteSequence()
      } finally {
        writer.dispose()
        ios.close()
      }
      bos.toByteArray
    }

    /** Open a positioned ImageReader for the payload, or None if no
      * installed reader claims the format. */
    private def reader(p: Array[Byte]): Option[javax.imageio.ImageReader] = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(p))
      val it = ImageIO.getImageReaders(iis)
      if (it.hasNext) { val r = it.next(); r.setInput(iis); Some(r) }
      else { iis.close(); None }
    }

    /** Exact integer sum of the blue-channel bytes — the codec-drift
      * digest: any change in decode output (palette handling, color
      * model, frame selection) moves this integer, so the verify dump
      * catches drift across rounds even where no DuckDB oracle can
      * exist (VERDICT r7 #7). */
    def graySum(img: BufferedImage): Long = {
      val w = img.getWidth; val h = img.getHeight
      var sum = 0L; var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += img.getRGB(x, y) & 0xFF; x += 1 }
        y += 1
      }
      sum
    }

    /** Same digest for the non-decodable stub path: exact integer sum
      * of the payload bytes (unsigned). */
    def byteSum(p: Array[Byte]): Long = {
      var sum = 0L; var i = 0
      while (i < p.length) { sum += p(i) & 0xFF; i += 1 }
      sum
    }

    private def meanGray(img: BufferedImage): Double = {
      val w = img.getWidth; val h = img.getHeight
      if (w == 0 || h == 0) return 0.0
      graySum(img).toDouble / (w.toLong * h)
    }

    /** Documented stub path for codecs the JDK cannot read (real video/
      * audio needs an external binding): deterministic pure function of
      * the payload bytes so the pipeline stays runnable and testable. */
    def byteStatsFallback(r: MediaRecord): MediaFeatures = {
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
        mean_byte = if (n == 0) 0.0 else sum.toDouble / n,
        pixel_digest = sum)
    }

    /** Real decode: dimensions and frame count from the image container,
      * mean intensity from the first frame's decoded pixels. A payload
      * whose magic claims an image but whose bytes do not decode
      * (truncation, bit rot — routine in a 100 TB corpus) falls back to
      * byte statistics instead of failing the task: one corrupt file
      * must never kill a billion-row decode stage. */
    def decode(r: MediaRecord): MediaFeatures =
      reader(r.payload) match {
        case Some(rd) =>
          try {
            val first = rd.read(0)
            val frames =
              try rd.getNumImages(true)
              catch { case _: Throwable => 1 }
            MediaFeatures(r.media_id, r.format, r.payload.length.toLong,
              first.getWidth, first.getHeight, frames, meanGray(first),
              graySum(first))
          } catch {
            case _: Exception => byteStatsFallback(r)
          } finally rd.dispose()
        case None => byteStatsFallback(r)
      }

    /** [[decode]]'s STRICT twin for the quarantine path (m06): None when
      * the payload does not decode as a real image — wrong/zeroed magic
      * (no reader claims it), a container that opens but whose pixel
      * data is truncated/rotten (read(0) throws), OR a multi-frame
      * container whose frame directory cannot be walked
      * (getNumImages(true) throws: later frames truncated even though
      * frame 0 decoded). Unlike the lenient [[decode]] — which books
      * such a payload as 1 frame and moves on — strict means strict:
      * any codec-level failure is corruption and quarantines the row.
      * The caller decides policy; this function only guarantees the
      * task never dies on a poison payload. */
    def decodeStrict(r: MediaRecord): Option[MediaFeatures] =
      reader(r.payload) match {
        case Some(rd) =>
          try {
            val first = rd.read(0)
            val frames = rd.getNumImages(true)
            Some(MediaFeatures(r.media_id, r.format, r.payload.length.toLong,
              first.getWidth, first.getHeight, frames, meanGray(first),
              graySum(first)))
          } catch {
            case _: Exception => None
          } finally rd.dispose()
        case None => None
      }

    /** All frames of an animated payload (a still has one frame),
      * decoded to BufferedImages; empty for unrecognized OR corrupt
      * payloads (callers then take their byte-level fallback path). */
    def decodeFrames(p: Array[Byte]): Seq[BufferedImage] =
      reader(p) match {
        case Some(rd) =>
          try {
            val n = try rd.getNumImages(true) catch { case _: Throwable => 1 }
            (0 until n).map(rd.read)
          } catch {
            case _: Exception => Seq.empty
          } finally rd.dispose()
        case None => Seq.empty
      }

    /** Nearest-neighbor resample — an explicit pixel loop, not
      * Graphics2D, so the result is bit-deterministic across JVMs
      * (interpolation policy is pinned by this code, not by a
      * rendering-hint default). */
    def resizeImage(src: BufferedImage, w: Int, h: Int): BufferedImage = {
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val sw = src.getWidth; val sh = src.getHeight
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val sx = ((x.toLong * sw) / w).toInt
          val sy = ((y.toLong * sh) / h).toInt
          out.setRGB(x, y, src.getRGB(sx, sy))
          x += 1
        }
        y += 1
      }
      out
    }

    def encodeImagePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** 64-bit perceptual average-hash (aHash, public technique): 8×8
      * nearest-neighbor downsample → bit i = (gray > mean of the 64
      * samples). Every step is the deterministic pixel loop above, so
      * the hash is bit-stable across JVMs. Robust to re-encoding,
      * format conversion (GIF frame → PNG) and small pixel edits —
      * the image analog of SimHash for text. */
    def averageHash64(img: BufferedImage): Long = {
      val small = resizeImage(img, 8, 8)
      val g = new Array[Int](64)
      var sum = 0L
      var i = 0
      while (i < 64) {
        g(i) = small.getRGB(i % 8, i / 8) & 0xFF
        sum += g(i)
        i += 1
      }
      val mean = sum.toDouble / 64
      var bits = 0L
      i = 0
      while (i < 64) {
        if (g(i) > mean) bits |= (1L << i)
        i += 1
      }
      bits
    }
  }

  /** One audio row: opaque WAV payload, as stored at rest. */
  final case class AudioRecord(media_id: Long, payload: Array[Byte])

  /** Integer audio features extracted by [[WavCodec.decode]] — all exact
    * integer arithmetic so the m04 oracle can recompute them in SQL. */
  final case class AudioFeatures(
      media_id: Long,
      sample_rate: Int,
      n_samples: Long,
      sum_sq: Long,
      peak: Int,
      n_zero_cross: Long,
      sum_window_peak: Long)

  /** Pure-JVM PCM/WAV codec — the audio leg of the multimodal family.
    * The encoder writes a canonical 44-byte RIFF header + little-endian
    * int16 mono samples; the decoder parses the chunk structure
    * generically (it does not assume the canonical layout) and extracts
    * exact INTEGER features, so a single flipped byte anywhere in the
    * container or the sample data changes the output — the m04 oracle
    * therefore verifies the full encode→bytes→decode round trip, not
    * just the feature math. Everything here is executor-side and
    * allocation-light: one pass over the sample bytes per row. */
  object WavCodec {

    /** Deterministic int16 test waveform — a closed-form integer
      * function of (media_id, sample index), so the DuckDB oracle can
      * regenerate it with `generate_series` and plain modular
      * arithmetic. */
    def synthSample(mediaId: Long, i: Int): Int =
      (((mediaId * 7L + i.toLong * i.toLong) % 65536L) - 32768L).toInt

    def nSamples(mediaId: Long): Int = 500 + (mediaId % 1000L).toInt
    def sampleRate(mediaId: Long): Int = 8000 + (mediaId % 4L).toInt * 1000

    /** Samples per analysis window for [[AudioFeatures.sum_window_peak]]
      * (the audio analog of frame sampling: a bounded per-row fan-out). */
    val WindowSize = 256

    /** Encode one real mono 16-bit PCM WAV file. */
    def encodeWav(mediaId: Long): Array[Byte] = {
      val n = nSamples(mediaId)
      val rate = sampleRate(mediaId)
      val dataBytes = n * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort)            // PCM
        .putShort(1.toShort)            // mono
        .putInt(rate)
        .putInt(rate * 2)               // byte rate
        .putShort(2.toShort)            // block align
        .putShort(16.toShort)           // bits per sample
      buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
      var i = 0
      while (i < n) { buf.putShort(synthSample(mediaId, i).toShort); i += 1 }
      buf.array()
    }

    /** Parse the RIFF container and extract features in ONE pass over
      * the samples. Returns None for payloads that are not mono 16-bit
      * PCM WAV (truncated, bit-rotten, or foreign format) — one corrupt
      * file must never kill a billion-row decode stage. */
    def decode(r: AudioRecord): Option[AudioFeatures] = {
      val p = r.payload
      if (p.length < 12 ||
        new String(p, 0, 4, "US-ASCII") != "RIFF" ||
        new String(p, 8, 4, "US-ASCII") != "WAVE") return None
      val buf = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      // generic chunk walk: fmt and data may appear in any order, with
      // other chunks (LIST, fact, ...) interleaved
      var pos = 12
      var rate = -1; var channels = -1; var bits = -1
      var dataOff = -1; var dataLen = -1
      while (pos + 8 <= p.length && (rate < 0 || dataOff < 0)) {
        val id = new String(p, pos, 4, "US-ASCII")
        val len = buf.getInt(pos + 4)
        // Long arithmetic: a hostile/corrupt chunk length near
        // Int.MaxValue overflows `pos + 8 + len` to negative and slips
        // past an int-typed bound check into an out-of-bounds read
        if (len < 0 || pos.toLong + 8L + len.toLong > p.length) return None
        if (id == "fmt ") {
          if (len < 16) return None
          val fmt = buf.getShort(pos + 8).toInt
          channels = buf.getShort(pos + 10).toInt
          rate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22).toInt
          if (fmt != 1) return None // PCM only
        } else if (id == "data") { dataOff = pos + 8; dataLen = len }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (rate < 0 || dataOff < 0 || channels != 1 || bits != 16) return None
      val n = dataLen / 2
      var sumSq = 0L; var peak = 0; var zc = 0L
      var winPeak = 0; var sumWinPeak = 0L
      var prev = 0; var i = 0
      while (i < n) {
        val v = buf.getShort(dataOff + i * 2).toInt
        val a = math.abs(v)
        sumSq += v.toLong * v
        if (a > peak) peak = a
        if (i > 0 && prev < 0 && v >= 0) zc += 1
        if (a > winPeak) winPeak = a
        if (i % WindowSize == WindowSize - 1 || i == n - 1) {
          sumWinPeak += winPeak; winPeak = 0
        }
        prev = v
        i += 1
      }
      Some(AudioFeatures(r.media_id, rate, n.toLong, sumSq, peak, zc, sumWinPeak))
    }

    /** [[encodeWav]] with the WAVEFORM of `formulaId` and an extra
      * LIST/INFO metadata chunk between fmt and data — a
      * container-level re-encode: byte-different payload, bit-identical
      * decoded PCM. m05's planted duplicate class. The duplicate's own
      * media id lives only on its [[AudioRecord]]; the payload bytes
      * depend on `formulaId` alone (by design — two ids, one content). */
    def encodeWavWithMeta(formulaId: Long): Array[Byte] = {
      val n = nSamples(formulaId)
      val rate = sampleRate(formulaId)
      val meta = s"INFOgraft-reencode".getBytes("US-ASCII") // even length
      val dataBytes = n * 2
      val buf = java.nio.ByteBuffer
        .allocate(44 + 8 + meta.length + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII"))
        .putInt(36 + 8 + meta.length + dataBytes)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort).putShort(1.toShort)
        .putInt(rate).putInt(rate * 2)
        .putShort(2.toShort).putShort(16.toShort)
      buf.put("LIST".getBytes("US-ASCII")).putInt(meta.length).put(meta)
      buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
      var i = 0
      while (i < n) { buf.putShort(synthSample(formulaId, i).toShort); i += 1 }
      buf.array()
    }

    /** Decode to a content identity: two integer hash sums over the
      * DECODED samples (position-weighted value and value² sums — exact
      * BIGINT, order-fixed, SQL-replayable), plus the sample count.
      * Container bytes (chunk layout, metadata) do NOT contribute:
      * payloads that decode to the same PCM get the same identity. */
    def decodeContentHash(r: AudioRecord): Option[AudioContentHash] = {
      val p = r.payload
      if (p.length < 12 ||
        new String(p, 0, 4, "US-ASCII") != "RIFF" ||
        new String(p, 8, 4, "US-ASCII") != "WAVE") return None
      val buf = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var rate = -1; var channels = -1; var bits = -1
      var dataOff = -1; var dataLen = -1
      while (pos + 8 <= p.length && (rate < 0 || dataOff < 0)) {
        val id = new String(p, pos, 4, "US-ASCII")
        val len = buf.getInt(pos + 4)
        // Long arithmetic: a hostile/corrupt chunk length near
        // Int.MaxValue overflows `pos + 8 + len` to negative and slips
        // past an int-typed bound check into an out-of-bounds read
        if (len < 0 || pos.toLong + 8L + len.toLong > p.length) return None
        if (id == "fmt ") {
          if (len < 16) return None
          if (buf.getShort(pos + 8).toInt != 1) return None
          channels = buf.getShort(pos + 10).toInt
          rate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22).toInt
        } else if (id == "data") { dataOff = pos + 8; dataLen = len }
        pos += 8 + len + (len & 1)
      }
      if (rate < 0 || dataOff < 0 || channels != 1 || bits != 16) return None
      val n = dataLen / 2
      var h1 = 0L; var h2 = 0L; var i = 0
      while (i < n) {
        val u = (buf.getShort(dataOff + i * 2).toInt + 32768).toLong
        h1 += u * (i + 1)
        h2 += u * u * (i + 1)
        i += 1
      }
      Some(AudioContentHash(r.media_id, n.toLong, h1, h2))
    }
  }

  /** One decoded-content identity row (see WavCodec.decodeContentHash). */
  final case class AudioContentHash(media_id: Long, n_samples: Long,
      h1: Long, h2: Long)

  /** Fabricate the deterministic WAV corpus from `documents` (encoding
    * happens per-partition in executors; payload bytes never touch the
    * driver) — same convention as [[fakeMediaTable]]. */
  def fakeAudioTable(spark: SparkSession, docs: DataFrame): Dataset[AudioRecord] = {
    import spark.implicits._
    graft.ops.FanOut.ds(docs.select(col("doc_id").cast("long")).as[Long])
      .mapPartitions(_.map(id => AudioRecord(id, WavCodec.encodeWav(id))))
  }

  /** Partition-batched audio decode: bytes in, integer features out, no
    * shuffle; undecodable payloads are dropped (flatMap on the Option). */
  def decodeAudioFeatures(audio: Dataset[AudioRecord]): Dataset[AudioFeatures] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions(_.flatMap(WavCodec.decode))
  }

  /** Partition-batched decode: one iterator pass per partition (batch
    * shape), payload dropped from the output schema (column pruning for
    * the downstream relational stage). */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(MediaCodec.decode))
  }

  /** A media row after resizing: new dims + re-encoded payload. */
  final case class ResizedMedia(media_id: Long, format: String,
      width: Int, height: Int, payload: Array[Byte], pixel_digest: Long)

  /** Resize stage: per-partition batched, no shuffle, payload-in/
    * payload-out so downstream stages chain. Decodable payloads get a
    * REAL nearest-neighbor resample of the first frame re-encoded as
    * PNG; unrecognized payloads keep the deterministic byte-stride stub
    * (the external-codec slot). */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    media.mapPartitions(_.map { r =>
      MediaCodec.decodeFrames(r.payload).headOption match {
        case Some(img) =>
          val resized = MediaCodec.resizeImage(img, w, h)
          val out = MediaCodec.encodeImagePng(resized)
          ResizedMedia(r.media_id, "png", w, h, out,
            MediaCodec.graySum(resized))
        case None =>
          val n = r.payload.length
          val out = new Array[Byte](w * h)
          if (n > 0) {
            var i = 0
            while (i < out.length) {
              out(i) = r.payload(((i.toLong * n) / out.length).toInt)
              i += 1
            }
          }
          ResizedMedia(r.media_id, r.format, w, h, out,
            MediaCodec.byteSum(out))
      }
    })
  }

  /** One sampled frame of an animated payload. `pixel_digest` is the
    * exact integer gray-sum of the DECODED frame (byte-sum of the slice
    * on the fallback path) — unlike `n_bytes` (PNG-encoder-dependent) it
    * is a pure function of the pixel formula, which is what lets m02
    * carry a full DuckDB oracle over the frame-sampling leg. */
  final case class Frame(media_id: Long, frame_idx: Int, n_bytes: Long,
      payload: Array[Byte], pixel_digest: Long)

  /** Frame sampling: every `every`-th REAL frame of each decodable
    * payload (GIF animations fan out to their actual frames, re-encoded
    * as PNG stills; a PNG still is its own single frame) — a flatMap,
    * so one media row fans out to many frame rows with NO shuffle.
    * Unrecognized payloads keep the byte-partition stub. */
  def sampleFrames(media: Dataset[MediaRecord], every: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    require(every > 0, s"sampling stride must be positive, got $every")
    media.mapPartitions(_.flatMap { r =>
      val frames = MediaCodec.decodeFrames(r.payload)
      if (frames.nonEmpty) {
        (0 until frames.length by every).iterator.map { f =>
          val bytes = MediaCodec.encodeImagePng(frames(f))
          Frame(r.media_id, f, bytes.length.toLong, bytes,
            MediaCodec.graySum(frames(f)))
        }
      } else {
        val nFrames = MediaCodec.byteStatsFallback(r).n_frames
        val n = r.payload.length
        (0 until nFrames by every).iterator.map { f =>
          val from = (f.toLong * n / nFrames).toInt
          val until = ((f + 1).toLong * n / nFrames).toInt
          val bytes = java.util.Arrays.copyOfRange(r.payload, from, until)
          Frame(r.media_id, f, bytes.length.toLong, bytes,
            MediaCodec.byteSum(bytes))
        }
      }
    })
  }

  /** Fabricate a deterministic REAL media corpus from `documents` (the
    * driver data ships no media): every 4th doc becomes a multi-frame
    * GIF animation (2–8 frames), the rest PNG stills, dims varying with
    * doc_id. Encoding happens per-partition in executors — the payload
    * bytes never touch the driver. */
  def fakeMediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    // per-row image ENCODE is ~1000× the input row's bytes: rebalance
    // the id list first so the codec stage uses every core, not the
    // scan's input-split count (see graft.ops.FanOut)
    graft.ops.FanOut.ds(docs.select(col("doc_id").cast("long")).as[Long])
      .mapPartitions(_.map { id =>
        val w = 8 + (id % 25).toInt
        val h = 8 + ((id * 3) % 17).toInt
        if (id % 4 == 3)
          MediaRecord(id, "gif", MediaCodec.encodeGif(id, w, h, nFrames = 2 + (id % 7).toInt))
        else
          MediaRecord(id, "png", MediaCodec.encodePng(id, w, h))
      })
  }

  val all: Seq[GraftQuery] = Seq(
    // ------------------------------------------------------------------
    // m01: binary ingest → partition-batched REAL decode (javax.imageio)
    // → relational aggregation over extracted features. FULL oracle via
    // the m04 closed-form-input technique ported to images: the corpus
    // pixels are a closed-form f(id, x, y, frame), PNG is lossless, and
    // the JDK GIF writer palettes the ≤256-gray pattern exactly
    // (MultimodalSpec pins round-trip pixel fidelity for both codecs) —
    // so decode(encode(f)) == f and DuckDB recomputes every aggregate
    // (dims, frame counts, the exact pixel gray-sum digest) from the
    // formula while Spark round-trips the real codecs. Any encoder,
    // parser, frame-selection, or palette defect breaks the hash match.
    // The one encoder-DEPENDENT scalar (compressed payload bytes) is
    // deliberately not part of the output: it would pin the oracle to a
    // specific PNG/GIF encoder implementation rather than to the decoded
    // content.
    GraftQuery(
      "m01_multimodal_features",
      "binary payload → imageio decode (mapPartitions batches) → per-format feature aggregates",
      (spark, dir) => {
        val t = Tables(spark, dir)
        decodeFeatures(fakeMediaTable(spark, t.documents))
          .toDF()
          .groupBy(col("format"))
          .agg(
            count(lit(1)).as("n_media"),
            sum(col("width").cast("long") * col("height") * col("n_frames"))
              .as("total_pixels"),
            min(col("width")).as("min_width"),
            max(col("height")).as("max_height"),
            sum(col("n_frames").cast("long")).as("total_frames"),
            // exact integer sum of decoded first-frame pixel bytes —
            // formerly the rows-only codec-drift canary, now the
            // oracle-checked heart of the entry
            sum(col("pixel_digest")).as("pixel_digest"))
          .orderBy(col("format"))
      },
      Some(
        """WITH m AS (
          |  SELECT doc_id AS id,
          |         CASE WHEN doc_id % 4 = 3 THEN 'gif' ELSE 'png' END AS format,
          |         8 + doc_id % 25 AS w,
          |         8 + (doc_id * 3) % 17 AS h,
          |         CASE WHEN doc_id % 4 = 3 THEN 2 + doc_id % 7 ELSE 1 END AS nf
          |  FROM documents),
          |px AS (
          |  -- first-frame gray-sum from the closed-form pixel formula;
          |  -- constant series bounds + filter (w <= 32, h <= 24 by
          |  -- construction): the m04 generate_series convention
          |  SELECT id, sum((x.x * 31 + y.y * 17 + id * 131) % 256) AS digest
          |  FROM m, generate_series(0, 31) AS x(x), generate_series(0, 23) AS y(y)
          |  WHERE x.x < w AND y.y < h
          |  GROUP BY id)
          |SELECT m.format AS format,
          |       CAST(count(*) AS BIGINT) AS n_media,
          |       CAST(sum(m.w * m.h * m.nf) AS BIGINT) AS total_pixels,
          |       CAST(min(m.w) AS INT) AS min_width,
          |       CAST(max(m.h) AS INT) AS max_height,
          |       CAST(sum(m.nf) AS BIGINT) AS total_frames,
          |       CAST(sum(px.digest) AS BIGINT) AS pixel_digest
          |FROM m JOIN px ON m.id = px.id
          |GROUP BY m.format
          |ORDER BY format""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // m02: the full media pipeline — resize to a fixed raster, sample
    // every 2nd frame, aggregate per format. Exercises payload-to-payload
    // chaining (resize) and row fan-out without shuffle (frame flatMap).
    // FULL oracle (the m01/m04 closed-form technique): the deterministic
    // nearest-neighbor resample (sx = ⌊x·w/64⌋) and the every-2nd-frame
    // selection are both pure integer functions of (id, x, y, f), so
    // DuckDB replays the resized-raster digest AND the per-frame decoded
    // digests straight from the pixel formula while Spark round-trips
    // the real codecs. Per-frame PNG re-encode byte sizes stay out of
    // the output (encoder-implementation-dependent; see m01).
    GraftQuery(
      "m02_multimodal_resize_frames",
      "binary payload → imageio resize(64x64) + every-2nd-frame sample → per-raster frame stats",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // both legs (resize + frame sampling) read the encoded corpus:
        // persist it once so the encode pass is not run per leg
        val media = graft.InternalCaches.track(
          fakeMediaTable(spark, t.documents)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val resized = resize(media, 64, 64)
          .select(col("media_id"), col("width"), col("height"),
            col("pixel_digest"))
        val frames = sampleFrames(media, every = 2)
          .toDF()
          .groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_sampled"),
            sum(col("pixel_digest")).as("frame_digest_part"))
        resized.join(frames, Seq("media_id"))
          .groupBy(col("width"), col("height"))
          .agg(count(lit(1)).as("n_media"),
            sum(col("n_sampled")).as("total_frames"),
            // decoded-pixel digest of every SAMPLED frame at source dims
            sum(col("frame_digest_part")).as("frame_digest"),
            // resized-raster digest at the 64x64 target
            sum(col("pixel_digest")).as("pixel_digest"))
          .orderBy(col("width"), col("height"))
      },
      Some(
        """WITH m AS (
          |  SELECT doc_id AS id,
          |         8 + doc_id % 25 AS w,
          |         8 + (doc_id * 3) % 17 AS h,
          |         CASE WHEN doc_id % 4 = 3 THEN 2 + doc_id % 7 ELSE 1 END AS nf
          |  FROM documents),
          |rz AS (
          |  -- 64x64 nearest-neighbor resample of frame 0, digested from
          |  -- the formula: source pixel of (x,y) is (x*w//64, y*h//64)
          |  SELECT id, sum((((x.x * w) // 64) * 31 + ((y.y * h) // 64) * 17
          |                  + id * 131) % 256) AS rdigest
          |  FROM m, generate_series(0, 63) AS x(x), generate_series(0, 63) AS y(y)
          |  GROUP BY id),
          |fr AS (
          |  -- decoded digest of every 2nd frame at source dims
          |  -- (f < nf <= 8, w <= 32, h <= 24: constant series + filter)
          |  SELECT id, sum((x.x * 31 + y.y * 17 + f.f * 7 + id * 131) % 256)
          |           AS fdigest
          |  FROM m, generate_series(0, 7) AS f(f),
          |       generate_series(0, 31) AS x(x), generate_series(0, 23) AS y(y)
          |  WHERE f.f < nf AND f.f % 2 = 0 AND x.x < w AND y.y < h
          |  GROUP BY id)
          |SELECT CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
          |       CAST(count(*) AS BIGINT) AS n_media,
          |       CAST(sum((m.nf + 1) // 2) AS BIGINT) AS total_frames,
          |       CAST(sum(fr.fdigest) AS BIGINT) AS frame_digest,
          |       CAST(sum(rz.rdigest) AS BIGINT) AS pixel_digest
          |FROM m JOIN rz ON m.id = rz.id JOIN fr ON m.id = fr.id
          |GROUP BY 1, 2
          |ORDER BY width, height""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // m03: image near-dup dedup — the multimodal face of the dedup
    // family. Perceptual average-hash per payload (8×8 downsample →
    // mean-threshold bits: re-encode/format/minor-edit robust), then
    // the SAME 4×16-bit block LSH + exact-Hamming plan d04 uses for
    // text SimHash: one long per image into the shuffle, candidates by
    // block equi-join, exhaustive for Hamming ≤ 3. The corpus plants
    // near-dups: each image re-materialized with two pixels edited and
    // (for GIF animations) the first frame converted to PNG — the
    // watermark/format-shift duplicates a real crawl contains. FULL
    // oracle (m01's closed-form technique): every step of the hash —
    // the codec round trip, the two-pixel perturbation, the 8×8
    // nearest-neighbor downsample, the strict mean threshold (g > mean
    // ⇔ 64·g > Σg, exact in integers) — is a pure function of the
    // pixel formula, so DuckDB recomputes both signatures and finds the
    // pairs by BRUTE-FORCE all-pairs (a deliberately different
    // algorithm: the engine's banded LSH must surface exactly the pairs
    // the exhaustive scan finds, or the hash-compare breaks).
    // MultimodalSpec additionally pins recall and zero false positives.
    GraftQuery(
      "m03_dedup_images_phash",
      "perceptual-hash (aHash) image near-dup pairs via 16-bit-block LSH (fully oracled)",
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        val media = fakeMediaTable(spark, t.documents)
        // planted near-dups: decode, normalize to TYPE_INT_RGB (an
        // identity-size resample — GIF frames decode INDEXED, and a PNG
        // round trip of an indexed image is not pixel-faithful), flip
        // two pixels, re-encode as PNG
        val perturbed = media.mapPartitions(_.flatMap { r =>
          MediaCodec.decodeFrames(r.payload).headOption.map { img0 =>
            val img = MediaCodec.resizeImage(img0, img0.getWidth, img0.getHeight)
            val w = img.getWidth; val h = img.getHeight
            img.setRGB(0, 0, 0xFFFFFF)
            img.setRGB(w - 1, h - 1, 0x000000)
            MediaRecord(r.media_id + 100000L, "png", MediaCodec.encodeImagePng(img))
          }
        })
        // persist the tiny (id, 64-bit sig) table: hamming64Pairs
        // self-joins it, and without the barrier each side would re-run
        // the whole encode → perturb → decode → hash lineage
        val sigs = graft.InternalCaches.track(
          media.union(perturbed).mapPartitions(_.flatMap { r =>
            MediaCodec.decodeFrames(r.payload).headOption.map(img =>
              (r.media_id, MediaCodec.averageHash64(img)))
          }).toDF("media_id", "sig")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        graft.dedup.DedupOps.hamming64Pairs(sigs, "media_id", "sig", maxHamming = 3)
      },
      Some(
        """WITH m AS (
          |  SELECT doc_id AS id,
          |         8 + doc_id % 25 AS w,
          |         8 + (doc_id * 3) % 17 AS h
          |  FROM documents),
          |-- variant 0 = original payload's frame 0; variant 1 = the
          |-- two-pixel-edited re-encode (media_id + 100000)
          |samp AS (
          |  SELECT m.id, v.v AS variant, x.x AS x, y.y AS y, m.w, m.h,
          |         (x.x * m.w) // 8 AS sx, (y.y * m.h) // 8 AS sy
          |  FROM m, generate_series(0, 7) AS x(x), generate_series(0, 7) AS y(y),
          |       (VALUES (0), (1)) v(v)),
          |g AS (
          |  SELECT id, variant, x, y,
          |         CASE WHEN variant = 1 AND sx = 0 AND sy = 0 THEN 255
          |              WHEN variant = 1 AND sx = w - 1 AND sy = h - 1 THEN 0
          |              ELSE (sx * 31 + sy * 17 + id * 131) % 256 END AS gv
          |  FROM samp),
          |mean AS (
          |  SELECT id, variant, sum(gv) AS s FROM g GROUP BY 1, 2),
          |sig AS (
          |  SELECT CASE WHEN g.variant = 1 THEN g.id + 100000 ELSE g.id END
          |           AS media_id,
          |         bit_or(CASE WHEN gv * 64 > s
          |                     THEN 1::UBIGINT << CAST(y * 8 + x AS INT)
          |                     ELSE 0::UBIGINT END) AS sig
          |  FROM g JOIN mean USING (id, variant)
          |  GROUP BY 1)
          |SELECT a.media_id AS doc_a, b.media_id AS doc_b,
          |       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
          |FROM sig a JOIN sig b ON a.media_id < b.media_id
          |WHERE bit_count(xor(a.sig, b.sig)) <= 3
          |ORDER BY doc_a, doc_b""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // m04: the audio leg, under a FULL oracle — the first oracled
    // multimodal query. Spark synthesizes real RIFF/PCM WAV payloads
    // per-partition, then a separate decode stage parses the container
    // generically and extracts exact integer features in one pass over
    // the sample bytes. Because the waveform is a closed-form integer
    // function of (media_id, i), DuckDB regenerates it with
    // generate_series and recomputes the same integers — any encode,
    // parse, or feature-math defect breaks the hash match.
    GraftQuery(
      "m04_multimodal_audio_features",
      "binary WAV payload → RIFF parse + one-pass integer features (sum_sq/peak/zero-cross/window peaks)",
      (spark, dir) => {
        val t = Tables(spark, dir)
        decodeAudioFeatures(fakeAudioTable(spark, t.documents))
          .toDF()
          .orderBy(col("media_id"))
      },
      Some(
        """WITH m AS (
          |  SELECT doc_id AS media_id,
          |         500 + doc_id % 1000 AS n,
          |         CAST(8000 + (doc_id % 4) * 1000 AS INT) AS sample_rate
          |  FROM documents),
          |s AS (
          |  -- constant-bound series + filter: DuckDB's generate_series
          |  -- cannot take a lateral column bound; n < 1500 by construction
          |  SELECT media_id, n, i,
          |         ((media_id * 7 + i * i) % 65536) - 32768 AS v
          |  FROM m, generate_series(0, 1499) AS g(i)
          |  WHERE i < n),
          |sl AS (
          |  SELECT *, lag(v) OVER (PARTITION BY media_id ORDER BY i) AS pv FROM s),
          |agg AS (
          |  SELECT media_id,
          |         CAST(sum(v * v) AS BIGINT) AS sum_sq,
          |         CAST(max(abs(v)) AS INT) AS peak,
          |         CAST(count(*) FILTER (WHERE pv < 0 AND v >= 0) AS BIGINT)
          |           AS n_zero_cross
          |  FROM sl GROUP BY media_id),
          |w AS (
          |  SELECT media_id, i // 256 AS win, max(abs(v)) AS wp
          |  FROM s GROUP BY 1, 2),
          |ws AS (
          |  SELECT media_id, CAST(sum(wp) AS BIGINT) AS sum_window_peak
          |  FROM w GROUP BY 1)
          |SELECT m.media_id AS media_id, m.sample_rate AS sample_rate,
          |       CAST(m.n AS BIGINT) AS n_samples,
          |       a.sum_sq AS sum_sq, a.peak AS peak,
          |       a.n_zero_cross AS n_zero_cross,
          |       ws.sum_window_peak AS sum_window_peak
          |FROM m JOIN agg a USING (media_id) JOIN ws USING (media_id)
          |ORDER BY media_id""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // m05: container-invariant audio dedup — the multimodal analog of
    // d01's normalize-then-hash: a re-encoded file (different chunk
    // layout, added metadata, different bytes) whose DECODED PCM is
    // bit-identical to another IS a duplicate, and a byte-level
    // fingerprint structurally misses it. The corpus plants exactly
    // that class: every WAV ∪ a LIST-chunk re-encode of it (payload
    // md5 differs; samples identical). Identity = (n_samples, h1, h2)
    // over the decoded samples — two position-weighted exact BIGINT
    // sums computed in the same one-pass RIFF walk as m04, so the
    // whole operator replays in DuckDB from the closed-form waveform
    // (the m04 convention — this is the SECOND fully-oracled
    // multimodal entry). One shuffle on the identity key; decode is
    // partition-batched mapPartitions, no payload ever shuffles.
    GraftQuery(
      "m05_dedup_audio_content",
      "container-invariant exact audio dedup: decoded-PCM identity groups (planted re-encodes)",
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        val ids = graft.ops.FanOut.ds(
          t.documents.select(col("doc_id").cast("long")).as[Long])
        val corpus = ids.mapPartitions(_.flatMap(id => Iterator(
          AudioRecord(id, WavCodec.encodeWav(id)),
          AudioRecord(id + 100000L, WavCodec.encodeWavWithMeta(id)))))
        corpus.mapPartitions(_.flatMap(WavCodec.decodeContentHash))
          .toDF()
          .groupBy(col("n_samples"), col("h1"), col("h2"))
          .agg(min(col("media_id")).as("canonical_id"),
            count(lit(1)).as("dup_cnt"))
          .select(col("canonical_id"), col("dup_cnt"),
            col("n_samples"), col("h1"), col("h2"))
          .orderBy(col("canonical_id"))
      },
      Some(
        """WITH m AS (SELECT doc_id AS fid FROM documents),
          |ids AS (
          |  SELECT fid, fid AS media_id FROM m
          |  UNION ALL
          |  SELECT fid, fid + 100000 AS media_id FROM m),
          |s AS (
          |  SELECT media_id, fid, i,
          |         ((fid * 7 + i * i) % 65536) - 32768 AS v
          |  FROM ids, generate_series(0, 1499) AS g(i)
          |  WHERE i < 500 + fid % 1000),
          |h AS (
          |  SELECT media_id,
          |         CAST(count(*) AS BIGINT) AS n_samples,
          |         CAST(sum((v + 32768) * (i + 1)) AS BIGINT) AS h1,
          |         CAST(sum((v + 32768) * (v + 32768) * (i + 1)) AS BIGINT) AS h2
          |  FROM s GROUP BY media_id)
          |SELECT min(media_id) AS canonical_id,
          |       CAST(count(*) AS BIGINT) AS dup_cnt, n_samples, h1, h2
          |FROM h
          |GROUP BY n_samples, h1, h2
          |ORDER BY canonical_id""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // m06: corrupt-payload QUARANTINE — the production reality m01–m05
    // idealize away: at 100 TB some payloads are truncated mid-transfer
    // and some have rotten headers, and ONE poison payload must neither
    // kill the decode stage nor silently contaminate the features. The
    // corpus here plants both failure classes deterministically:
    // id % 9 == 4 → payload truncated to its first 10 bytes (magic
    // intact, a reader claims it, pixel read throws — the mid-transfer
    // class), id % 9 == 7 → first byte zeroed (no reader claims it —
    // the rotten-header class). [[MediaCodec.decodeStrict]] maps each
    // row to Some(features)/None inside the same mapPartitions batch;
    // healthy rows aggregate their closed-form pixel digests, corrupt
    // rows only COUNT (their byte content is encoder-specific, so any
    // value derived from it would pin the oracle to an encoder — the
    // m01 payload-bytes exclusion, applied to the quarantine side).
    //
    // The oracle knows the corrupt set in closed form and replays the
    // healthy digests from the pixel formula: a quarantine that drops a
    // healthy row, passes a corrupt one, or fails the task at all
    // breaks the hash. Scale shape: unchanged from m01 — payloads never
    // shuffle; the only exchange carries (format, ok, digest) scalars.
    GraftQuery(
      "m06_multimodal_quarantine",
      "poison-payload quarantine: planted truncation + header rot, per-format ok/quarantined split",
      (spark, dir) => {
        import spark.implicits._
        val media = fakeMediaTable(spark, Tables(spark, dir).documents)
        val feats = media
          .map { r =>
            if (r.media_id % 9 == 4) r.copy(payload = r.payload.take(10))
            else if (r.media_id % 9 == 7) {
              val p = r.payload.clone(); p(0) = 0; r.copy(payload = p)
            } else r
          }
          .mapPartitions(_.map { r =>
            MediaCodec.decodeStrict(r) match {
              case Some(f) => (r.media_id, r.format, true, f.n_frames.toLong,
                f.pixel_digest)
              case None => (r.media_id, r.format, false, 0L, 0L)
            }
          })
          .toDF("media_id", "format", "ok", "n_frames", "pixel_digest")
        feats.groupBy(col("format"))
          .agg(count(lit(1)).as("n_media"),
            sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
            sum(when(col("ok"), 0L).otherwise(1L)).as("n_quarantined"),
            sum(when(col("ok"), col("n_frames")).otherwise(0L)).as("ok_frames"),
            sum(when(col("ok"), col("pixel_digest")).otherwise(0L))
              .as("ok_pixel_digest"))
          .orderBy(col("format"))
      },
      Some(
        """WITH m AS (
          |  SELECT doc_id AS id,
          |         CASE WHEN doc_id % 4 = 3 THEN 'gif' ELSE 'png' END AS format,
          |         8 + doc_id % 25 AS w,
          |         8 + (doc_id * 3) % 17 AS h,
          |         CASE WHEN doc_id % 4 = 3 THEN 2 + doc_id % 7 ELSE 1 END AS nf,
          |         (doc_id % 9) IN (4, 7) AS corrupt
          |  FROM documents),
          |px AS (
          |  SELECT id, sum((x.x * 31 + y.y * 17 + id * 131) % 256) AS digest
          |  FROM m, generate_series(0, 31) AS x(x), generate_series(0, 23) AS y(y)
          |  WHERE x.x < w AND y.y < h AND NOT corrupt
          |  GROUP BY id)
          |SELECT m.format AS format,
          |       CAST(count(*) AS BIGINT) AS n_media,
          |       CAST(sum(CASE WHEN corrupt THEN 0 ELSE 1 END) AS BIGINT) AS n_ok,
          |       CAST(sum(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT)
          |         AS n_quarantined,
          |       CAST(sum(CASE WHEN corrupt THEN 0 ELSE m.nf END) AS BIGINT)
          |         AS ok_frames,
          |       CAST(sum(coalesce(px.digest, 0)) AS BIGINT) AS ok_pixel_digest
          |FROM m LEFT JOIN px ON m.id = px.id
          |GROUP BY m.format
          |ORDER BY format""".stripMargin)
    )
  )
}
