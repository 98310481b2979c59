package graft

import graft.multimodal.MultimodalOps
import graft.multimodal.MultimodalOps.{MediaCodec, MediaRecord}

/** Multimodal tests: REAL imageio codec (PNG stills, multi-frame GIF),
  * batch decode via mapPartitions, the byte-stats fallback for unknown
  * codecs, and the downstream relational stage. */
class MultimodalSpec extends SparkSpecBase {

  test("PNG round-trip: decode reports real dimensions and exact pixel mean") {
    val payload = MediaCodec.encodePng(mediaId = 7L, w = 12, h = 9)
    assert(MediaCodec.isPng(payload))
    val f = MediaCodec.decode(MediaRecord(7L, "png", payload))
    assert(f.width === 12)
    assert(f.height === 9)
    assert(f.n_frames === 1)
    assert(f.n_bytes === payload.length.toLong)
    // PNG is lossless: the decoded mean must equal the generator's mean
    val grays = for (y <- 0 until 9; x <- 0 until 12)
      yield MediaCodec.grayAt(7L, x, y, 0)
    assert(math.abs(f.mean_byte - grays.sum.toDouble / grays.size) < 1e-12)
    // determinism
    assert(f === MediaCodec.decode(MediaRecord(7L, "png", payload)))
  }

  test("GIF round-trip: decode reports real dimensions and frame count") {
    val payload = MediaCodec.encodeGif(mediaId = 5L, w = 10, h = 8, nFrames = 4)
    assert(MediaCodec.isGif(payload))
    val f = MediaCodec.decode(MediaRecord(5L, "gif", payload))
    assert(f.width === 10)
    assert(f.height === 8)
    assert(f.n_frames === 4)
    assert(MediaCodec.decodeFrames(payload).length === 4)
  }

  test("GIF round-trip is pixel-EXACT over the full corpus dim envelope (m01–m03 oracle precondition)") {
    // The m01/m02/m03 DuckDB oracles recompute pixel digests and aHash
    // signatures from the closed-form gray formula, which is only valid
    // if decode(encode(f)) == f for BOTH codecs. PNG is lossless by
    // spec; the JDK GIF round trip must reproduce the ≤256-gray pattern
    // exactly. CAVEAT this sweep exists to pin: the JDK GIF path
    // row-shifts images with h < 8 (interlace pass handling), so
    // exactness is asserted for the CORPUS contract — fakeMediaTable
    // only ever emits w ∈ [8,32], h ∈ [8,24] — swept here exhaustively
    // (every (w,h) in the envelope, 2 frames each, every pixel).
    for (w <- 8 to 32; h <- 8 to 24) {
      val id = (w * 31 + h).toLong // vary the pattern with the dims
      val frames = MediaCodec.decodeFrames(MediaCodec.encodeGif(id, w, h, 2))
      assert(frames.length === 2, s"${w}x$h frame count")
      for (f <- 0 until 2; y <- 0 until h; x <- 0 until w)
        assert((frames(f).getRGB(x, y) & 0xFF) === MediaCodec.grayAt(id, x, y, f),
          s"GIF decode drift at ${w}x$h frame $f pixel ($x,$y)")
    }
    // and the corpus frame-count range round-trips at a fixed dim
    for (nF <- 2 to 8) {
      val frames = MediaCodec.decodeFrames(MediaCodec.encodeGif(11L, 9, 8, nF))
      assert(frames.length === nF, s"nFrames=$nF")
      for (f <- 0 until nF; y <- 0 until 8; x <- 0 until 9)
        assert((frames(f).getRGB(x, y) & 0xFF) === MediaCodec.grayAt(11L, x, y, f),
          s"GIF decode drift at 9x8 nF=$nF frame $f pixel ($x,$y)")
    }
  }

  test("sampled frames carry the exact decoded-pixel digest") {
    import testImplicits._
    val gif = Seq(MediaRecord(3L, "gif", MediaCodec.encodeGif(3L, 9, 8, nFrames = 3))).toDS()
    val frames = MultimodalOps.sampleFrames(gif, every = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2))
    frames.foreach { fr =>
      val expected = (for (y <- 0 until 8; x <- 0 until 9)
        yield MediaCodec.grayAt(3L, x, y, fr.frame_idx).toLong).sum
      assert(fr.pixel_digest === expected, s"frame ${fr.frame_idx} digest")
    }
  }

  test("unknown payloads take the documented byte-stats fallback") {
    val payload = "ab".getBytes("UTF-8")
    val f = MediaCodec.decode(MediaRecord(7L, "bin", payload))
    assert(f === MediaCodec.byteStatsFallback(MediaRecord(7L, "bin", payload)))
    assert(f.n_bytes === 2L)
    assert(f.mean_byte === (97 + 98) / 2.0)
  }

  test("corrupt image payloads fall back instead of failing the task") {
    // PNG magic intact, body truncated: the reader claims it, read() throws
    val truncated = MediaCodec.encodePng(9L, 16, 16).take(20).toArray
    assert(MediaCodec.isPng(truncated))
    val f = MediaCodec.decode(MediaRecord(9L, "png", truncated))
    assert(f === MediaCodec.byteStatsFallback(MediaRecord(9L, "png", truncated)))
    assert(MediaCodec.decodeFrames(truncated).isEmpty)
    // and the batched pipeline survives a corrupt row mid-partition
    import testImplicits._
    val media = Seq(
      MediaRecord(1L, "png", MediaCodec.encodePng(1L, 8, 8)),
      MediaRecord(2L, "png", truncated)).toDS()
    assert(MultimodalOps.decodeFeatures(media).count() === 2L)
    assert(MultimodalOps.resize(media, 4, 4).count() === 2L)
  }

  test("decode pipeline preserves row count and drops payloads") {
    import testImplicits._
    val media = Seq(
      MediaRecord(1L, "png", MediaCodec.encodePng(1L, 8, 8)),
      MediaRecord(2L, "bin", Array.emptyByteArray)).toDS()
    val feats = MultimodalOps.decodeFeatures(media).collect().sortBy(_.media_id)
    assert(feats.length === 2)
    assert(feats(0).width === 8 && feats(0).height === 8)
    assert(feats(1).n_bytes === 0L && feats(1).mean_byte === 0.0)
    assert(!MultimodalOps.decodeFeatures(media).columns.contains("payload"))
  }

  test("m01 catalog query aggregates features per format") {
    val r = graft.queries.Catalog.queries("m01_multimodal_features")(spark, sf0001)
      .collect()
    // corpus fabrication: every 4th doc (id % 4 == 3) is a GIF animation
    assert(r.map(_.getAs[String]("format")).toSeq === Seq("gif", "png"))
    val byFmt = r.map(x => x.getAs[String]("format") -> x).toMap
    assert(byFmt("gif").getAs[Long]("n_media") === 125L)
    assert(byFmt("png").getAs[Long]("n_media") === 375L)
    assert(byFmt("png").getAs[Long]("total_frames") === 375L) // stills: 1 each
    assert(byFmt("gif").getAs[Long]("total_frames") > 2L * 125L) // 2..8 each
  }

  test("resize really resamples: output decodes at target dims with source pixels") {
    import testImplicits._
    val media = Seq(MediaRecord(1L, "png", MediaCodec.encodePng(1L, 8, 8))).toDS()
    val out = MultimodalOps.resize(media, 4, 4).collect().head
    assert(out.width === 4 && out.height === 4)
    val img = MediaCodec.decodeFrames(out.payload).head
    assert(img.getWidth === 4 && img.getHeight === 4)
    // nearest-neighbor with a 2x downscale picks source pixel (2x, 2y)
    for (y <- 0 until 4; x <- 0 until 4) {
      val expected = MediaCodec.grayAt(1L, 2 * x, 2 * y, 0)
      assert((img.getRGB(x, y) & 0xFF) === expected,
        s"pixel ($x,$y) should be source (${2 * x},${2 * y})")
    }
    // unknown payloads keep the byte-stride stub (w*h raw bytes)
    val stub = Seq(MediaRecord(2L, "bin", "abcdefgh".getBytes("UTF-8"))).toDS()
    val so = MultimodalOps.resize(stub, 4, 2).collect().head
    assert(so.payload.length === 8)
    assert(new String(so.payload, "UTF-8") === "abcdefgh")
  }

  test("frame sampling extracts real GIF frames; stills are one frame") {
    import testImplicits._
    val gif = Seq(MediaRecord(1L, "gif", MediaCodec.encodeGif(1L, 6, 6, nFrames = 5))).toDS()
    val frames = MultimodalOps.sampleFrames(gif, every = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2, 4))
    // each sampled frame is a decodable PNG still at the source dims
    frames.foreach { fr =>
      val img = MediaCodec.decodeFrames(fr.payload).head
      assert(img.getWidth === 6 && img.getHeight === 6)
    }
    val png = Seq(MediaRecord(2L, "png", MediaCodec.encodePng(2L, 6, 6))).toDS()
    assert(MultimodalOps.sampleFrames(png, every = 1).collect().length === 1)
    // unknown payloads keep the byte-partition stub: 6 bytes -> 7 fake
    // frames, every=1 reassembles the payload exactly
    val stub = Seq(MediaRecord(3L, "bin", "abcdef".getBytes("UTF-8"))).toDS()
    val all = MultimodalOps.sampleFrames(stub, every = 1)
      .collect().sortBy(_.frame_idx)
    assert(all.length === 7)
    assert(new String(all.flatMap(_.payload), "UTF-8") === "abcdef")
  }

  test("m02 catalog query chains resize + frame sampling") {
    val r = graft.queries.Catalog.queries("m02_multimodal_resize_frames")(spark, sf0001)
      .collect()
    assert(r.length === 1) // single (64, 64) raster group
    assert(r(0).getAs[Long]("n_media") === 500L)
    assert(r(0).getAs[Long]("total_frames") > 0L)
  }

  test("average hash: stable across re-encode, flips few bits on minor edits") {
    val png = MultimodalOps.MediaCodec.encodePng(42L, 20, 15)
    val img = MultimodalOps.MediaCodec.decodeFrames(png).head
    val h1 = MultimodalOps.MediaCodec.averageHash64(img)
    // re-encode round trip is hash-identical (PNG is lossless)
    val img2 = MultimodalOps.MediaCodec.decodeFrames(
      MultimodalOps.MediaCodec.encodeImagePng(img)).head
    assert(MultimodalOps.MediaCodec.averageHash64(img2) === h1)
    // a two-pixel edit stays within a small Hamming distance
    img.setRGB(0, 0, 0xFFFFFF)
    img.setRGB(19, 14, 0x000000)
    val h3 = MultimodalOps.MediaCodec.averageHash64(img)
    assert(java.lang.Long.bitCount(h1 ^ h3) <= 6,
      s"2-pixel edit moved ${java.lang.Long.bitCount(h1 ^ h3)} bits")
  }

  test("m03: output EQUALS the brute-force aHash Hamming≤3 pair set; planted recall high") {
    val out = graft.queries.Catalog.queries("m03_dedup_images_phash")(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    val got = out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // driver-side ground truth: recompute every aHash (original + planted
    // 2-pixel-edit copy) and brute-force ALL pairs — the 4×16-bit block
    // LSH is pigeonhole-exhaustive at Hamming ≤ 3, so the distributed
    // result must EQUAL the brute-force set in both directions (the d04
    // exactness standard). Cross-image pairs are legitimate: the
    // fabricated gradient patterns of nearby ids are perceptually close.
    val hashes = (0L until 500L).flatMap { id =>
      val w = 8 + (id % 25).toInt
      val h = 8 + ((id * 3) % 17).toInt
      val payload =
        if (id % 4 == 3) MultimodalOps.MediaCodec.encodeGif(id, w, h, nFrames = 2 + (id % 7).toInt)
        else MultimodalOps.MediaCodec.encodePng(id, w, h)
      val img0 = MultimodalOps.MediaCodec.decodeFrames(payload).head
      val orig = id -> MultimodalOps.MediaCodec.averageHash64(img0)
      // mirror m03's perturbation: RGB-normalized copy, two-pixel edit
      // (PNG round trip of TYPE_INT_RGB is lossless, so hashing the
      // edited image directly equals the distributed encode+decode path)
      val img = MultimodalOps.MediaCodec.resizeImage(img0, w, h)
      img.setRGB(0, 0, 0xFFFFFF)
      img.setRGB(w - 1, h - 1, 0x000000)
      val edited = (id + 100000L) -> MultimodalOps.MediaCodec.averageHash64(img)
      Seq(orig, edited)
    }
    val expected = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(got === expected,
      s"LSH pair set diverges: missing ${(expected -- got).take(3)}, extra ${(got -- expected).take(3)}")
    // planted 2-pixel-edit copies: most stay within Hamming 3
    val planted = got.count { case (a, b) => b == a + 100000L }
    assert(planted >= 350, s"recovered only $planted/500 planted edit-copies")
  }

  test("WAV round-trip: decode parses the RIFF container and recomputes exact features") {
    import graft.multimodal.MultimodalOps.{AudioRecord, WavCodec}
    val id = 42L
    val payload = WavCodec.encodeWav(id)
    // container sanity: canonical header + 2 bytes per sample
    assert(new String(payload, 0, 4, "US-ASCII") === "RIFF")
    assert(payload.length === 44 + WavCodec.nSamples(id) * 2)

    val f = WavCodec.decode(AudioRecord(id, payload)).get
    // driver-side recompute straight from the waveform formula
    val n = WavCodec.nSamples(id)
    val vs = (0 until n).map(i => WavCodec.synthSample(id, i))
    assert(f.sample_rate === WavCodec.sampleRate(id))
    assert(f.n_samples === n.toLong)
    assert(f.sum_sq === vs.map(v => v.toLong * v).sum)
    assert(f.peak === vs.map(math.abs).max)
    assert(f.n_zero_cross ===
      vs.sliding(2).count { case Seq(a, b) => a < 0 && b >= 0 })
    assert(f.sum_window_peak ===
      vs.grouped(WavCodec.WindowSize).map(_.map(math.abs).max.toLong).sum)
  }

  test("WAV decode walks chunk structure generically and rejects corrupt payloads") {
    import graft.multimodal.MultimodalOps.{AudioRecord, WavCodec}
    val canonical = WavCodec.encodeWav(7L)
    val expected = WavCodec.decode(AudioRecord(7L, canonical)).get

    // non-canonical layout: a JUNK chunk inserted between WAVE and fmt
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ Array.fill[Byte](6)(0x5A)
    val reordered = canonical.take(12) ++ junk ++ canonical.drop(12)
    // fix the RIFF size field for the inserted chunk
    val bb = java.nio.ByteBuffer.wrap(reordered).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bb.getInt(4) + junk.length)
    assert(WavCodec.decode(AudioRecord(7L, reordered)).get === expected,
      "generic chunk walk must tolerate interleaved chunks")

    // corrupt payloads: wrong magic, truncation, non-PCM format tag
    assert(WavCodec.decode(AudioRecord(1L, "not audio".getBytes)).isEmpty)
    assert(WavCodec.decode(AudioRecord(1L, canonical.take(30))).isEmpty)
    val nonPcm = canonical.clone()
    java.nio.ByteBuffer.wrap(nonPcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(20, 3.toShort) // format tag: IEEE float
    assert(WavCodec.decode(AudioRecord(1L, nonPcm)).isEmpty)
  }

  test("m04 catalog query emits one feature row per document") {
    val out = graft.queries.Catalog.queries("m04_multimodal_audio_features")(spark, sf0001)
      .collect()
    val nDocs = graft.io.Tables(spark, sf0001).documents.count()
    assert(out.length.toLong === nDocs)
    assert(out.forall(_.getAs[Long]("sum_sq") > 0L))
    assert(out.forall(r => r.getAs[Int]("peak") > 0 && r.getAs[Int]("peak") <= 32768))
  }

  test("m05: re-encoded WAVs differ byte-wise but share decoded-PCM identity; every group pairs up") {
    import graft.multimodal.MultimodalOps.{AudioRecord, WavCodec}
    // the planted class, checked at the codec level: different bytes,
    // identical decoded identity
    val orig = WavCodec.encodeWav(7L)
    val re = WavCodec.encodeWavWithMeta(7L)
    assert(!java.util.Arrays.equals(orig, re), "re-encode did not change the container bytes")
    val ho = WavCodec.decodeContentHash(AudioRecord(7L, orig)).get
    val hr = WavCodec.decodeContentHash(AudioRecord(100007L, re)).get
    assert((ho.n_samples, ho.h1, ho.h2) === ((hr.n_samples, hr.h1, hr.h2)),
      "decoded identity differs across containers")
    // the catalog query: one group per document, each holding exactly
    // the original + its re-encode, canonical = the original id
    val out = graft.queries.Catalog.queries("m05_dedup_audio_content")(spark, sf0001)
      .collect()
    val nDocs = graft.io.Tables(spark, sf0001).documents.count()
    assert(out.length.toLong === nDocs)
    assert(out.forall(_.getAs[Long]("dup_cnt") === 2L),
      "a re-encode escaped its original's identity group")
    assert(out.forall(_.getAs[Long]("canonical_id") < 100000L))
  }

  test("m06: both poison classes quarantine per-row; healthy rows decode untouched") {
    // row-level behavior of the strict decoder on BOTH planted classes
    val good = MediaCodec.encodePng(mediaId = 13L, w = 12, h = 9)
    assert(MediaCodec.decodeStrict(MediaRecord(13L, "png", good)).isDefined)
    // truncation: magic intact, pixel data gone
    assert(MediaCodec.decodeStrict(MediaRecord(13L, "png", good.take(10))).isEmpty)
    // header rot: first byte zeroed, no reader claims it
    val rotten = good.clone(); rotten(0) = 0
    assert(MediaCodec.decodeStrict(MediaRecord(13L, "png", rotten)).isEmpty)
    // same for the animated container
    val gif = MediaCodec.encodeGif(mediaId = 31L, w = 10, h = 8, nFrames = 3)
    assert(MediaCodec.decodeStrict(MediaRecord(31L, "gif", gif)).isDefined)
    assert(MediaCodec.decodeStrict(MediaRecord(31L, "gif", gif.take(10))).isEmpty)
    // the catalog aggregate: quarantine counts equal the planted set per
    // format, and both formats have quarantined members (the planting
    // is not format-degenerate)
    val out = graft.queries.Catalog.queries("m06_multimodal_quarantine")(spark, sf0001)
      .collect()
      .map(r => r.getAs[String]("format") -> (r.getAs[Long]("n_media"),
        r.getAs[Long]("n_ok"), r.getAs[Long]("n_quarantined"))).toMap
    val ids = graft.io.Tables(spark, sf0001).documents
      .select("doc_id").collect().map(_.getLong(0))
    def fmt(id: Long) = if (id % 4 == 3) "gif" else "png"
    val planted = ids.groupBy(fmt).view
      .mapValues(g => (g.length.toLong,
        g.count(id => id % 9 != 4 && id % 9 != 7).toLong,
        g.count(id => id % 9 == 4 || id % 9 == 7).toLong)).toMap
    assert(out === planted)
    assert(out("gif")._3 > 0L && out("png")._3 > 0L)
  }

  test("m06: strict decode is honest at EVERY truncation point of a multi-frame container") {
    // Sweep every prefix of a 3-frame GIF. The strict contract under
    // test: decodeStrict never dies, and when it accepts a payload its
    // frame count equals exactly the number of INDEPENDENTLY decodable
    // frames (the full getNumImages(true) directory walk) — never a
    // silent frames:=1 default from a swallowed walk failure. The JDK
    // GIF reader reports only complete frames on truncation; readers
    // that instead THROW from the walk now quarantine (None) rather
    // than understate.
    val gif = MediaCodec.encodeGif(mediaId = 41L, w = 10, h = 8, nFrames = 3)
    val full = MediaCodec.decodeStrict(MediaRecord(41L, "gif", gif)).get
    assert(full.n_frames === 3)
    var accepted = 0
    (8 until gif.length).foreach { cut =>
      val p = java.util.Arrays.copyOf(gif, cut)
      MediaCodec.decodeStrict(MediaRecord(41L, "gif", p)).foreach { f =>
        accepted += 1
        assert(f.n_frames === MediaCodec.decodeFrames(p).length,
          s"cut=$cut: strict frame count disagrees with the decodable frames")
        assert(f.n_frames >= 1 && f.n_frames <= 3)
        // the first frame is the same pixels at every accepting cut
        assert(f.pixel_digest === full.pixel_digest && f.mean_byte === full.mean_byte,
          s"cut=$cut: first-frame pixels drifted under truncation")
      }
    }
    // the sweep exercises both verdicts: some prefixes quarantine, some
    // accept with a partial (1- or 2-frame) directory
    assert(accepted > 0 && accepted < gif.length - 8)
  }
}
