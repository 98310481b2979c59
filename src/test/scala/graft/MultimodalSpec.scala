package graft

import graft.multimodal.MultimodalOps
import graft.multimodal.MultimodalOps.{FakeCodec, MediaRecord}

/** Multimodal plumbing tests: stub-codec determinism, batch decode via
  * mapPartitions, and the downstream relational stage. */
class MultimodalSpec extends SparkSpecBase {

  test("stub codec is a pure function of the payload") {
    val payload = "ab".getBytes("UTF-8")
    val f = FakeCodec.decode(MediaRecord(7L, "img/x", payload))
    assert(f.media_id === 7L)
    assert(f.n_bytes === 2L)
    assert(f.width === 64 + 2)
    assert(f.height === 64 + 14)
    assert(f.n_frames === 1 + 2)
    assert(f.mean_byte === (97 + 98) / 2.0)
    // determinism
    assert(f === FakeCodec.decode(MediaRecord(7L, "img/x", payload)))
  }

  test("decode pipeline preserves row count and drops payloads") {
    import testImplicits._
    val media = Seq(
      MediaRecord(1L, "img/a", "hello".getBytes("UTF-8")),
      MediaRecord(2L, "img/b", Array.emptyByteArray)).toDS()
    val feats = MultimodalOps.decodeFeatures(media).collect().sortBy(_.media_id)
    assert(feats.length === 2)
    assert(feats(0).n_bytes === 5L)
    assert(feats(1).n_bytes === 0L && feats(1).mean_byte === 0.0)
    assert(!MultimodalOps.decodeFeatures(media).columns.contains("payload"))
  }

  test("m01 catalog query aggregates features per format") {
    val r = graft.queries.Catalog.queries("m01_multimodal_features")(spark, sf0001)
      .collect()
    assert(r.length === 20) // one per documents.source
    assert(r.forall(_.getAs[Long]("n_media") === 25L))
  }

  test("resize emits exactly w*h bytes, strided deterministically") {
    import testImplicits._
    val media = Seq(
      MediaRecord(1L, "img/a", "abcdefgh".getBytes("UTF-8")),
      MediaRecord(2L, "img/b", Array.emptyByteArray)).toDS()
    val out = MultimodalOps.resize(media, 4, 2).collect().sortBy(_.media_id)
    assert(out.forall(r => r.payload.length === 8 && r.width === 4 && r.height === 2))
    // stride over an 8-byte payload to 8 output bytes is the identity
    assert(new String(out(0).payload, "UTF-8") === "abcdefgh")
    // empty payload resizes to zeros, not a crash
    assert(out(1).payload.forall(_ === 0.toByte))
    // downstride: 8 bytes -> 4 output bytes picks every 2nd source byte
    val down = MultimodalOps.resize(media, 2, 2).collect().sortBy(_.media_id)
    assert(new String(down(0).payload, "UTF-8") === "aceg")
  }

  test("frame sampling partitions the payload and takes every k-th frame") {
    import testImplicits._
    // 6-byte payload -> n_frames = 1 + 6%8 = 7 frames; every=2 samples
    // frames 0,2,4,6
    val media = Seq(MediaRecord(1L, "vid/a", "abcdef".getBytes("UTF-8"))).toDS()
    val frames = MultimodalOps.sampleFrames(media, every = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2, 4, 6))
    // frame boundaries tile the payload: every=1 reassembles it exactly
    val all = MultimodalOps.sampleFrames(media, every = 1)
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
}
