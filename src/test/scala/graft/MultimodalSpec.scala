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
}
