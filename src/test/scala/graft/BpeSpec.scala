package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.functions.expressions.BpeCodec
import graft.io.Tables
import graft.text.Bpe

/** Independent verification of the byte-level BPE family (t17/t18/t19).
  *
  * The reference implementation here is deliberately a DIFFERENT
  * algorithm from the engine's: encoding replays merges SEQUENTIALLY in
  * learned order (merge 0 exhaustively, then merge 1, ...), where the
  * native expression greedily applies the lowest-ranked pair present.
  * The two are provably equivalent (later merges only create new ids,
  * so they never create a fresh instance of an earlier pair) — equality
  * over the whole corpus is therefore a real cross-check, not a replay
  * of the same code path.
  */
class BpeSpec extends SparkSpecBase {

  lazy val docs = Tables(spark, sf0001).documents
  lazy val merges: Array[Long] = Bpe.merges(spark, sf0001)
  lazy val texts: Map[Long, String] = docs.select(col("doc_id"), col("text"))
    .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  // ---- naive reference implementation (sequential merge replay) ----

  private def preTokens(t: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val m = BpeCodec.PreToken.matcher(t)
    while (m.find()) out += t.substring(m.start, m.end)
    out.result()
  }

  private def naiveEncode(t: String): Seq[Int] =
    preTokens(t).flatMap { w =>
      var ids: List[Int] =
        w.getBytes(StandardCharsets.UTF_8).toList.map(_ & 0xff)
      merges.zipWithIndex.foreach { case (p, r) =>
        val a = BpeCodec.left(p); val b = BpeCodec.right(p)
        val nw = List.newBuilder[Int]
        var rest = ids
        while (rest.nonEmpty) rest match {
          case x :: y :: tl if x == a && y == b => nw += (256 + r); rest = tl
          case x :: tl => nw += x; rest = tl
          case Nil => ()
        }
        ids = nw.result()
      }
      ids
    }

  private lazy val naiveVocab: Map[Int, Array[Byte]] = {
    val v = scala.collection.mutable.Map.empty[Int, Array[Byte]]
    (0 until 256).foreach(i => v(i) = Array(i.toByte))
    merges.zipWithIndex.foreach { case (p, r) =>
      v(256 + r) = v(BpeCodec.left(p)) ++ v(BpeCodec.right(p))
    }
    v.toMap
  }

  private def naiveDecode(ids: Seq[Int]): String =
    new String(ids.toArray.flatMap(naiveVocab), StandardCharsets.UTF_8)

  // ---- training ----

  test("trained merges: deterministic, within bounds, pair ids all pre-existing") {
    assert(merges.nonEmpty && merges.length <= Bpe.NumMerges)
    // each merge may only pair ids that exist BEFORE it (bytes or
    // earlier merges) — the property that makes sequential replay valid
    merges.zipWithIndex.foreach { case (p, r) =>
      assert(BpeCodec.left(p) < 256 + r && BpeCodec.right(p) < 256 + r,
        s"merge $r pairs a not-yet-created id: $p")
    }
    assert(Bpe.train(texts.values.toSeq.sorted.take(16), 50).toSeq ===
      Bpe.train(texts.values.toSeq.sorted.take(16), 50).toSeq)
  }

  test("training counts pairs correctly on a hand-checked corpus") {
    // "ababab": words are alnum runs -> one word "ababab" (freq 1);
    // the only viable first merge is (a,b) (count 3) vs (b,a) (count 2)
    val m = Bpe.train(Seq("ababab"), 2)
    val a = 'a'.toInt; val b = 'b'.toInt
    assert(m.length >= 1 && m(0) === BpeCodec.pack(a, b))
    // after (a,b)->X: "X X X" -> pair (X,X) count 2 -> second merge
    assert(m.length === 2 && m(1) === BpeCodec.pack(256, 256))
  }

  test("t21 catalog entry: the emitted merge table IS the trained artifact") {
    val rows = graft.queries.Catalog.queries("t21_bpe_merge_table")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === merges.length)
    rows.foreach { case (rank, l, rgt, packed) =>
      assert(packed === merges(rank.toInt), s"rank $rank packed drifted")
      assert(l === BpeCodec.left(packed).toLong &&
        rgt === BpeCodec.right(packed).toLong, s"rank $rank unpack drifted")
    }
  }

  // ---- encoding ----

  test("t17: native greedy encoding equals sequential merge replay (whole corpus)") {
    val native = docs
      .select(col("doc_id"),
        call_function("bpe_encode", col("text"), lit(merges)).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(native.keySet === texts.keySet)
    native.foreach { case (id, ids) =>
      assert(ids === naiveEncode(texts(id)), s"doc $id encoding mismatch")
    }
  }

  test("decode(encode(text)) == text byte-for-byte (lossless pre-tokenizer)") {
    val roundTrip = docs
      .select(col("doc_id"),
        call_function("bpe_decode",
          call_function("bpe_encode", col("text"), lit(merges)),
          lit(merges)).as("rt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) =>
      assert(roundTrip(id) === t, s"doc $id round trip differs")
    }
  }

  test("t17 catalog entry: counts and id head match the naive recompute") {
    val rows = graft.queries.Catalog.queries("t17_bpe_tokenize")(spark, sf0001)
      .collect()
    assert(rows.length === texts.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val exp = naiveEncode(texts(id))
      assert(r.getAs[Long]("n_bpe_tokens") === exp.length.toLong)
      assert(r.getAs[String]("ids_head") === exp.take(16).mkString(","))
      val nBytes = texts(id).getBytes(StandardCharsets.UTF_8).length.toLong
      assert(r.getAs[Long]("n_bytes") === nBytes)
      assert(r.getAs[Long]("bytes_per_token_e3") ===
        nBytes * 1000 / math.max(exp.length.toLong, 1L))
    }
    // the merges must actually compress: corpus-wide tokens strictly
    // below corpus-wide bytes (a no-op merge list would tie them)
    val totTok = rows.map(_.getAs[Long]("n_bpe_tokens")).sum
    val totBytes = rows.map(_.getAs[Long]("n_bytes")).sum
    assert(totTok < totBytes, s"BPE bought no compression: $totTok vs $totBytes")
  }

  // ---- chunking ----

  test("t18: chunk texts equal naive slices; ids reassemble to the document") {
    val byDoc = graft.queries.Catalog.queries("t18_chunk_documents_bpe")(spark, sf0001)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("chunk_idx"))
        .map(_.getAs[String]("chunk_text")).toSeq).toMap
    assert(byDoc.keySet === texts.keySet)
    texts.foreach { case (id, t) =>
      val ids = naiveEncode(t)
      val nc = if (ids.length <= 50) 1 else (ids.length - 50 + 39) / 40 + 1
      val exp = (0 until nc).map(i => naiveDecode(ids.slice(i * 40, i * 40 + 50)))
      assert(byDoc(id) === exp, s"doc $id chunks mismatch")
      // stitch chunk id-ranges (chunk 0 + each later chunk's last 40)
      // back together: exact document text
      val stitched = ids.take(50) ++
        (1 until nc).flatMap(i => ids.slice(i * 40 + 10, i * 40 + 50))
      assert(naiveDecode(stitched) === t, s"doc $id stitched ids differ")
    }
  }

  // ---- budget fill ----

  test("t19: kept set matches a naive greedy BPE-budget recompute per language") {
    val rows = graft.queries.Catalog.queries("t19_token_budget_bpe")(spark, sf0001)
      .collect()
    val got = rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bpe_tokens"),
      r.getAs[Long]("cum_tokens"))).toSet
    // naive: order by (quality desc, doc_id) within language over
    // independently recomputed token counts and the t01 quality formula
    val quality = docs
      .select(col("doc_id"), col("lang"),
        graft.text.TextOps.qualityExpr.as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val exp = quality.toSeq.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      // cum_tokens is the running sum over ALL docs in rank order (the
      // window has no skip); the filter then keeps the prefix ≤ budget
      var cum = 0L
      ds.sortBy { case (id, _, q) => (-q, id) }.flatMap { case (id, _, _) =>
        val n = naiveEncode(texts(id)).length.toLong
        cum += n
        if (cum <= 12000L) Some((id, n, cum)) else None
      }
    }.toSet
    assert(got === exp)
  }

  test("oracle SQL materializes after training and embeds this merge table") {
    // the strong half of CatalogDisciplineSpec's generatedOracles gate:
    // once this JVM has trained (the `merges` fixture above), every BPE
    // entry must surface full oracle SQL, and the embedded VALUES table
    // must be THE trained artifact
    merges: Unit // force training
    val oracles = graft.queries.Catalog.oracleSql
    val names = Seq("t17_bpe_tokenize", "t18_chunk_documents_bpe",
      "t19_token_budget_bpe", "t21_bpe_merge_table")
    names.foreach { n =>
      assert(oracles.contains(n), s"$n has no oracle after training")
    }
    // t21's VALUES rows carry each packed merge verbatim
    val t21 = oracles("t21_bpe_merge_table")
    merges.zipWithIndex.foreach { case (p, r) =>
      assert(t21.contains(s"($r, ${graft.functions.expressions.BpeCodec.left(p)}, " +
        s"${graft.functions.expressions.BpeCodec.right(p)}, $p)"),
        s"merge rank $r missing from the t21 oracle VALUES table")
    }
    // the encode replay appears once per merge in the t17 oracle
    assert("replace\\(".r.findAllIn(oracles("t17_bpe_tokenize")).size >= merges.length)
  }
}
