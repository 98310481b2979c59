package graft

/** End-to-end recompute of the composed training pipelines. p01 is
  * oracle-checked by the driver; p02's minhash stage is hash-seeded
  * (rows-only at the driver), so this spec recomputes EVERY stage
  * driver-side — taking only the near-dup pair set from the engine
  * (that pair set's own correctness is DedupSpec's corpus-wide
  * soundness theorem) — and demands exact equality of the final
  * per-split statistics.
  */
class PipelineSpec extends SparkSpecBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private case class Doc(id: Long, text: String) {
    val nChars: Long = text.length.toLong
    val nTokens: Long = "\\S+".r.findAllIn(text).size.toLong
    val nPunct: Long = "[.,;:!?]".r.findAllIn(text).size.toLong
    val nStop: Long = "\\b(the|and|of|to|is|a)\\b".r
      .findAllIn(text.toLowerCase).size.toLong
    val quality: Double =
      math.min(1.0, nTokens / 100.0) *
        (1.0 - nPunct.toDouble / nChars) *
        (0.5 + 0.5 * math.min(1.0, nStop * 5.0 / nTokens))
    val fingerprint: String =
      md5hex(text.trim.toLowerCase.replaceAll("\\s+", " "))
    val nc: Long =
      if (nTokens <= 50) 1L else math.floor((nTokens - 50 + 39) / 40.0).toLong + 1L
    val split: String = {
      val h = md5hex(id.toString)
      if ((h(0).toInt * 256 + h(1).toInt) % 100 < 80) "train" else "eval"
    }
  }

  test("p02: per-split stats equal a full driver-side recompute of every stage") {
    val docs = graft.io.Tables(spark, sf0001).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    // stage 0: planted-near-dup corpus (doc ∪ last-3-words truncation)
    val corpus = docs.map { case (id, t) => Doc(id, t) } ++
      docs.map { case (id, t) =>
        Doc(id + 100000L, t.replaceAll("(\\s+\\S+){3}$", "")) }
    // stages 1–2: quality + en filter
    val kept = corpus.filter(d => d.quality > 0.45 && d.nStop > 0)
    // stage 3: exact dedup (min id per normalized fingerprint)
    val canonIds = kept.groupBy(_.fingerprint).values.map(_.map(_.id).min).toSet
    val canonical = kept.filter(d => canonIds.contains(d.id))
    // stage 3.5: near-dup removal — pair set from the engine (its
    // soundness is DedupSpec's corpus-wide theorem), removal recomputed
    import org.apache.spark.sql.functions.col
    val spark0 = spark
    import spark0.implicits._
    val canonDf = canonical.map(d => (d.id, d.text)).toSeq
      .toDF("doc_id", "text")
    val pairs = graft.dedup.DedupOps.minhashNearDups(canonDf, 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    graft.InternalCaches.releaseAll()
    assert(pairs.nonEmpty, "the fuzzy stage found nothing — corpus has planted near-dups")
    val drops = pairs.map(_._2).toSet
    assert(drops.forall(canonIds.contains), "dropped an id not in the survivor set")
    val surviving = canonical.filterNot(d => drops.contains(d.id))
    assert(surviving.size < canonical.size)
    // stages 4–5: chunk + split + stats
    val expected = surviving.groupBy(_.split).map { case (s, ds) =>
      s -> ((ds.size.toLong, ds.map(_.nc).sum, ds.map(_.nTokens).sum))
    }

    val got = graft.queries.Catalog.queries("p02_training_pipeline_neardup")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    assert(got.keySet === Set("train", "eval"))
  }

  test("p01 plan: exactly the two stage-boundary wide exchanges (dedup key + split agg)") {
    val plan = graft.queries.Catalog.queries("p01_training_pipeline")(spark, sf0001)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(n === 2, s"expected 2 wide exchanges (fingerprint window, split agg), got $n:\n$plan")
  }

  test("p02 plan: near-dup removal is an anti-join, no cartesian products anywhere") {
    val plan = graft.queries.Catalog.queries("p02_training_pipeline_neardup")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"no anti-join removal stage:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product in pipeline:\n$plan")
  }

  test("p03: every gate is non-trivially active and redaction counts survive to the stats") {
    import org.apache.spark.sql.functions._
    val t = graft.io.Tables(spark, sf0001)
    val total = t.documents.count()
    val got = graft.queries.Catalog.queries("p03_training_pipeline_serving")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === Set("train", "eval"))
    val nDocs = got.values.map(_._1).sum
    assert(nDocs > 0 && nDocs < total,
      s"gates must drop some but not all docs ($nDocs of $total survive)")
    // PII was really planted, redacted, and accounted: survivors carry
    // a positive total, and no surviving text may still match a pattern
    assert(got.values.map(_._4).sum > 0, "no redactions counted")
    val redactedTexts = {
      val redacted = t.documents.select(col("doc_id"),
        graft.text.TextOps.redactPii(graft.text.TextOps.plantedPiiText).as("text"))
      redacted.filter(
        col("text").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") ||
          col("text").rlike("\\b555-[0-9]{3}-[0-9]{4}\\b") ||
          col("text").rlike("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"))
        .count()
    }
    assert(redactedTexts === 0L, s"$redactedTexts docs still contain PII after redaction")
  }

  test("p04: dedup removes every planted copy; budget binds per language; selection is a weight prefix") {
    val res = graft.queries.Catalog.queries("p04_training_mix")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(res.nonEmpty)
    // the planted perturbed copies (id ≥ 100000) normalize-equal their
    // originals and must all lose the canonical selection
    assert(res.forall(_._1 < 100000L), "a planted duplicate survived into the mix")
    res.groupBy(_._2).foreach { case (lang, rows) =>
      // cumulative budget respected and consistent with the row order
      val sorted = rows.sortBy(_._5)
      assert(sorted.last._5 <= 3000L, s"$lang over budget")
      assert(sorted.map(_._3).scanLeft(0L)(_ + _).tail === sorted.map(_._5).toSeq,
        s"$lang cumulative sum inconsistent")
      // the selection is a PREFIX of the weight-descending order: every
      // selected doc's weight is ≥ any unselected doc's weight would be —
      // check monotone weights down the prefix instead (total order by
      // (weight desc, doc_id) makes this deterministic)
      val ws = sorted.map(r => (-r._4, r._1))
      assert(ws === ws.sorted, s"$lang selection not in weight order")
    }
    // the budget actually bins: not every language fits all its docs
    val docsPerLang = graft.io.Tables(spark, sf0001).documents
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val selPerLang = res.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(docsPerLang.exists { case (l, n) => selPerLang.getOrElse(l, 0L) < n },
      "budget gate inert — every document of every language selected")
  }

  test("p05: drift identities hold and reconcile with independent per-source totals") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Catalog.queries("p05_corpus_drift")(spark, sf0001)
      .collect()
    // structural identities of the churn accounting
    rows.foreach { r =>
      val va = r.getAs[Long]("vocab_a"); val vb = r.getAs[Long]("vocab_b")
      val vc = r.getAs[Long]("vocab_common")
      assert(vc <= math.min(va, vb), r.toString)
      assert(r.getAs[Long]("grams_gained") === vb - vc, r.toString)
      assert(r.getAs[Long]("grams_lost") === va - vc, r.toString)
      // the interleaved split must land every source in BOTH snapshots
      assert(r.getAs[Long]("docs_a") > 0L && r.getAs[Long]("docs_b") > 0L,
        r.toString)
    }
    // gram totals reconcile with an independent recompute (both
    // snapshots together = per-source Σ max(n_tokens − 1, 0))
    val docs = graft.io.Tables(spark, sf0001).documents
    val totals = docs.select(col("source"),
        greatest(size(regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)))
          - lit(1), lit(0)).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("grams_a") + r.getAs[Long]("grams_b")
        === totals(r.getAs[String]("source")), r.toString)
    }
    // phrase-level churn must be non-degenerate: partial overlap, and the
    // report differentiates sources (unigram vocabularies saturate here —
    // the reason p05 measures bigrams)
    rows.foreach { r =>
      val j = r.getAs[Long]("vocab_jaccard_e6")
      assert(j > 0L && j < 1000000L, s"degenerate bigram overlap: $r")
    }
    assert(rows.map(_.getAs[Long]("vocab_jaccard_e6")).distinct.length > 1)
  }
}
