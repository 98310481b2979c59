package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextFunctions

/** Property-based invariants (SURVEY.md §5.2.4) over ScalaCheck-generated
  * inputs with fixed seeds (scalatestplus bridge is not on the classpath,
  * so sampling is explicit — same generators, deterministic runs). */
class PropertySpec extends SparkSpecBase {
  import testImplicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val wordGen = Gen.listOfN(2, Gen.alphaLowerChar).map(_.mkString)
  private val textGen = Gen.chooseNum(5, 40)
    .flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  test("jaccard is bounded in [0,1], symmetric, and 1 for self") {
    samples(Gen.listOfN(6, textGen), 5).foreach { texts =>
      if (texts.nonEmpty) {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
          .withColumn("toks", TextFunctions.tokens(col("text")))
          .withColumn("sh", TextFunctions.wordShingles("toks", 2))
          .select(col("doc_id"), col("sh"))
        val a = df.select(col("doc_id").as("ia"), col("sh").as("sa"))
        val b = df.select(col("doc_id").as("ib"), col("sh").as("sb"))
        val pairs = a.crossJoin(b)
          .select(col("ia"), col("ib"),
            TextFunctions.jaccard(col("sa"), col("sb")).as("j"))
          .collect()
        assert(pairs.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
        val m = pairs.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        assert(m.forall { case ((i, j), v) => m((j, i)) == v })
        assert(pairs.filter(r => r.getLong(0) == r.getLong(1))
          .forall(_.getDouble(2) == 1.0))
      }
    }
  }

  test("top-k size = min(k, distinct keys); top-k is a subset of the key domain") {
    samples(Gen.zip(
        Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e")),
        Gen.chooseNum(1, 8)), 10).foreach { case (keys, k) =>
      {
        val df = keys.toDF("k")
        val top = df.groupBy("k").count()
          .orderBy(col("count").desc, col("k").asc).limit(k)
          .collect().map(_.getString(0))
        assert(top.length === math.min(k, keys.distinct.length))
        assert(top.toSet.subsetOf(keys.toSet))
      }
    }
  }

  test("factless fact count is preserved by the dim join-out/join-back round trip") {
    samples(Gen.listOfN(30, Gen.oneOf("Q1", "Q2", "Q3", "Q4")), 5).foreach {
      qs =>
        val fact = qs.zipWithIndex.map { case (q, i) => (i.toLong, q) }
          .toDF("id", "quarter")
        val dim = fact.select(col("quarter")).distinct()
          .withColumn("time_id",
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy("quarter")))
        // join out (assign FK) then join back (denormalize): row count invariant
        val withFk = fact.join(dim, Seq("quarter")).select("id", "time_id")
        val back = withFk.join(dim, Seq("time_id"), "left")
        assert(back.count() === fact.count())
    }
  }

  test("GroupedTopK reduce/merge laws: any partition split yields the global top-k") {
    import graft.functions.expressions.{GroupedTopK, Scored}
    val agg = new GroupedTopK(5)
    val itemGen = for {
      score <- Gen.chooseNum(0, 9) // small domain forces score ties
      id <- Gen.chooseNum(0L, 999L)
    } yield Scored(score.toDouble, id)
    samples(Gen.listOfN(40, itemGen), 10).foreach { items =>
      // identical (score,id) pairs are legal inputs and kept as duplicates,
      // exactly like rows feeding a real aggregation
      val full = items.sortBy(s => (-s.score, s.id)).take(5)
      val reduced = items.foldLeft(agg.zero)(agg.reduce)
      assert(reduced.toSeq === full)
      // any 3-way split merged in any grouping equals the single pass
      val (p1, rest) = items.splitAt(items.length / 3)
      val (p2, p3) = rest.splitAt(rest.length / 2)
      val bufs = Seq(p1, p2, p3).map(_.foldLeft(agg.zero)(agg.reduce))
      val mergedLR = agg.merge(agg.merge(bufs(0), bufs(1)), bufs(2))
      val mergedRL = agg.merge(bufs(0), agg.merge(bufs(1), bufs(2)))
      assert(mergedLR.toSeq === full)
      assert(mergedRL.toSeq === full)
      // merging with zero is identity
      assert(agg.merge(reduced, agg.zero).toSeq === full)
      assert(agg.merge(agg.zero, reduced).toSeq === full)
    }
  }

  test("pct_change(lag) is null exactly for the first ordered row") {
    samples(Gen.chooseNum(1, 6), 5).foreach { n =>
      val df = (1 to n).map(i => (s"Q$i", i.toLong * 10)).toDF("q", "cnt")
      val w = org.apache.spark.sql.expressions.Window.orderBy("q")
      val nulls = df.withColumn("pc",
          (col("cnt") - lag("cnt", 1).over(w)) / lag("cnt", 1).over(w))
        .orderBy("q").collect()
        .map(r => r.isNullAt(r.fieldIndex("pc")))
      assert(nulls.head)
      assert(nulls.tail.forall(!_))
    }
  }

  test("gopher signals match a driver recompute on arbitrary text (incl. empty/whitespace)") {
    val weirdGen = Gen.oneOf(
      Gen.const(""), Gen.const("   "), Gen.const("\t \n"),
      textGen,
      Gen.listOfN(8, Gen.oneOf("a", "a", "b!", "..", "zz")).map(_.mkString(" ")))
    samples(Gen.listOfN(12, weirdGen), 3).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.text.TextOps.gopherSignals(df)
        .collect().map(r => r.getLong(0) -> r).toMap
      texts.zipWithIndex.foreach { case (tx, i) =>
        val toks = tx.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        val r = got(i.toLong)
        assert(r.getAs[Long]("n_words") === toks.length.toLong)
        assert(r.getAs[Long]("n_distinct") === toks.distinct.length.toLong)
        assert(r.getAs[Long]("n_tok_chars") === toks.map(_.length).sum.toLong)
        val topTok = if (toks.isEmpty) 0 else toks.groupBy(identity).values.map(_.size).max
        assert(r.getAs[Long]("top_token_cnt") === topTok.toLong)
        val bgs = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
        val topBg = if (bgs.isEmpty) 0 else bgs.groupBy(identity).values.map(_.size).max
        assert(r.getAs[Long]("top_bigram_cnt") === topBg.toLong)
        // fractions well-defined and bounded even for token-less docs
        Seq("mean_word_len", "top_token_frac", "top_bigram_frac", "type_token_ratio")
          .foreach { cn =>
            val v = r.getAs[Double](cn)
            assert(!v.isNaN && !v.isInfinite && v >= 0.0, s"$cn = $v for '$tx'")
          }
        if (toks.isEmpty) {
          assert(r.getAs[Double]("mean_word_len") === 0.0)
          assert(r.getAs[String]("verdict") === "drop")
        }
      }
    }
  }
}
