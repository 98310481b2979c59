package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Text-operator properties beyond the DuckDB oracles. */
class TextSpec extends SparkSpecBase {
  import testImplicits._

  lazy val docs = Tables(spark, sf0001).documents

  test("winnow sketch: deterministic, ascending, size ≤ min(4, n_windows)") {
    val run1 = graft.queries.Catalog.queries("t04_winnow_fingerprint")(spark, sf0001)
      .collect()
    val run2 = graft.queries.Catalog.queries("t04_winnow_fingerprint")(spark, sf0001)
      .collect()
    assert(run1.map(_.toString).toSeq === run2.map(_.toString).toSeq)
    run1.foreach { r =>
      // The catalog emits the sketch comma-joined (driver checker hashes
      // scalar cells only); parse it back for the property checks.
      val sketch = r.getAs[String]("sketch").split(",").map(_.toLong).toSeq
      val nWindows = r.getAs[Long]("n_windows")
      assert(sketch.length === math.min(4L, nWindows).toInt) // ≥4 distinct grams in this corpus
      assert(sketch.zip(sketch.tail).forall { case (a, b) => a <= b },
        s"sketch not ascending: $sketch")
    }
  }

  test("native winnow_sketch is bit-identical to the HOF formulation") {
    import graft.functions.TextFunctions._
    val hof = docs
      .withColumn("grams", charShingles("text", 8))
      .withColumn("hashes", transform(col("grams"), g => xxhash64(g)))
      .select(col("doc_id"), slice(array_sort(col("hashes")), 1, 4).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = docs
      .select(col("doc_id"),
        call_function("winnow_sketch", col("text"), lit(8), lit(4)).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(hof === native)
  }

  test("winnow sketch: equal for texts with identical gram content") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the dog"),
      (2L, "the quick brown fox jumps over the dog"), // identical
      (3L, "a completely different document body here")
    ).toDF("doc_id", "text")
    import graft.functions.TextFunctions._
    val sk = df
      .withColumn("grams", charShingles("text", 8))
      .withColumn("hashes", transform(col("grams"), g => xxhash64(g)))
      .select(col("doc_id"), slice(array_sort(col("hashes")), 1, 4).as("sketch"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sk(1L) === sk(2L))
    assert(sk(1L) !== sk(3L))
  }

  test("lang-id prediction is deterministic and total over the corpus") {
    val preds = graft.queries.Catalog.queries("t02_lang_id")(spark, sf0001)
      .collect()
    assert(preds.length === 500)
    val domain = Set("zh", "en", "de", "es", "fr", "und")
    assert(preds.forall(r => domain.contains(r.getAs[String]("lang_pred"))))
  }

  test("quality score stays in [0, 1] over the corpus") {
    val scores = graft.queries.Catalog.queries("t01_text_stats")(spark, sf0001)
      .select("quality_score").collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }
}
