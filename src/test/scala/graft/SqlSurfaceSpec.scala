package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** The SQL-text API surface: everything a `spark.sql` user needs — the
  * engine's tables as views, ANSI analytics, and the injected native
  * functions resolving from SQL (GraftExtensions is loaded via
  * `spark.sql.extensions`, so function names work in any session of the
  * engine, not just through the Column API). */
class SqlSurfaceSpec extends SparkSpecBase {

  test("native functions resolve from SQL text") {
    val r = spark.sql(
      """SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                         array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cs,
        |       hamming_distance(array(1, 0, 1), array(1, 1, 1)) AS hd,
        |       sorted_intersect_size(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS si,
        |       simhash64(array(1L, 2L)) IS NOT NULL AS sh,
        |       size(minhash_signature(array(1L, 2L, 3L), 8)) AS mh,
        |       size(winnow_sketch('abcdefghij', 8, 4)) AS ws""".stripMargin)
      .head()
    assert(math.abs(r.getAs[Double]("cs") - 1.0) < 1e-12)
    assert(r.getAs[Long]("hd") === 1L)
    assert(r.getAs[Long]("si") === 2L)
    assert(r.getAs[Boolean]("sh"))
    assert(r.getAs[Int]("mh") === 8)
    assert(r.getAs[Int]("ws") === 3) // 10 chars → 3 distinct 8-grams
  }

  test("token_chunks Generator works from SQL via LATERAL VIEW and SELECT-list") {
    // the UDTF surface: both ANSI spellings must fan out identically
    val lv = spark.sql(
      """SELECT id, c.chunk_idx, c.chunk_text
        |FROM VALUES (1, 'a b c d e'), (2, 'x y') AS t(id, txt)
        |LATERAL VIEW token_chunks(txt, 3, 2) c AS chunk_idx, chunk_text
        |ORDER BY id, chunk_idx""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(lv.toSeq === Seq(
      (1, 0L, "a b c"), (1, 1L, "c d e"), (2, 0L, "x y")))
    val sel = spark.sql(
      """SELECT id, token_chunks(txt, 3, 2)
        |FROM VALUES (1, 'a b c d e') AS t(id, txt)
        |ORDER BY id, chunk_idx""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(sel.toSeq === Seq((1, 0L, "a b c"), (1, 1L, "c d e")))
  }

  test("round-5 native functions resolve from SQL text") {
    // one learned merge: ('h','i') → id 256
    val hi = graft.functions.expressions.BpeCodec.pack('h'.toInt, 'i'.toInt)
    val r = spark.sql(
      s"""SELECT winnow_sketch_md5('abcdefghij', 8, 4) AS wm,
        |       md5_prefix64('token') AS mp,
        |       word_ngram_md5_hashes('a b c d e f', 5) AS wn,
        |       bpe_decode(bpe_encode('hi hi', array(CAST($hi AS BIGINT))),
        |                  array(CAST($hi AS BIGINT))) AS rt""".stripMargin)
      .head()
    assert(r.getSeq[String](0).length === 3 &&
      r.getSeq[String](0).forall(_.matches("[0-9a-f]{16}")))
    // cross-check the hash against java's own MD5 of the same bytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest("token".getBytes("UTF-8"))
    val exp = (0 until 8).foldLeft(0L)((h, b) => (h << 8) | (d(b) & 0xffL))
    assert(r.getAs[Long]("mp") === exp)
    assert(r.getSeq[Long](2).length === 2) // 6 tokens → 2 distinct 5-grams
    // the round trip through one learned merge must reproduce the text
    assert(r.getAs[String]("rt") === "hi hi")
  }

  test("a full dashboard-style query runs as pure SQL over registered views") {
    val t = Tables(spark, sf0001)
    t.lineitem.createOrReplaceTempView("sql_lineitem")
    t.orders.createOrReplaceTempView("sql_orders")
    val viaSql = spark.sql(
      """SELECT concat('Q', CAST(quarter(o_orderdate) AS STRING)) AS quarter,
        |       l_returnflag, count(*) AS cnt
        |FROM sql_lineitem JOIN sql_orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2
        |ORDER BY quarter, l_returnflag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val viaApi = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(
        concat(lit("Q"), quarter(col("o_orderdate")).cast("string")).as("quarter"),
        col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("quarter", "l_returnflag")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(viaSql.toSeq === viaApi.toSeq && viaSql.nonEmpty)
  }

  test("SQL window + rollup surface matches the Column API") {
    val t = Tables(spark, sf0001)
    t.lineitem.createOrReplaceTempView("sql_lineitem2")
    val viaSql = spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS flag, count(*) AS cnt
        |FROM sql_lineitem2
        |GROUP BY ROLLUP(l_returnflag)
        |ORDER BY flag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val viaApi = t.lineitem
      .rollup(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"), col("cnt"))
      .orderBy("flag")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaSql.toSeq === viaApi.toSeq)
  }
}
