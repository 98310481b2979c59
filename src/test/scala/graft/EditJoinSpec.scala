package graft

import org.apache.spark.sql.functions._

import graft.dedup.EditJoin
import graft.io.Tables

/** Deletion-neighborhood edit-distance join: completeness against the
  * brute-force quadratic, the d = 1 edge cases the blocking proof rests
  * on, and the bipartite uniqueness d10's closure-free oracle assumes. */
class EditJoinSpec extends SparkSpecBase {

  import testImplicits._

  test("d09 blocked self-join equals the brute-force quadratic join corpus-wide") {
    val recs = Tables(spark, sf0001).customer
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val blocked = EditJoin.selfJoin(recs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = recs.as("a").crossJoin(recs.as("b"))
      .filter(col("a.id") < col("b.id") &&
        levenshtein(col("a.name"), col("b.name")) <= 1)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    assert(blocked === brute)
    assert(blocked.nonEmpty) // the corpus really exercises the operator
  }

  test("deletion keys cover substitution, insertion, identity; exclude distance 2") {
    val recs = Seq(
      (1L, "abcd"),  // base
      (2L, "abxd"),  // substitution  -> dist 1
      (3L, "abcde"), // insertion     -> dist 1
      (4L, "abc"),   // deletion      -> dist 1
      (5L, "abcd"),  // equal         -> dist 0
      (6L, "axyd")   // two subs      -> dist 2, must NOT pair with 1
    ).toDF("id", "name")
    val pairs = EditJoin.selfJoin(recs)
      .select("id_a", "id_b", "lev_dist").as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 1L)))
    assert(pairs.contains((1L, 3L, 1L)))
    assert(pairs.contains((1L, 4L, 1L)))
    assert(pairs.contains((1L, 5L, 0L)))
    assert(!pairs.exists(p => Set(p._1, p._2) === Set(1L, 6L)))
  }

  test("d11 depth-2 blocked self-join equals the brute-force quadratic at threshold 2") {
    val recs = Tables(spark, sf0001).customer
      .filter(col("c_custkey") <= 300)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val blocked = EditJoin.selfJoin2(recs)
      .select("id_a", "id_b", "lev_dist").as[(Long, Long, Long)].collect().toSet
    val brute = recs.as("a").crossJoin(recs.as("b"))
      .filter(col("a.id") < col("b.id") &&
        levenshtein(col("a.name"), col("b.name")) <= 2)
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.name"), col("b.name")).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(blocked === brute)
    // the subset genuinely exercises BOTH distances: digit names give
    // distance-1 pairs (one digit differs) and distance-2 pairs
    assert(blocked.exists(_._3 === 1L) && blocked.exists(_._3 === 2L))
  }

  test("d10 feed matches are bipartite-unique, so the closure-free oracle is sound") {
    val t = Tables(spark, sf0001)
    val masters = t.customer.select(col("c_custkey").as("id"), col("c_name").as("name"))
    val crm = t.customer.filter(col("c_custkey") % 3 === 0)
      .select((col("c_custkey") + lit(100000L)).as("id"),
        concat(lit("K"), substring(col("c_name"), 2, 1000)).as("name"))
    val edges = EditJoin.crossMatch(crm, masters)
    // every feed row matches EXACTLY one master (its own, shifted key)
    val perCrm = edges.groupBy("id_a").agg(count(lit(1)).as("n"),
      min(col("id_b")).as("m"))
    assert(perCrm.filter(col("n") =!= 1L).isEmpty)
    assert(perCrm.filter(col("m") =!= col("id_a") - 100000L).isEmpty)
    assert(edges.count() === crm.count())
    // consequence: no cluster exceeds one master + one feed row
    val d10 = graft.queries.Catalog.queries("d10_entity_resolution")(spark, sf0001)
    assert(d10.agg(max(col("n_records"))).as[Long].head() <= 2L)
    assert(d10.count() === masters.count())
  }

  test("long strings route through the segment pigeonhole with perfect recall at d = 2") {
    // Synthetic corpus straddling LongStringCap (= 40): long planted
    // pairs at distance 0/1/2 (substitutions, indels, mixed), boundary
    // pairs crossing the cap (39 vs 41 chars), and distance-3 decoys
    // that must NOT appear. Recall verified against the brute-force
    // quadratic computed by Spark itself.
    val base = "The quick brown fox jumps over the lazy dog XXXXXXXX" // 52 chars
    val recs = Seq(
      (1L, base),
      (2L, base.updated(4, 'Q').updated(20, 'J')),       // two subs -> 2
      (3L, base.substring(1)),                           // one del  -> 1
      (4L, base.substring(2)),                           // two dels -> 2
      (5L, "Z" + base.updated(30, 'z')),                 // ins+sub  -> 2
      (6L, base.updated(1, 'a').updated(10, 'Z').updated(44, 'c')), // 3 subs, decoy
      (7L, "a" * 39),                                    // boundary short
      (8L, "a" * 41),                                    // 2 ins from 7
      (9L, "a" * 38 + "bb"),                             // 2 subs from 8
      (10L, base)                                        // equal -> 0
    ).toDF("id", "name")
    val blocked = EditJoin.selfJoin2(recs)
      .select("id_a", "id_b", "lev_dist").as[(Long, Long, Long)].collect().toSet
    val brute = recs.as("a").crossJoin(recs.as("b"))
      .filter(col("a.id") < col("b.id") &&
        levenshtein(col("a.name"), col("b.name")) <= 2)
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.name"), col("b.name")).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(blocked === brute)
    // the plant genuinely exercises the long path and the boundary:
    assert(blocked.contains((1L, 2L, 2L)) && blocked.contains((1L, 3L, 1L)))
    assert(blocked.contains((7L, 8L, 2L))) // 39 vs 41: cross-cap pair
    assert(!blocked.exists(p => Set(p._1, p._2) === Set(1L, 6L)))
  }

  test("segment-pigeonhole key fan-out is O(1) per row regardless of length") {
    val longRow = Seq((1L, "x" * 4096)).toDF("id", "name")
    val nSub = longRow.select(size(EditJoin.subRoleKeys(col("name"))))
      .as[Int].head()
    val nSeg = longRow.select(size(EditJoin.segRoleKeys(col("name"))))
      .as[Int].head()
    // 3 seg keys; sub keys <= 3 segments x 5 lengths x 5 shifts = 75
    // (array_distinct may collapse some on repetitive strings)
    assert(nSeg === 3)
    assert(nSub <= 75)
  }
}
