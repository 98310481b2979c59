package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in
  * [[graft.GraftSession]]) handles most runtime skew by splitting
  * oversized post-shuffle partitions — but it only sees skew AFTER a
  * shuffle materializes, and cannot split a single hot KEY whose rows
  * must meet a single build row. Explicit salting fixes the layout at
  * plan time: every probe-side row gets a salt in [0, R); the build side
  * is replicated R times with all salts, so one hot key fans out across
  * R reducers instead of melting one.
  *
  * Cost model: replicates the build side R× (use only when build ≪ probe
  * and a key is hot enough to stall a reducer); the join result is
  * row-for-row identical to the unsalted join.
  */
object SkewJoin {

  /** Deterministic per-row salt: spreads each partition's rows round-robin
    * over [0, R). Partition-local row index comes from
    * `monotonically_increasing_id`'s low bits — no hash of data columns,
    * so identical rows still land on different reducers (the whole point
    * when ONE key dominates). */
  private def salt(r: Int): Column =
    pmod(monotonically_increasing_id(), lit(r.toLong)).cast("int")

  /** `probe ⋈ build` on `keys` (inner or left), with `probe`'s hot keys
    * spread over `r` salts and `build` replicated `r` times. */
  def salted(probe: DataFrame, build: DataFrame, keys: Seq[String], r: Int,
      joinType: String = "inner"): DataFrame = {
    require(r > 0, s"salt fan-out must be positive, got $r")
    val saltedProbe = probe.withColumn("_salt", salt(r))
    val replicated = build.withColumn("_salt",
      explode(array((0 until r).map(lit): _*)))
    saltedProbe.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }
}
