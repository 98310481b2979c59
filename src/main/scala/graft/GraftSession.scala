package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Design notes for the 100 TB target (tested on local[N]):
  *  - AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  *    and dynamic broadcast conversion replace hand-tuned partition counts.
  *  - shuffle.partitions sized to cores locally; on a real cluster this is
  *    a starting hint only — AQE coalesces post-shuffle partitions to
  *    `advisoryPartitionSizeInBytes`.
  *  - Session timezone pinned UTC so timestamp semantics match the DuckDB
  *    oracle and are cluster-location-independent.
  */
object GraftSession {

  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** Apply graft's standard configuration to any builder (used by the
    * driver-contract mains too, so Verify/Bench and tests agree). */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.GraftExtensions")
    // V2 FunctionCatalog: SQL resolves graft_fn.fn.<name>(...) through
    // the catalog plugin (magic-method codegen — see GraftFunctionCatalog)
    .config("spark.sql.catalog.graft_fn", "graft.sources.GraftFunctionCatalog")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    // events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
    // reader rejects; read as long and convert exactly in io.Tables.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Spark 4.1's ICU-backed lower()/upper() triggers a
    // CollationAwareUTF8String static init that precomputes case tables
    // for the whole codepoint range — minutes of one-time CPU in this
    // container. JVM-native case mapping is identical for ASCII (and
    // matches the DuckDB oracle on this data).
    .config("spark.sql.icu.caseMappings.enabled", "false")
    .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
    .config("spark.ui.enabled", "false")

  /** Local session for tests / ad-hoc runs. */
  def local(appName: String = "graft"): SparkSession = {
    val s = tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
