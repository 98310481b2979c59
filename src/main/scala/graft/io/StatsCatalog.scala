package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog tables with COMPUTED COLUMN STATISTICS — the input the
  * cost-based optimizer needs before it can reorder joins. Registered
  * once per (JVM, dataset) as EXTERNAL tables (data under a
  * [[TempLayouts]] dir via `option("path", …)`, so nothing lands in the
  * default warehouse dir), then `ANALYZE TABLE … COMPUTE STATISTICS FOR
  * ALL COLUMNS` fills row counts + per-column NDV/min/max/null counts.
  *
  * This is exactly the production discipline at 100 TB: stats are
  * maintained by the ingest pipeline (a metadata-size ANALYZE per
  * partition landing), and every downstream query gets cost-based join
  * ordering for free. The in-memory session catalog plays the metastore
  * here; the table registrations are shared by all sessions of the JVM
  * (SharedState.externalCatalog), which is what lets the memo work.
  */
object StatsCatalog {

  /** (customer, orders, lineitem) table names, registered + analyzed. */
  def analyzedStarTables(spark: SparkSession, dir: String): (String, String, String) = {
    val canon = new java.io.File(dir).getCanonicalPath
    val suffix = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(canon) & 0x7fffffff)
    val (cust, ord, li) =
      (s"graft_cbo_cust_$suffix", s"graft_cbo_ord_$suffix", s"graft_cbo_li_$suffix")
    TempLayouts.cached("cbo#" + canon, "graft_cbo_") { out =>
      val t = Tables(spark, dir)
      def register(df: DataFrame, name: String, path: String): Unit = {
        df.write.mode("overwrite").option("path", path).saveAsTable(name)
        spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      register(t.customer, cust, s"$out/customer")
      register(t.orders, ord, s"$out/orders")
      register(t.lineitem, li, s"$out/lineitem")
    }
    (cust, ord, li)
  }
}
