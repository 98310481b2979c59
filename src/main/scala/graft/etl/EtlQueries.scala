package graft.etl

import graft.queries.GraftQuery

/** Driver-oracled catalog entry for the reference's own ETL path
  * (ref etl.ipynb:7–210): raw `;`-separated BOM'd CSVs → orphan-symbol
  * semi-join → star-schema dims → fact → denormalized wide table.
  *
  * This is the engine's most reference-specific code path
  * ([[CsvDialects]] + [[StarSchema]]); everything else in the catalog
  * runs on the driver's parquet tables, so without this entry the
  * DuckDB oracle never sees the CSV dialect handling or the dim/fact
  * build. The oracle replays the same pipeline in SQL over
  * `read_csv` of the same files; both sides must reproduce the
  * committed 2,069-row golden multiset (transactions_merged.csv).
  */
object EtlQueries {

  /** Raw fixture dir — the reference's committed inputs, shipped as test
    * resources. The query reads fixed files, not the per-SF tables, so
    * the `dir` argument is unused (env override for relocated repos). */
  val RawDir: String = sys.env.getOrElse(
    "GRAFT_REFERENCE_RAW_DIR",
    "/root/repo/src/test/resources/reference_fixtures/raw_file")

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q25_reference_etl",
      "full reference ETL: raw CSVs -> star schema -> wide serving table",
      (spark, _) => StarSchema.build(spark, RawDir).wide,
      Some(
        s"""WITH account AS (
           |  SELECT IDTransaction, Date, TransactionType, Symbol
           |  FROM read_csv('$RawDir/account-statement-1-1-2024-12-31-2024.csv',
           |                delim=';', header=true, all_varchar=true)
           |), symbols AS (
           |  SELECT symbol, company_name, sector, industry,
           |         CASE WHEN country = 'Taiwan' THEN 'Taiwan, Province of China'
           |              WHEN country = 'Turkey' THEN 'Türkiye'
           |              ELSE country END AS country_mapped
           |  FROM read_csv('$RawDir/symbols.csv', delim=';', header=true, all_varchar=true)
           |)
           |SELECT 'Q' || CAST(quarter(strptime(a.Date, '%d/%m/%Y %H:%M:%S')) AS VARCHAR) AS quarter,
           |       s.country_mapped AS country_name,
           |       s.symbol, s.company_name, s.sector, s.industry,
           |       a.TransactionType AS transaction_type
           |FROM account a JOIN symbols s ON a.Symbol = s.symbol
           |WHERE s.country_mapped IS NOT NULL""".stripMargin)
    )
  )
}
