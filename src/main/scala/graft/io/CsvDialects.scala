package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema-first CSV readers for the reference's raw inputs (SURVEY.md
  * §1.3, SRC1–SRC3). Explicit `StructType`s replace pandas type
  * inference (inference is engine-dependent and needs an extra pass);
  * dialect quirks handled by options, not code:
  *
  *  - UTF-8 BOM: irrelevant once an explicit schema is given (the header
  *    line is skipped, not parsed).
  *  - `;` delimiter with a trailing `;` per line: the phantom 6th column
  *    is declared in the schema and dropped (ref etl.ipynb:10–11 tried
  *    this by name and missed — dead code we fix, not copy).
  *  - CRLF line endings: Spark's line reader handles them natively.
  *  - Quoted fields with embedded commas (symbols/company names,
  *    country.csv): Spark's default quote handling matches.
  */
object CsvDialects {

  /** account-statement CSV (ref raw_file/account-statement-*.csv):
    * `;`-sep, BOM, trailing `;`. Date kept as string here; parsing is an
    * ETL step (X1) so malformed dates surface there, not in the scan. */
  val accountSchema: StructType = StructType(Seq(
    StructField("IDTransaction", LongType),
    StructField("Date", StringType),
    StructField("TransactionType", StringType),
    StructField("Symbol", StringType),
    StructField("Unit", LongType),
    StructField("_trailing", StringType)
  ))

  /** symbols.csv (ref raw_file/symbols.csv): `;`-sep, BOM, no trailing. */
  val symbolsSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("company_name", StringType),
    StructField("sector", StringType),
    StructField("industry", StringType),
    StructField("country", StringType)
  ))

  /** country.csv (ISO-3166): comma-sep, quoted fields. Loaded for scan
    * parity (ref etl.ipynb:14 loads and never uses it — SURVEY §1.3). */
  val countrySchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("alpha_2", StringType),
    StructField("alpha_3", StringType),
    StructField("country_code", StringType),
    StructField("iso_3166_2", StringType),
    StructField("region", StringType),
    StructField("sub_region", StringType),
    StructField("intermediate_region", StringType),
    StructField("region_code", StringType),
    StructField("sub_region_code", StringType),
    StructField("intermediate_region_code", StringType)
  ))

  def readAccount(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", ";")
      .option("header", "true")
      .option("encoding", "UTF-8")
      .schema(accountSchema)
      .csv(path)
      .drop("_trailing")

  def readSymbols(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", ";")
      .option("header", "true")
      .option("encoding", "UTF-8")
      .schema(symbolsSchema)
      .csv(path)

  def readCountry(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("encoding", "UTF-8")
      .schema(countrySchema)
      .csv(path)

  /** The committed golden wide table (ref transactions_merged.csv) —
    * comma-sep with quoted company names. */
  val mergedSchema: StructType = StructType(
    Seq("quarter", "country_name", "symbol", "company_name", "sector",
      "industry", "transaction_type").map(StructField(_, StringType)))

  def readMergedGolden(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("encoding", "UTF-8")
      .schema(mergedSchema)
      .csv(path)
}
