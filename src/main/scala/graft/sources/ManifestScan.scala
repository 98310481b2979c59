package graft.sources

import java.io.File
import java.util.OptionalLong

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.io.ManifestLog

/** DSv2 BATCH READ over a manifest-format table — what makes the format's
  * commit-time statistics visible to Catalyst's COST-BASED OPTIMIZER
  * (round-13 verdict item 6): the scan reports row counts, byte sizes,
  * per-column NDV and null counts straight from ONE manifest read
  * through [[SupportsReportStatistics]]' `columnStats()`, so
  * `CostBasedJoinReorder` can reorder joins over manifest tables exactly
  * as it does over ANALYZE'd catalog tables (q87) — with zero scan-time
  * work, because the stats were harvested at COMMIT time
  * ([[ManifestLog.stage]]'s footer walk + opt-in NDV aggregation).
  *
  * Scale design: planning is one metadata file read (the manifest names
  * every data file with its rows/bytes/stats); execution is one
  * partition per data file. Row materialization uses the PUBLIC
  * parquet-hadoop Group API with column projection pushed into the
  * parquet read schema ([[SupportsPushDownRequiredColumns]]) — the
  * Spark-native vectorized path stays available via
  * [[ManifestLog.read]]/[[ManifestLog.snapshot]] for data-plane queries;
  * THIS connector exists to carry the format's metadata (stats,
  * versioning) across the DSv2 boundary where plain
  * `spark.read.parquet` cannot.
  *
  * Restrictions (explicit, spec-pinned): tombstone-free snapshots only
  * (a merge-on-read anti-join is a PLAN, not a scan — readers of MoR
  * tables use [[ManifestLog.snapshot]]); LONG/DOUBLE/STRING/BOOLEAN
  * columns (the q94 interchange discipline, as the sink).
  */
private[sources] class ManifestScanBuilder(
    tableSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private val base = JsonlSource.requirePath(options)
  private val version: Long = {
    val v = options.getLong("version", -1L)
    if (v >= 0) v
    else ManifestLog.latest(base).getOrElse(
      throw new IllegalArgumentException(s"no committed manifest version under $base"))
  }

  private var required: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new ManifestScan(base, version, tableSchema, required)
}

private[sources] case class ManifestFilePartition(path: String) extends InputPartition

private[sources] class ManifestScan(
    base: String,
    version: Long,
    tableSchema: StructType,
    required: StructType)
  extends Scan with Batch with SupportsReportStatistics {

  private val entries = ManifestLog.manifest(base, version)
  require(!entries.exists(_.kind == "delete"),
    "graft-manifest DSv2 scan reads tombstone-free snapshots only — " +
      "fold deletes (CoW/OPTIMIZE) or read via ManifestLog.snapshot")
  private val data = entries.filter(_.kind == "data")

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-manifest v$version (${data.size} files), " +
      s"ReadSchema: ${required.catalogString}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    data.map(e => ManifestFilePartition(new File(base, e.path).getPath): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestGroupReaderFactory(tableSchema, required,
      new SerializableConfiguration(SparkSession.active.sessionState.newHadoopConf()))

  /** The CBO's inputs, from the manifest alone (no file opened):
    *  - numRows / sizeInBytes: exact per-file counts summed (bytes
    *    scaled by the pruned-column fraction, as the JSONL scan);
    *  - per-column distinctCount: per-file NDVs summed, capped at the
    *    row count — an upper bound (cross-file overlap is unknown
    *    without a sketch union), which is the conservative direction
    *    for join-cardinality estimates (output overestimated, a
    *    selective join still wins reordering);
    *  - per-column nullCount: exact footer null counts summed when
    *    every file recorded the column. */
  override def estimateStatistics(): Statistics = {
    val rows = data.map(_.rows).sum
    val frac =
      if (tableSchema.isEmpty) 1.0
      else math.max(1, required.size).toDouble / tableSchema.size
    val bytes = math.max(1L, (data.map(_.bytes).sum * frac).toLong)
    val colStats = new java.util.HashMap[NamedReference, ColumnStatistics]()
    tableSchema.fieldNames.foreach { c =>
      val ndvs = data.map(_.ndv.get(c))
      val ndv: Option[Long] =
        if (ndvs.isEmpty || ndvs.exists(_.isEmpty)) None
        else Some(math.min(ndvs.flatten.sum, math.max(1L, rows)))
      val nullsPerFile = data.map(_.stats.get(c).map(_.nulls))
      val nulls: Option[Long] =
        if (nullsPerFile.isEmpty || nullsPerFile.exists(_.isEmpty)) None
        else Some(nullsPerFile.flatten.sum)
      // table-level min/max from the per-file footer stats (numeric kinds
      // only — they convert unambiguously to the optimizer's domain; a
      // missing bound leaves the optimizer's range logic conservative):
      // join-cardinality estimation needs the key RANGES to see overlap,
      // not just NDVs
      val fileStats = data.map(_.stats.get(c))
      val minMax: Option[(AnyRef, AnyRef)] =
        if (fileStats.isEmpty || fileStats.exists(_.isEmpty)) None
        else {
          val ss = fileStats.flatten
          val kind = ss.head.kind
          val mins = ss.flatMap(_.min)
          val maxs = ss.flatMap(_.max)
          if (mins.size != ss.size || maxs.size != ss.size) None
          else kind match {
            case "long" => Some((
              java.lang.Long.valueOf(mins.map(_.toLong).min),
              java.lang.Long.valueOf(maxs.map(_.toLong).max)))
            case "double" => Some((
              java.lang.Double.valueOf(mins.map(_.toDouble).min),
              java.lang.Double.valueOf(maxs.map(_.toDouble).max)))
            case _ => None
          }
        }
      if (ndv.isDefined || nulls.isDefined || minMax.isDefined)
        colStats.put(Expressions.column(c), new ColumnStatistics {
          override def distinctCount(): OptionalLong =
            ndv.map(OptionalLong.of).getOrElse(OptionalLong.empty())
          override def nullCount(): OptionalLong =
            nulls.map(OptionalLong.of).getOrElse(OptionalLong.empty())
          override def min(): java.util.Optional[Object] =
            minMax.map(m => java.util.Optional.of(m._1: Object))
              .getOrElse(java.util.Optional.empty[Object]())
          override def max(): java.util.Optional[Object] =
            minMax.map(m => java.util.Optional.of(m._2: Object))
              .getOrElse(java.util.Optional.empty[Object]())
        })
    }
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
      override def numRows(): OptionalLong = OptionalLong.of(rows)
      override def columnStats(): java.util.Map[NamedReference, ColumnStatistics] =
        colStats
    }
  }
}

private[sources] class ManifestGroupReaderFactory(
    tableSchema: StructType,
    required: StructType,
    conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[ManifestFilePartition]
    new ManifestGroupReader(fp.path, tableSchema, required, conf.value)
  }
}

/** One data file's reader through the public parquet-hadoop Group API,
  * with the projection pushed into the parquet read schema (only the
  * required columns' pages are decoded). An EMPTY projection (a bare
  * count(*) prunes every column) still reads the narrowest column for
  * its row positions and emits empty rows. */
private[sources] class ManifestGroupReader(
    path: String,
    tableSchema: StructType,
    required: StructType,
    conf: org.apache.hadoop.conf.Configuration)
  extends PartitionReader[InternalRow] {

  // parquet rejects an empty projection: fall back to the first table
  // column for row-count-only scans (smallest honest choice without
  // per-column size metadata)
  private val parseSchema: StructType =
    if (required.isEmpty) StructType(tableSchema.fields.take(1)) else required

  private val reader: ParquetReader[org.apache.parquet.example.data.Group] = {
    val c = new org.apache.hadoop.conf.Configuration(conf)
    // the projection is built from the FILE's own footer schema (field
    // repetition must match exactly — a file written from a
    // non-nullable frame carries `required` fields, which a uniformly
    // `optional` request would fail parquet's containment check)
    val hp = new HPath(path)
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp, c))
    val fileSchema =
      try rdr.getFooter.getFileMetaData.getSchema
      finally rdr.close()
    val projection = new org.apache.parquet.schema.MessageType(
      fileSchema.getName,
      parseSchema.fieldNames.map(n =>
        fileSchema.getType(fileSchema.getFieldIndex(n))): _*)
    c.set(ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
    ParquetReader.builder(new GroupReadSupport(), hp).withConf(c).build()
  }

  private val nOut = required.size
  private val types = parseSchema.fields.map(_.dataType)
  private var current: InternalRow = _

  override def next(): Boolean = {
    val g = reader.read()
    if (g == null) return false
    val out = new Array[Any](nOut)
    var i = 0
    while (i < nOut) {
      out(i) =
        if (g.getFieldRepetitionCount(i) == 0) null
        else types(i) match {
          case LongType => g.getLong(i, 0)
          case DoubleType => g.getDouble(i, 0)
          case BooleanType => g.getBoolean(i, 0)
          case StringType => UTF8String.fromString(g.getString(i, 0))
          case dt => throw new IllegalStateException(s"unsupported scan type $dt")
        }
      i += 1
    }
    current = new GenericInternalRow(out)
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
