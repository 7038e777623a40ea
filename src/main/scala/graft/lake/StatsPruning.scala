package graft.lake

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.column.statistics.{
  BinaryStatistics, DoubleStatistics, FloatStatistics, IntStatistics,
  LongStatistics}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** File-level data skipping on per-file column min/max (SURVEY P5's
  * metadata-pruning idea extended from partition values to value ranges —
  * the Iceberg `lower_bounds`/`upper_bounds` analogue).
  *
  * Collection reads only parquet FOOTERS (driver-side, per newly written
  * file — bounded by the commit's file count, same metadata scale as the
  * file listing itself). Skipping is strictly conservative: a file is
  * dropped only when its recorded bounds PROVE no row can match; missing
  * stats keep the file, and Spark re-applies every filter above the scan,
  * so pruning is never a correctness dependency. Parquet's own row-group
  * stats still prune within surviving files; this layer saves opening
  * files at all — the lever that matters at 100 TB file counts. */
object StatsPruning {

  /** Columns eligible for stats: totally ordered primitives whose string
    * rendering round-trips exactly, plus date/timestamp (compared on
    * their parquet physical epoch-day / epoch-micro values; INT96
    * legacy timestamps carry no usable stats and fall back to
    * conservative keep — write with
    * `spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS` to make
    * timestamp skipping effective). Decimals are skipped (physical
    * values need scale interpretation). */
  private def eligible(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | ShortType | ByteType |
         FloatType | DoubleType | StringType | BooleanType |
         DateType | TimestampType => true
    case _ => false
  }

  /** Everything `add_files` adoption needs from ONE footer open: the
    * file's own Spark-typed schema (per-file — adoption must gate each
    * file individually, not a sampled union), its exact row count, and
    * prunable column bounds. One `ParquetFileReader.open` per file keeps
    * the 100k-file onboarding path at 1× footer I/O instead of 3×. */
  case class FooterInfo(
      schema: StructType, rowCount: Long, stats: Map[String, ColStats])

  def readFooter(conf: Configuration, file: java.nio.file.Path,
      tableSchema: StructType): FooterInfo = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toUri), conf))
    try {
      val footer = reader.getFooter
      FooterInfo(
        // SQLConf.get (driver thread, active session) — the Configuration
        // constructor NPEs on absent spark.sql.parquet.* keys
        new org.apache.spark.sql.execution.datasources.parquet
          .ParquetToSparkSchemaConverter(
            org.apache.spark.sql.internal.SQLConf.get)
          .convert(footer.getFileMetaData.getSchema),
        footer.getBlocks.asScala.map(_.getRowCount).sum,
        statsOf(footer, tableSchema))
    } finally reader.close()
  }

  /** Footer-only stats collection for one written file. */
  def collectStats(
      conf: Configuration, file: java.nio.file.Path,
      schema: StructType): Map[String, ColStats] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toUri), conf))
    try statsOf(reader.getFooter, schema)
    finally reader.close()
  }

  private def statsOf(
      footer: org.apache.parquet.hadoop.metadata.ParquetMetadata,
      schema: StructType): Map[String, ColStats] = {
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    locally {
      val acc = scala.collection.mutable.Map[String, (String, String)]()
      var statless = Set.empty[String] // any chunk without stats → unknown
      // null counts accumulate independently of bounds AND of the
      // min/max type gate: a null is a null for every column type, so
      // IS [NOT] NULL skipping works on decimal/binary/nested-free
      // columns whose bounds are uninterpretable — only the count needs
      // the column name (ADVICE r8: the old accumulation sat inside the
      // eligible(dt) gate, silently disabling null skipping for those)
      val nullAcc = scala.collection.mutable.Map[String, Long]()
      var nullless = Set.empty[String] // any chunk without a count → unknown
      for {
        block <- footer.getBlocks.asScala
        chunk <- block.getColumns.asScala
        name = chunk.getPath.toDotString
        if byName.contains(name)
      } {
        val s = chunk.getStatistics
        if (s == null || !s.isNumNullsSet || s.getNumNulls < 0) nullless += name
        else nullAcc(name) = nullAcc.getOrElse(name, 0L) + s.getNumNulls
      }
      for {
        block <- footer.getBlocks.asScala
        chunk <- block.getColumns.asScala
        name = chunk.getPath.toDotString
        dt <- byName.get(name) if eligible(dt)
      } {
        val s = chunk.getStatistics
        // the statistics class must MATCH the Spark type's expected
        // physical encoding — e.g. an INT96 timestamp surfaces binary
        // stats whose bytes are not epoch-ordered; typed mismatches
        // classify as unknown, never as bounds
        val bounds: Option[(String, String)] = (dt, s) match {
          case (_, null) => None
          case (_, st) if !st.hasNonNullValue => None // all-null or no stats
          case (StringType, st: BinaryStatistics) =>
            Some((st.genericGetMin.toStringUsingUTF8,
              st.genericGetMax.toStringUsingUTF8))
          case (TimestampType, st: LongStatistics) => // epoch micros
            Some((String.valueOf(st.genericGetMin), String.valueOf(st.genericGetMax)))
          case (DateType, st: IntStatistics) => // epoch days
            Some((String.valueOf(st.genericGetMin), String.valueOf(st.genericGetMax)))
          // parquet-mr propagates NaN through min/max, so a file holding
          // {NaN, 1.0} can record lo=hi=NaN; NaN compares greater than
          // everything and would make skipping drop matching rows.
          // NaN-touched float/double bounds are unknowable → statless
          // (the reason Iceberg ignores float/double bounds entirely)
          case (_, st: FloatStatistics)
              if st.genericGetMin.isNaN || st.genericGetMax.isNaN => None
          case (_, st: DoubleStatistics)
              if st.genericGetMin.isNaN || st.genericGetMax.isNaN => None
          case (IntegerType | LongType | ShortType | ByteType |
                DoubleType | FloatType,
              st @ (_: IntStatistics | _: LongStatistics |
                    _: DoubleStatistics | _: FloatStatistics)) =>
            Some((String.valueOf(st.genericGetMin), String.valueOf(st.genericGetMax)))
          case _ => None
        }
        bounds match {
          case None => statless += name
          case Some((lo, hi)) =>
            val merged = acc.get(name) match {
              case None => (lo, hi)
              case Some((plo, phi)) =>
                (if (compare(dt, lo, plo) < 0) lo else plo,
                  if (compare(dt, hi, phi) > 0) hi else phi)
            }
            acc(name) = merged
        }
      }
      val bounds = (acc -- statless).map {
        case (n, (lo, hi)) => n -> (lo, hi)
      }.toMap
      val nulls = (nullAcc -- nullless).toMap
      (bounds.keySet ++ nulls.keySet).map { n =>
        val (lo, hi) = bounds.getOrElse(n, ("", ""))
        n -> ColStats(lo, hi,
          nulls = nulls.getOrElse(n, -1L),
          bounded = bounds.contains(n))
      }.toMap
    }
  }

  /** Scan-level [min, max] for a column: fold the per-file footer
    * bounds over exactly the files the scan will read. None when any
    * scanned file lacks usable bounds (conservative — a partial bound
    * could exclude live values and zero out a CBO selectivity). Feeds
    * the DSv2 column statistics (M50): NDV alone is useless to
    * FilterEstimation's equality path on numeric columns, which first
    * interval-checks the literal against [min, max]. */
  def globalBounds(dt: DataType, files: Seq[DataFileMeta],
      col: String): Option[(String, String)] = {
    if (!eligible(dt) || files.isEmpty) return None
    val bs = files.map(_.stats.get(col))
    if (bs.exists(b => b.isEmpty || !b.get.bounded)) return None
    val lt = Ordering.fromLessThan[String]((a, b) => compare(dt, a, b) < 0)
    Some((bs.map(_.get.min).min(lt), bs.map(_.get.max).max(lt)))
  }

  /** Footer-bound string → the value shape the CBO's estimators
    * consume (numeric-convertible; temporal bounds already carry their
    * physical epoch encoding). Strings pass through — the planner's
    * string interval is unbounded anyway — and unconvertible shapes
    * stay absent rather than wrong. */
  def plannerValue(dt: DataType, s: String): Option[Any] =
    try dt match {
      case ByteType => Some(s.toByte)
      case ShortType => Some(s.toShort)
      case IntegerType => Some(s.toInt)
      case LongType | TimestampType => Some(s.toLong)
      case DateType => Some(s.toInt)
      case FloatType => Some(s.toFloat)
      case DoubleType => Some(s.toDouble)
      case _ => None
    } catch { case _: NumberFormatException => None }

  private def compare(dt: DataType, a: String, b: String): Int = dt match {
    case StringType => a.compareTo(b)
    case BooleanType => a.toBoolean.compareTo(b.toBoolean)
    case FloatType | DoubleType => a.toDouble.compareTo(b.toDouble)
    case _ => a.toLong.compareTo(b.toLong) // byte/short/int/long
  }

  /** Render a pushed filter value into the stats' string domain —
    * temporal values convert to the same physical epoch units the
    * footer bounds use. Unconvertible shapes → None → no skip. */
  private def render(dt: DataType, v: Any): Option[String] = (dt, v) match {
    case (_, null) => None
    case (TimestampType, t: java.sql.Timestamp) =>
      Some((t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L).toString)
    case (TimestampType, i: java.time.Instant) =>
      Some((i.getEpochSecond * 1000000L + i.getNano / 1000L).toString)
    case (TimestampType, _) => None
    case (DateType, d: java.sql.Date) => Some(d.toLocalDate.toEpochDay.toString)
    case (DateType, ld: java.time.LocalDate) => Some(ld.toEpochDay.toString)
    case (DateType, _) => None
    case (_, s: org.apache.spark.unsafe.types.UTF8String) => Some(s.toString)
    case (_, other) => Some(other.toString)
  }

  /** File-skip predicate from pushed source filters. Only constraints
    * that can PROVE emptiness against [min, max] are used:
    * EqualTo/In/ranges on stats-eligible top-level columns. Everything
    * else keeps the file. */
  def filePredicate(
      schema: StructType, filters: Seq[Filter]): DataFileMeta => Boolean = {
    val types = schema.fields.map(f => f.name -> f.dataType).toMap

    def dtOf(c: String): Option[DataType] = types.get(c).filter(eligible)

    // (column, survives-given-bounds) checks compiled once per scan
    val checks: Seq[(String, DataType, (String, String) => Boolean)] =
      filters.flatMap {
        case EqualTo(c, v) => for (dt <- dtOf(c); s <- render(dt, v))
          yield (c, dt, (lo: String, hi: String) =>
            compare(dt, s, lo) >= 0 && compare(dt, s, hi) <= 0)
        case In(c, vs) => for (dt <- dtOf(c)) yield {
          val ss = vs.toSeq.flatMap(render(dt, _))
          (c, dt, (lo: String, hi: String) => ss.isEmpty || ss.exists(s =>
            compare(dt, s, lo) >= 0 && compare(dt, s, hi) <= 0))
        }
        case GreaterThan(c, v) => for (dt <- dtOf(c); s <- render(dt, v))
          yield (c, dt, (_: String, hi: String) => compare(dt, hi, s) > 0)
        case GreaterThanOrEqual(c, v) => for (dt <- dtOf(c); s <- render(dt, v))
          yield (c, dt, (_: String, hi: String) => compare(dt, hi, s) >= 0)
        case LessThan(c, v) => for (dt <- dtOf(c); s <- render(dt, v))
          yield (c, dt, (lo: String, _: String) => compare(dt, lo, s) < 0)
        case LessThanOrEqual(c, v) => for (dt <- dtOf(c); s <- render(dt, v))
          yield (c, dt, (lo: String, _: String) => compare(dt, lo, s) <= 0)
        case _ => None // unsupported shapes never skip
      }

    // null-count checks are independent of bounds and of type
    // eligibility (a null count is decisive for ANY column type):
    // IS NULL skips a file with zero nulls; IS NOT NULL skips a file
    // that is entirely null for the column (rowCount on the file meta)
    val nullChecks: Seq[(String, (Long, Long) => Boolean)] = filters.collect {
      case IsNull(c) => (c, (nulls: Long, _: Long) => nulls > 0)
      case IsNotNull(c) => (c, (nulls: Long, rows: Long) => nulls < rows)
    }

    f => checks.forall { case (c, _, survives) =>
      f.stats.get(c) match {
        case None => true // unknown bounds → conservative keep
        case Some(cs) if !cs.bounded => true // null-count-only entry
        case Some(ColStats(lo, hi, _, _)) => survives(lo, hi)
      }
    } && nullChecks.forall { case (c, survives) =>
      f.stats.get(c) match {
        case Some(cs) if cs.nulls >= 0 => survives(cs.nulls, f.rowCount)
        case _ => true // unknown null count → conservative keep
      }
    }
  }
}
