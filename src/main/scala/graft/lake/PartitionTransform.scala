package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{
  BoundReference, Cast, DateFormatClass, Expression, Literal, Pmod, Subtract,
  Substring, XxHash64}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hidden partitioning — Iceberg-style partition TRANSFORMS (M36).
  *
  * A partition-spec entry is either a plain column name (identity, the
  * only form rounds 1-6 supported and the only form the reference's own
  * DDL uses — `create_demo_table.py:117` `PARTITIONED BY (category)`) or
  * a transform over a source column:
  *
  *   - `bucket(N, col)`   — `pmod(xxhash64(col), N)`; point-lookup
  *                          pruning min/max stats can never provide
  *   - `truncate(W, col)` — integral floor-to-W / string W-prefix
  *   - `years(ts)` `months(ts)` `days(ts)` `hours(ts)` — calendar
  *                          buckets of a timestamp/date, rendered in UTC
  *                          (Iceberg defines time transforms in UTC;
  *                          pinning it makes write, prune and DML-render
  *                          agree regardless of session time zone)
  *
  * The POINT of hidden partitioning at 100 TB: the user predicates on the
  * SOURCE column (`WHERE ts >= X`, `WHERE id = 42`) and the engine prunes
  * transformed partitions — nobody has to know (or get wrong) the layout.
  *
  * One catalyst expression tree ([[PartitionTransform.valueExpr]]) is the
  * single source of truth for the transform's rendered value, evaluated
  * in all three places that MUST agree byte-for-byte or pruning silently
  * drops matching files:
  *   - the dispatcher write path (as a Column over the source column),
  *   - the executor-side DML writers (interpreted eval over a
  *     [[BoundReference]] per row — [[PartitionRender]]),
  *   - prune time (eval over a [[Literal]] of the predicate's value).
  *
  * Range pruning: every transform except `bucket` is monotone
  * non-decreasing in its source value, so `src >= v` admits exactly the
  * partitions with `T(pv) >= T(v)` (strict bounds widen to >= / <= at
  * partition granularity). Fixed-width digit renderings (time transforms)
  * and string prefixes compare lexicographically; integral truncation
  * compares numerically after a parse-back.
  */
sealed trait PartitionTransform extends Serializable {
  /** Canonical spec string as stored in table metadata. */
  def spec: String
  /** The source (data) column the transform reads. */
  def sourceCol: String
  /** Source column type, resolved against the table schema. */
  def sourceType: DataType
  /** Partition-value key recorded in file metadata / hive paths.
    * Identity keeps the bare column name (backward compatible with every
    * pre-M36 table); transforms suffix it so a spec may carry both
    * `days(ts)` and `bucket(8, ts)` without colliding. */
  def fieldName: String

  /** STRING-typed catalyst expression rendering the partition value from
    * `child` (the source column / a literal of its type). `null` result
    * = hive default partition. Identity overrides the whole pipeline
    * instead (native values, the pre-M36 rendering, kept bit-compatible
    * with existing tables). */
  private[lake] def valueExpr(child: Expression): Expression

  /** Write-side partition-value column. */
  def writeColumn(src: Column): Column =
    ColumnBridge.column(valueExpr(ColumnBridge.expression(src)))

  /** Driver-side transform of a predicate literal (either value domain —
    * v1-external java types or catalyst-internal) to the rendered
    * partition value. None = can't render ⇒ the constraint doesn't
    * prune through this transform. */
  def eqValue(v: Any): Option[String] =
    PartitionTransform.toInternal(v, sourceType).flatMap { iv =>
      val r = valueExpr(Literal.create(iv, sourceType)).eval(null)
      Option(r).map(_.toString)
    }

  /** Monotone-range admit test: for `src <op> v`, the rendered partition
    * values that may contain matching rows. None = this transform can't
    * prune ranges (bucket) or the value can't render. `op` ∈
    * {">", ">=", "<", "<="}. */
  def rangeAllowed(op: String, v: Any): Option[String => Boolean] = {
    val cmp = rangeCompare
    if (cmp == null) None
    else eqValue(v).map { bound =>
      val lower = op == ">" || op == ">="
      pv =>
        pv != PartitionRender.HiveDefault &&
          (if (lower) cmp(pv, bound) >= 0 else cmp(pv, bound) <= 0)
    }
  }

  /** Partition-value comparator for range pruning; null = unordered
    * under this transform (bucket). */
  protected def rangeCompare: (String, String) => Int
}

object PartitionTransform {
  import PartitionTransforms._

  /** Spec grammar: `name`, `bucket(N, col)`, `truncate(W, col)`,
    * `years|months|days|hours(col)`. */
  private val Fn = """(?i)^(bucket|truncate|years|months|days|hours)\s*\((.*)\)$""".r

  /** Parse + resolve one spec entry against the table schema. Rejects
    * unknown columns, type-incompatible transforms and (via [[parseAll]])
    * field-name collisions — catching them at DDL time, not as silently
    * unprunable partitions. */
  def parse(spec: String, schema: StructType): PartitionTransform = {
    def field(c: String): StructField =
      schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"partition column $c not in schema"))
    def integral(dt: DataType) = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    spec.trim match {
      case Fn(name, args) =>
        val parts = args.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        name.toLowerCase match {
          case "bucket" =>
            require(parts.length == 2 && parts.head.forall(_.isDigit),
              s"bucket(N, col) expected, got: $spec")
            val (n, c) = (parts.head.toInt, parts(1))
            require(n > 0, s"bucket count must be positive: $spec")
            val f = field(c)
            require(integral(f.dataType) || f.dataType == StringType ||
              f.dataType == DateType || f.dataType == TimestampType ||
              f.dataType == TimestampNTZType,
              s"bucket over ${f.dataType.simpleString} not supported: $spec")
            Bucket(n, c, f.dataType)
          case "truncate" =>
            require(parts.length == 2 && parts.head.forall(_.isDigit),
              s"truncate(W, col) expected, got: $spec")
            val (w, c) = (parts.head.toInt, parts(1))
            require(w > 0, s"truncate width must be positive: $spec")
            val f = field(c)
            require(integral(f.dataType) || f.dataType == StringType,
              s"truncate over ${f.dataType.simpleString} not supported: $spec")
            Truncate(w, c, f.dataType)
          case t @ ("years" | "months" | "days" | "hours") =>
            require(parts.length == 1, s"$t(col) expected, got: $spec")
            val f = field(parts.head)
            require(f.dataType == TimestampType ||
              f.dataType == TimestampNTZType ||
              (f.dataType == DateType && t != "hours"),
              s"$t over ${f.dataType.simpleString} not supported: $spec")
            Time(t, parts.head, f.dataType)
        }
      case c =>
        Identity(c, field(c).dataType)
    }
  }

  /** Parse a full spec; enforces unique field names that don't shadow
    * data columns (a transform field named like a column would make
    * pruning ambiguous). */
  def parseAll(specs: Seq[String], schema: StructType): Seq[PartitionTransform] = {
    val ts = specs.map(parse(_, schema))
    val names = ts.map(_.fieldName)
    require(names.distinct.size == names.size,
      s"duplicate partition field names in spec: ${specs.mkString(", ")}")
    ts.filterNot(_.isInstanceOf[Identity]).foreach { t =>
      require(!schema.fieldNames.contains(t.fieldName),
        s"partition field ${t.fieldName} collides with a data column")
    }
    ts
  }

  /** Predicate-literal normalization to catalyst-internal form, total
    * over BOTH value domains a constraint can arrive in (v1-external
    * java types from the bridged ScanBuilder, catalyst-internal from
    * NativeReadRule's conjuncts) — the same dual-domain contract
    * [[PartitionFilterValues]] documents. None ⇒ no prune. */
  private[lake] def toInternal(v: Any, dt: DataType): Option[Any] = (dt, v) match {
    case (_, null) => None
    case (StringType, s: String) => Some(UTF8String.fromString(s))
    case (StringType, s: UTF8String) => Some(s)
    case (ByteType, n: java.lang.Byte) => Some(n.byteValue)
    case (ShortType, n: java.lang.Short) => Some(n.shortValue)
    case (IntegerType, n: java.lang.Integer) => Some(n.intValue)
    case (LongType, n: java.lang.Long) => Some(n.longValue)
    case (BooleanType, b: java.lang.Boolean) => Some(b.booleanValue)
    case (DateType, d: java.sql.Date) => Some(DateTimeUtils.fromJavaDate(d))
    case (DateType, d: java.time.LocalDate) => Some(DateTimeUtils.localDateToDays(d))
    case (DateType, n: java.lang.Integer) => Some(n.intValue) // internal epoch-day
    case (TimestampType, t: java.sql.Timestamp) => Some(DateTimeUtils.fromJavaTimestamp(t))
    case (TimestampType, i: java.time.Instant) => Some(DateTimeUtils.instantToMicros(i))
    case (TimestampType, n: java.lang.Long) => Some(n.longValue) // internal micros
    // NTZ: wall-clock micros; a java.sql.Timestamp constraint contributes
    // its local wall time (the reading Spark gives an NTZ comparison)
    case (TimestampNTZType, t: java.time.LocalDateTime) =>
      Some(DateTimeUtils.localDateTimeToMicros(t))
    case (TimestampNTZType, t: java.sql.Timestamp) =>
      Some(DateTimeUtils.localDateTimeToMicros(t.toLocalDateTime))
    case (TimestampNTZType, n: java.lang.Long) => Some(n.longValue)
    case _ => None
  }
}

private[lake] object PartitionTransforms {
  private def numericCmp(a: String, b: String): Int =
    java.lang.Long.compare(a.toLong, b.toLong)
  private def stringCmp(a: String, b: String): Int = a.compareTo(b)

  /** Identity keeps the ENTIRE pre-M36 pipeline: native-typed write
    * column (hive-path rendering), [[PartitionFilterValues]] literal
    * rendering, [[PartitionRender]]'s typed per-row renderers. valueExpr
    * is never consulted. Range compare: integral numerically; string and
    * ISO-rendered dates lexicographically; booleans and everything
    * unrendered are unordered. */
  final case class Identity(sourceCol: String, sourceType: DataType)
      extends PartitionTransform {
    def spec: String = sourceCol
    def fieldName: String = sourceCol
    private[lake] def valueExpr(child: Expression): Expression = child
    override def writeColumn(src: Column): Column = src
    override def eqValue(v: Any): Option[String] =
      PartitionTransform.toInternal(v, sourceType)
        .flatMap(PartitionFilterValues.internal(_, sourceType))
    protected def rangeCompare: (String, String) => Int = sourceType match {
      case ByteType | ShortType | IntegerType | LongType => numericCmp
      case StringType | DateType => stringCmp
      case _ => null
    }
  }

  /** `pmod(xxhash64(col), n)` — seed 42, identical to
    * `functions.xxhash64`. A null source hashes to the seed (not null),
    * so null rows land in a regular bucket on every path alike. Only
    * point predicates prune (a hash destroys order). */
  final case class Bucket(n: Int, sourceCol: String, sourceType: DataType)
      extends PartitionTransform {
    def spec: String = s"bucket($n,$sourceCol)"
    def fieldName: String = s"${sourceCol}_bucket"
    private[lake] def valueExpr(child: Expression): Expression =
      Cast(Pmod(XxHash64(Seq(child), 42L), Literal(n.toLong)), StringType)
    protected def rangeCompare: (String, String) => Int = null
  }

  /** Integral floor-to-width (`v - pmod(v, w)`, floor for negatives) or
    * string W-prefix. Both monotone: integral compares numerically after
    * parse-back, prefixes lexicographically. */
  final case class Truncate(w: Int, sourceCol: String, sourceType: DataType)
      extends PartitionTransform {
    def spec: String = s"truncate($w,$sourceCol)"
    def fieldName: String = s"${sourceCol}_trunc"
    private[lake] def valueExpr(child: Expression): Expression = sourceType match {
      case StringType => Substring(child, Literal(1), Literal(w))
      case dt =>
        val width = Cast(Literal(w), dt)
        Cast(Subtract(child, Pmod(child, width)), StringType)
    }
    protected def rangeCompare: (String, String) => Int = sourceType match {
      case StringType => stringCmp
      case _ => numericCmp
    }
  }

  /** Calendar buckets rendered as fixed-width UTC date strings —
    * "2026" / "2026-08" / "2026-08-13" / "2026-08-13-07" — which makes
    * lexicographic order THE calendar order, so range pruning is a
    * string compare. DateType sources cast to timestamp at UTC first
    * (a date has no zone; UTC keeps the rendered day identical). */
  final case class Time(unit: String, sourceCol: String, sourceType: DataType)
      extends PartitionTransform {
    def spec: String = s"$unit($sourceCol)"
    def fieldName: String = s"${sourceCol}_${unit.stripSuffix("s")}"
    private val pattern = unit match {
      case "years" => "yyyy"
      case "months" => "yyyy-MM"
      case "days" => "yyyy-MM-dd"
      case "hours" => "yyyy-MM-dd-HH"
    }
    private[lake] def valueExpr(child: Expression): Expression = {
      // dates and NTZ wall-clock timestamps cast to instant-typed at UTC
      // (no zone shift — the rendered calendar fields are the stored
      // ones); instant timestamps format at UTC directly
      val ts =
        if (sourceType == TimestampType) child
        else Cast(child, TimestampType, Some("UTC"))
      DateFormatClass(ts, Literal(pattern), Some("UTC"))
    }
    protected def rangeCompare: (String, String) => Int = stringCmp
  }
}

/** Shared metadata-level partition pruning over a parsed transform spec —
  * ONE pure function of (filters, partition values) used by the bridged
  * ScanBuilder, NativeReadRule's splice AND the CoW group scope, so every
  * path prunes identically (the "same pure function" contract
  * [[LakeV2Table.partitionPredicate]] documented, now transform-aware).
  *
  * A constraint on source column c applies through EVERY transform over
  * c (`days(ts)` and `bucket(8, ts)` both narrow a `ts = v` lookup). A
  * file with no recorded value for a constrained field always survives
  * (pre-evolution files, unrenderable writes — conservative, rows are
  * re-filtered above the scan). A value that fails to render through a
  * transform simply doesn't prune through it; an IN-list prunes only if
  * EVERY element renders (pruning on a renderable subset would drop
  * files matching the others). Range predicates prune through monotone
  * transforms only — new in M36; identity partitions gain range pruning
  * from the same mechanism. */
private[lake] object PartitionPruning {
  import org.apache.spark.sql.sources._

  /** Build the admit predicate from v1 source filters. Filter values may
    * be in either value domain (external from pushdown, internal from
    * NativeReadRule's conjunct translation) — [[PartitionTransform
    * .toInternal]] normalizes both. */
  def predicate(transforms: Seq[PartitionTransform],
      filters: Seq[Filter]): Map[String, String] => Boolean = {
    if (transforms.isEmpty) return _ => true
    val byCol = transforms.groupBy(_.sourceCol)
    // fieldName -> admit(pv); a file must satisfy every constraint whose
    // field it records
    val constraints: Seq[(String, String => Boolean)] = filters.flatMap {
      case EqualTo(c, v) => byCol.getOrElse(c, Nil).flatMap { t =>
        t.eqValue(v).map(s => t.fieldName -> ((pv: String) => pv == s))
      }
      case In(c, vs) => byCol.getOrElse(c, Nil).flatMap { t =>
        val rendered = vs.toSeq.map(t.eqValue)
        if (rendered.exists(_.isEmpty)) None
        else {
          val allowed = rendered.flatten.toSet
          Some(t.fieldName -> ((pv: String) => allowed.contains(pv)))
        }
      }
      case GreaterThan(c, v) => range(byCol, c, ">", v)
      case GreaterThanOrEqual(c, v) => range(byCol, c, ">=", v)
      case LessThan(c, v) => range(byCol, c, "<", v)
      case LessThanOrEqual(c, v) => range(byCol, c, "<=", v)
      case _ => Nil
    }
    if (constraints.isEmpty) _ => true
    else pv => constraints.forall { case (f, admit) => pv.get(f).forall(admit) }
  }

  private def range(byCol: Map[String, Seq[PartitionTransform]], c: String,
      op: String, v: Any): Seq[(String, String => Boolean)] =
    byCol.getOrElse(c, Nil).flatMap { t =>
      t.rangeAllowed(op, v).map(t.fieldName -> _)
    }
}
