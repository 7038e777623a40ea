package graft.lake

import org.apache.spark.sql.{sources => v1}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSet, Expression, Literal, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.{expressions => cexp}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Command, Filter, LocalRelation, LogicalPlan, Project, ReplaceData}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

/** Makes `SELECT … FROM lake.db.t` run at native speed (VERDICT r5
  * "What's wrong" #4): the DSv2 path bridges through a V1Scan whose
  * `buildScan()` returns `df.rdd` — every row pays InternalRow→Row→
  * InternalRow conversion and the scan sits outside whole-stage codegen.
  * This optimizer rule replaces each eligible lake-table relation with
  * the OPTIMIZED logical plan of [[LakeTable.read]] itself (the exact
  * plan DataFrame-API users get — optimized eagerly because batches
  * that already ran this pass, `ReplaceExpressions` in particular, will
  * not revisit the spliced subtree): vectorized parquet scans, MoR
  * anti-joins planned as real joins, whole-stage codegen end to end.
  *
  * Metadata-level pruning is preserved: when the relation sits directly
  * under a Filter, its conjuncts translate to data-source filters and
  * drive the same [[StatsPruning]] file skip + partition-value pruning
  * the bridged ScanBuilder performs — the filter itself stays in the
  * plan, so translation is pruning-only, never a correctness dependency.
  *
  * Eligibility is deliberately narrow; everything else keeps the V1
  * bridge, which remains the universal correctness path:
  *
  *  - the plan root must not be a [[Command]] — row-level DML plans
  *    (WriteDelta / ReplaceData from the analyzer rewrites) own their
  *    scans, with metadata columns and RowLevelOperationTable wrappers
  *    the rule must not disturb;
  *  - the relation's table must be a [[LakeV2Table]] with no pinned
  *    snapshot (time travel replays historical manifests verbatim);
  *  - the relation's output must be plain schema columns — a
  *    `_file_path` / `_pos` / `_row_id` metadata select stays on the
  *    bridge, which wires those through [[LakeTable.readWithCoords]].
  *
  * The session-principal grant gate runs here too — substitution must
  * not bypass the SELECT check the bridged ScanBuilder performs.
  */
case class NativeReadRule(session: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private def eligible(rel: DataSourceV2Relation): Option[LakeV2Table] =
    rel.table match {
      case t: LakeV2Table if t.pinned.isEmpty =>
        val cols = t.lakeTable.schema.fieldNames.toSet
        if (rel.output.forall(a => cols.contains(a.name))) Some(t) else None
      case _ => None
    }

  /** Grant gate identical to the bridged ScanBuilder's ([[Grants]]). */
  private def requireSelect(t: LakeV2Table): Unit =
    Grants.require(session, t.lakeTable, "SELECT")

  /** COUNT(*)/COUNT(1), non-distinct, unfiltered. */
  private def isCountStar(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case Count(Seq(Literal(1, _))) => true
      case _ => false
    })

  /** The relation under a bare count: direct, or behind an
    * attribute-only / empty Project (column pruning's residue), neither
    * of which changes the row count. */
  private object CountLeaf {
    def unapply(pl: LogicalPlan): Option[DataSourceV2Relation] = pl match {
      case rel: DataSourceV2Relation => Some(rel)
      case Project(ps, rel: DataSourceV2Relation)
          if ps.forall(_.isInstanceOf[Attribute]) => Some(rel)
      case _ => None
    }
  }

  /** MIN/MAX over a plain column reference, non-distinct, unfiltered.
    * @return (column name, isMin) */
  private def minMaxTarget(ae: AggregateExpression): Option[(String, Boolean)] =
    if (ae.isDistinct || ae.filter.isDefined) None
    else ae.aggregateFunction match {
      case org.apache.spark.sql.catalyst.expressions.aggregate
          .Min(a: Attribute) => Some((a.name, true))
      case org.apache.spark.sql.catalyst.expressions.aggregate
          .Max(a: Attribute) => Some((a.name, false))
      case _ => None
    }

  /** One metadata-exact value per aggregate expression, or None when any
    * of them needs a scan. */
  private def metadataAggValues(t: LakeV2Table,
      exprs: Seq[NamedExpression]): Option[Seq[Any]] = {
    val lake = t.lakeTable
    val schema = lake.schema
    import org.apache.spark.sql.types._
    def boundedType(dt: DataType): Boolean = dt match {
      // exact, NaN-free, non-truncated footer bounds only
      case ByteType | ShortType | IntegerType | LongType |
           DateType | TimestampType => true
      case _ => false
    }
    val values = exprs.map {
      case Alias(ae: AggregateExpression, _) if isCountStar(ae) =>
        if (lake.deleteFiles.exists(_.kind == "equality")) return None
        math.max(0L, lake.dataFiles.map(_.rowCount).sum -
          lake.deleteFiles.map(_.rowCount).sum)
      case Alias(ae: AggregateExpression, _)
          if minMaxTarget(ae).isDefined =>
        val (name, isMin) = minMaxTarget(ae).get
        if (lake.deleteFiles.nonEmpty) return None
        val f = schema.fields.find(_.name == name).getOrElse(return None)
        if (!boundedType(f.dataType)) return None
        val (lo, hi) = StatsPruning
          .globalBounds(f.dataType, lake.dataFiles, name).getOrElse(return None)
        StatsPruning.plannerValue(f.dataType, if (isMin) lo else hi)
          .getOrElse(return None)
      case _ => return None
    }
    Some(values)
  }

  /** Catalyst conjunct → v1 source filter, for the comparison shapes
    * [[StatsPruning.filePredicate]] understands (attr-vs-literal; values
    * stay in internal form — `render` accepts UTF8String/numerics and
    * conservatively ignores what it can't convert). Anything else → None
    * → that conjunct simply doesn't prune. Shared with the scoped-
    * maintenance path via [[SourceFilters]], so native scans and
    * `rewrite_data_files(where => …)` prune identically. */
  private def toSource(e: Expression): Option[v1.Filter] =
    SourceFilters.toSource(e)

  /** Metadata-level partition predicate from catalyst conjuncts.
    * Conjuncts translate to v1 filters through [[toSource]] (values stay
    * catalyst-internal — epoch-day Ints, UTF8Strings) and feed the same
    * [[PartitionPruning.predicate]] the bridged scan uses, which
    * normalizes both value domains before rendering. Transform-aware +
    * range-capable (M36): a `ts >= X` conjunct prunes `days(ts)`
    * partitions; an `id = k` prunes `bucket(N, id)`. */
  private def partitionPredicate(transforms: Seq[PartitionTransform],
      preds: Seq[Expression]): Map[String, String] => Boolean =
    PartitionPruning.predicate(transforms, preds.flatMap(toSource))

  /** read()'s optimized plan with predicate-driven metadata pruning,
    * projected and aliased onto the relation's exact output attributes
    * so every reference above keeps resolving. */
  private def substitute(t: LakeV2Table, output: Seq[Attribute],
      preds: Seq[Expression]): LogicalPlan = {
    requireSelect(t)
    val lake = t.lakeTable
    val translated = preds.flatMap(toSource)
    val plan = lake.read(
      partitionFilter = partitionPredicate(lake.transforms, preds),
      fileFilter = StatsPruning.filePredicate(lake.schema, translated))
      .queryExecution.optimizedPlan
    val byName = plan.output.map(a => a.name -> a).toMap
    val fields: Seq[NamedExpression] =
      output.map(a => Alias(byName(a.name), a.name)(exprId = a.exprId))
    Project(fields, plan)
  }

  /** CoW row-level DML (VERDICT r6 next #2): splice the target scan of a
    * group-based ReplaceData rewrite onto the native MoR-aware plan.
    * Group-based plans head for BatchScanExec, which the V1Scan bridge
    * cannot serve — so for copy-on-write tables this splice IS the scan
    * path, not just a fast path.
    *
    * The scope predicate is built here ONCE and handed to the operation
    * for its commit: the scan reads exactly the files the predicate
    * admits, and the commit swaps exactly those files for the written
    * output — shared predicate, provably identical scope. Conjuncts
    * referencing non-target columns (a MERGE condition constraining the
    * SOURCE side) never prune target files.
    *
    * Scope = metadata pruning ∩ matched-file discovery:
    *  1. partition + footer-stats pruning from the condition's
    *     target-column conjuncts (pure metadata, no I/O);
    *  2. an EAGER narrow discovery scan — the condition's deterministic
    *     target conjuncts filtered over the pruned files' live rows,
    *     projected to `__fp`, distinct, collected — yielding exactly the
    *     files that CONTAIN matching rows. This is Iceberg's runtime
    *     group filtering done at plan time (the V1-bridge engine can't
    *     host a DPP subquery), and the same affected-path pattern the
    *     dispatcher's cowRewrite uses: a 100 TB DELETE touching one file
    *     reads the table once narrow and rewrites that one file, instead
    *     of rewriting everything the stats couldn't bound. A conjunct
    *     SUBSET keeps discovery sound (matching-file superset); any
    *     discovery failure falls back to the metadata-only scope —
    *     conservative, never wrong. */
  private def spliceCowScan(cow: LakeCowRowLevelOperation,
      output: Seq[Attribute], conjuncts: Seq[Expression]): LogicalPlan = {
    val lake = cow.table
    Grants.require(session, lake, "SELECT") // same gate as the bridged scan
    val outSet = AttributeSet(output)
    val targetConjuncts = conjuncts.filter(_.references.subsetOf(outSet))
    val translated = targetConjuncts.flatMap(toSource)
    val partPred =
      partitionPredicate(lake.transforms, targetConjuncts)
    val statsPred = StatsPruning.filePredicate(lake.schema, translated)
    val pruned: DataFileMeta => Boolean =
      f => partPred(f.partitionValues) && statsPred(f)
    val scope = matchedFileScope(lake, targetConjuncts, pruned)
    cow.setScope(scope)
    val wantsRowIds = output.exists(_.name == LakeTable.RowIdCol)
    val base = lake.readWithCoords(withRowIds = wantsRowIds, fileFilter = scope)
    // v2 operations project `_file_path` (see requiredMetadataAttributes)
    val withMeta =
      if (output.exists(_.name == LakeV2Table.FilePathMeta))
        base.withColumn(LakeV2Table.FilePathMeta,
          org.apache.spark.sql.functions.col(LakeTable.FileCol))
      else base
    val plan = withMeta.queryExecution.optimizedPlan
    val byName = plan.output.map(a => a.name -> a).toMap
    val fields: Seq[NamedExpression] =
      output.map(a => Alias(byName(a.name), a.name)(exprId = a.exprId))
    Project(fields, plan)
  }

  /** Exact group scope for CoW DML: of the metadata-pruned files, keep
    * only those whose LIVE rows actually match the condition's usable
    * (deterministic, name-resolvable) conjuncts — one narrow discovery
    * scan through [[LakeTable.matchedFilePaths]], the same helper the
    * builder-path cowRewrite uses (shared live-row semantics and path
    * normalization). Any failure (unresolvable refs, subquery planning,
    * anything) falls back to the metadata-only predicate: a larger scope
    * is only extra rewrite work, never wrong.
    *
    * Skipped entirely when every usable conjunct references only
    * PARTITION columns: a file admitted by the partition predicate then
    * has ALL rows satisfying those conjuncts, so discovery could never
    * trim it — running it would read the scoped partitions once at plan
    * time just to return the same set, doubling I/O on exactly the
    * common partition-scoped DELETE (review r7). */
  private def matchedFileScope(lake: LakeTable,
      targetConjuncts: Seq[Expression],
      pruned: DataFileMeta => Boolean): DataFileMeta => Boolean = {
    val usable = targetConjuncts.filter(_.deterministic)
    if (usable.isEmpty) return pruned
    // IDENTITY partition columns only: a conjunct on a transformed
    // source (days(ts), bucket(N, id)) prunes at partition granularity,
    // so an admitted file may still contain zero matches — discovery
    // can genuinely trim there and must run (M36)
    val partCols = lake.transforms.collect {
      case t: PartitionTransforms.Identity => t.sourceCol
    }.toSet
    if (usable.forall(_.references.forall(a => partCols.contains(a.name))))
      return pruned
    scala.util.Try {
      // remap refs by NAME to unresolved attributes (the discovery
      // DataFrame resolves them against its own output; exprIds of the
      // DML relation don't carry over); refs outside the table schema
      // drop their conjunct — a conjunct subset stays superset-sound
      val fields = lake.schema.fieldNames.toSet
      val mappable = usable.filter(_.references.forall(a => fields.contains(a.name)))
      if (mappable.isEmpty) pruned
      else {
        val cond = org.apache.spark.sql.graft.ColumnBridge.column(
          mappable.map(_.transform { case a: Attribute =>
            org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              .quoted(a.name)
          }).reduce(cexp.And(_, _)))
        val paths = lake.matchedFilePaths(cond, lake.dataFiles.filter(pruned))
        (f: DataFileMeta) => pruned(f) && paths.contains(f.path)
      }
    }.getOrElse(pruned)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case rd: ReplaceData =>
      // Only the QUERY subtree is transformed: rd.table/originalTable are
      // fields, not children, so the RowLevelOperationTable the write
      // builder hangs off stays untouched.
      val conjuncts = splitConjunctivePredicates(rd.condition)
      rd.copy(query = rd.query.transform {
        case rel: DataSourceV2Relation =>
          NativeReadRule.rowLevelOperationOf(rel.table) match {
            case Some(cow: LakeCowRowLevelOperation) =>
              spliceCowScan(cow, rel.output, conjuncts)
            case _ => rel
          }
      })
    case _ if plan.isInstanceOf[Command] => plan
    case _ => plan.transformDownWithSubqueries {
      // Metadata-only aggregates (r10): a bare unfiltered
      // COUNT(*)/MIN/MAX combination over a lake table answers from file
      // metadata — manifests carry exact per-file row counts (position/
      // DV delete files carry exact distinct-position counts, the M37
      // writer contract) and parquet footers carry exact per-file column
      // bounds — as a driver-side LocalRelation, zero tasks at any table
      // size. Bails to the scan whenever metadata can't be exact:
      // equality deletes for counts; ANY delete for min/max (a deleted
      // row may hold the extremum); unbounded/missing footer stats
      // (all-null files, pre-default columns); float/double (NaN footer
      // semantics) and string (possible footer truncation) columns.
      // Filter/pinned/metadata-column shapes never match and scan.
      // Exactness gate: ExtensionsSpec differentials this path against
      // the scanning shapes on MoR tables.
      case agg @ Aggregate(Seq(), exprs, CountLeaf(rel), _)
          if exprs.nonEmpty && eligible(rel).isDefined =>
        metadataAggValues(eligible(rel).get, exprs) match {
          case Some(values) =>
            requireSelect(eligible(rel).get)
            LocalRelation(exprs.map(_.toAttribute),
              Seq(InternalRow(values: _*)))
          case None => agg // ineligible: children splice + scan
        }
      // Filter-adjacent shapes first (top-down): the conjuncts feed the
      // metadata prune; the Filter node itself is kept for exactness
      case Filter(cond, rel: DataSourceV2Relation) if eligible(rel).isDefined =>
        Filter(cond, substitute(eligible(rel).get, rel.output,
          splitConjunctivePredicates(cond)))
      case Filter(cond, Project(fields, rel: DataSourceV2Relation))
          if fields.forall(_.isInstanceOf[Attribute]) && eligible(rel).isDefined =>
        Filter(cond, Project(fields, substitute(eligible(rel).get, rel.output,
          splitConjunctivePredicates(cond))))
      case rel: DataSourceV2Relation if eligible(rel).isDefined =>
        substitute(eligible(rel).get, rel.output, Nil)
      // post-pushdown form, in case the rule ever runs after
      // V2ScanRelationPushDown (output already column-pruned)
      case sr: DataSourceV2ScanRelation if eligible(sr.relation).isDefined =>
        substitute(eligible(sr.relation).get, sr.output, Nil)
    }
  }
}

object NativeReadRule {
  /** Unwrap the [[org.apache.spark.sql.connector.write.RowLevelOperation]]
    * from Spark's RowLevelOperationTable wrapper. The wrapper case class
    * is `private[sql]` in Scala (invisible to this package) but its
    * accessor methods are JVM-public — one reflective call per DML
    * statement's relation, driver-side, planning-time only. */
  private[lake] def rowLevelOperationOf(
      t: org.apache.spark.sql.connector.catalog.Table): Option[AnyRef] =
    if (t.getClass.getName ==
        "org.apache.spark.sql.connector.write.RowLevelOperationTable")
      Some(t.getClass.getMethod("operation").invoke(t))
    else None
}
