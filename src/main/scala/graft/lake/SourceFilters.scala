package graft.lake

import org.apache.spark.sql.{sources => v1}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, Literal}
import org.apache.spark.sql.catalyst.{expressions => cexp}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}

/** Catalyst-conjunct → v1 source-filter bridge, shared by every consumer
  * of metadata-level pruning that starts from a catalyst predicate:
  * [[NativeReadRule]] (native SQL scans) and [[Procedures]]'
  * `rewrite_data_files(where => …)` scope. One translator means native
  * scans and scoped maintenance can never disagree about what a
  * predicate prunes. */
private[lake] object SourceFilters {

  /** Comparison shapes [[StatsPruning.filePredicate]] understands
    * (attr-vs-literal; values stay in catalyst-internal form — `render`
    * accepts UTF8String/numerics and conservatively ignores what it
    * can't convert). Anything else → None → that conjunct simply
    * doesn't prune. */
  def toSource(e: Expression): Option[v1.Filter] = e match {
    case cexp.EqualTo(a: Attribute, Literal(v, _)) => Some(v1.EqualTo(a.name, v))
    case cexp.EqualTo(Literal(v, _), a: Attribute) => Some(v1.EqualTo(a.name, v))
    case cexp.GreaterThan(a: Attribute, Literal(v, _)) => Some(v1.GreaterThan(a.name, v))
    case cexp.GreaterThan(Literal(v, _), a: Attribute) => Some(v1.LessThan(a.name, v))
    case cexp.GreaterThanOrEqual(a: Attribute, Literal(v, _)) => Some(v1.GreaterThanOrEqual(a.name, v))
    case cexp.GreaterThanOrEqual(Literal(v, _), a: Attribute) => Some(v1.LessThanOrEqual(a.name, v))
    case cexp.LessThan(a: Attribute, Literal(v, _)) => Some(v1.LessThan(a.name, v))
    case cexp.LessThan(Literal(v, _), a: Attribute) => Some(v1.GreaterThan(a.name, v))
    case cexp.LessThanOrEqual(a: Attribute, Literal(v, _)) => Some(v1.LessThanOrEqual(a.name, v))
    case cexp.LessThanOrEqual(Literal(v, _), a: Attribute) => Some(v1.GreaterThanOrEqual(a.name, v))
    case cexp.In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      Some(v1.In(a.name, vs.map(_.asInstanceOf[Literal].value).toArray))
    // null checks prune via footer null counts (IS NULL skips null-free
    // files; IS NOT NULL skips all-null files) — partition pruning
    // ignores them, StatsPruning consumes them
    case cexp.IsNull(a: Attribute) => Some(v1.IsNull(a.name))
    case cexp.IsNotNull(a: Attribute) => Some(v1.IsNotNull(a.name))
    case _ => None
  }

  /** Top-level AND split (the conjuncts feed [[toSource]] one by one, so
    * an untranslatable conjunct costs only its own pruning power). */
  def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case cexp.And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Conservative MIGHT-MATCH file predicate for a SQL predicate text:
    * the files that partition pruning (transform-aware) plus footer-
    * stats skipping cannot prove empty for `where`. The predicate is
    * analyzed against the table's own scan, so names resolve with the
    * engine's case rules and a typo fails loudly here, not silently
    * matching nothing. Used to SCOPE maintenance — the returned set is a
    * superset of the files containing matches, which is the only sound
    * direction for a partial rewrite. */
  def scopePredicate(t: LakeTable, where: String): DataFileMeta => Boolean = {
    val analyzed = t.read().filter(where).queryExecution.analyzed
    val cond = analyzed.collectFirst { case f: LFilter => f.condition }
      .getOrElse(throw new IllegalArgumentException(
        s"rewrite scope: cannot extract a predicate from '$where'"))
    val translated = splitConjuncts(cond).flatMap(toSource)
    val partPred = PartitionPruning.predicate(t.transforms, translated)
    val statsPred = StatsPruning.filePredicate(t.schema, translated)
    f => partPred(f.partitionValues) && statsPred(f)
  }
}
