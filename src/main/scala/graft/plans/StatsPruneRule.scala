package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

/** File-level data-skipping as a Catalyst optimizer rule: once a footer
  * min/max stats index is REGISTERED for a parquet directory
  * ([[registerIndex]]), ANY filtered scan of that directory — however the
  * query was written, `Tables.t` included — is rewritten to list only the
  * files whose [min, max] range can intersect the filter's bounds on the
  * indexed column. This is X37's `StatsOps.prunedScan` promoted from an
  * opt-in call site to a plan-level service, the way Delta/Iceberg data
  * skipping hooks the optimizer rather than each query.
  *
  * Fail-open by construction, like the underlying index:
  *  - only conjunctive range/equality predicates on the indexed column are
  *    consulted (`OR`, UDFs, other columns ⇒ no pruning, full file list);
  *  - files with missing stats are always kept (the index stores null);
  *  - any unexpected shape or error leaves the plan untouched;
  *  - the rewrite only drops whole files the row-level predicate (still
  *    applied by Spark afterwards) provably eliminates, so results are
  *    identical to the unpruned scan — PlanSpec asserts both the file-count
  *    drop and result equality.
  *
  * Scale shape: the index itself is built ONCE per directory as a
  * distributed footer read (`StatsOps.footerStats` — O(files) metadata, no
  * data pages) and collected to a (file → min/max) map, file-count-sized —
  * the same class of driver-side state as a Delta log snapshot. The rule
  * runs on the driver during optimization and touches only that map.
  *
  * Injection uses `spark.experimental.extraOptimizations` (the public
  * post-optimizer hook), so it works on any live session with no
  * `spark.sql.extensions` config at startup.
  */
object StatsPruneRule extends Rule[LogicalPlan] {

  /** (canonical dir path) → (indexed column, file → (min, max) or null). */
  private val registry =
    new ConcurrentHashMap[String, (String, Map[String, Option[(Double, Double)]])]()

  /** Build (or reuse) the footer-stats index for `dir` on `column` and
    * enable plan-level pruning for every subsequent scan of `dir` in this
    * session. Idempotent; returns the number of indexed files. */
  def registerIndex(spark: SparkSession, dir: String, column: String): Int = {
    val key = canonical(dir)
    val entry = Option(registry.get(key)).filter(_._1 == column).getOrElse {
      val stats = graft.ops.StatsOps.footerStats(spark, dir, column).collect()
        .map { r =>
          val mm =
            if (r.isNullAt(2) || r.isNullAt(3)) None
            else Some((r.getDouble(2), r.getDouble(3)))
          canonical(r.getString(0)) -> mm
        }.toMap
      val e = (column, stats)
      registry.put(key, e)
      e
    }
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    entry._2.size
  }

  /** Drop `dir`'s index (scans revert to full listings). */
  def unregisterIndex(dir: String): Unit = registry.remove(canonical(dir)): Unit

  private def canonical(p: String): String = {
    val uri = new org.apache.hadoop.fs.Path(p).toUri
    // registration may use a relative path while FileIndex roots are fully
    // qualified (file:/abs/...): normalize both to an absolute local path
    if (uri.getScheme == null && !p.startsWith("/"))
      new java.io.File(p).getAbsolutePath
    else uri.getPath
  }

  /** Marker subclass so an already-pruned relation is never re-pruned. */
  private class PrunedFileIndex(
      spark: SparkSession,
      paths: Seq[org.apache.hadoop.fs.Path],
      schema: org.apache.spark.sql.types.StructType)
    extends InMemoryFileIndex(spark, paths, Map.empty, Some(schema))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, lr: LogicalRelation)
        if lr.relation.isInstanceOf[HadoopFsRelation] =>
      try prune(f, cond, lr) catch { case scala.util.control.NonFatal(_) => f }
  }

  private def prune(f: Filter, cond: Expression, lr: LogicalRelation): LogicalPlan = {
    val hfs = lr.relation.asInstanceOf[HadoopFsRelation]
    if (hfs.location.isInstanceOf[PrunedFileIndex]) return f
    if (hfs.partitionSchema.nonEmpty) return f // partition pruning owns those
    val roots = hfs.location.rootPaths
    if (roots.size != 1) return f
    val entry = Option(registry.get(canonical(roots.head.toString)))
    if (entry.isEmpty) return f
    val (column, stats) = entry.get
    val bounds = extractBounds(cond, column)
    if (bounds.isEmpty) return f
    val (lo, hi) = bounds.get
    val current = hfs.location.inputFiles
    val keep = current.filter { file =>
      stats.get(canonical(file)) match {
        case Some(Some((mn, mx))) => !(mx < lo || mn > hi)
        case _ => true // unknown file or no stats: fail open
      }
    }
    if (keep.length >= current.length) return f
    if (keep.isEmpty) {
      // an empty relation still needs a valid (empty) file index
      val empty = new PrunedFileIndex(hfs.sparkSession, Seq.empty, hfs.dataSchema)
      val rel = hfs.copy(location = empty)(hfs.sparkSession)
      return Filter(cond, lr.copy(relation = rel))
    }
    val idx = new PrunedFileIndex(hfs.sparkSession,
      keep.map(new org.apache.hadoop.fs.Path(_)).toSeq, hfs.dataSchema)
    Filter(cond, lr.copy(relation = hfs.copy(location = idx)(hfs.sparkSession)))
  }

  /** Conservative [lo, hi] bounds the conjuncts impose on `column`; None
    * when no usable conjunct exists. Only AND-composition narrows; any
    * non-range shape is simply ignored (its rows survive file pruning and
    * are filtered row-level as usual). */
  private def extractBounds(cond: Expression, column: String): Option[(Double, Double)] = {
    def num(l: Literal): Option[Double] = l.value match {
      case null => None
      case v: java.lang.Number => Some(v.doubleValue)
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case _ => None
    }
    // A cast can change the comparison's VALUE DOMAIN — DATE coerced to
    // TIMESTAMP compares micros against footer stats stored in days, and
    // a narrowing cast like `cast(v as int) = 5` truncates — so seeing
    // through an arbitrary Cast would derive bounds in the wrong domain
    // and prune files that actually match (wrong results, violating the
    // fail-open contract). Only exact value-preserving numeric widenings
    // are allowed through; anything else simply declines to prune.
    def exactWidening(from: org.apache.spark.sql.types.DataType,
        to: org.apache.spark.sql.types.DataType): Boolean = {
      import org.apache.spark.sql.types._
      def intRank(dt: DataType): Int = dt match {
        case ByteType => 1; case ShortType => 2
        case IntegerType => 3; case LongType => 4; case _ => -1
      }
      (from, to) match {
        case (f, t) if intRank(f) > 0 && intRank(t) > 0 =>
          intRank(t) >= intRank(f)
        // float's 24-bit mantissa holds every byte/short exactly, but NOT
        // every int/long — int→float rounds near 2^24 and could flip a
        // boundary comparison, so it stays excluded
        case (ByteType | ShortType, FloatType | DoubleType) => true
        case (IntegerType, DoubleType) => true
        case (FloatType, DoubleType) => true
        case _ => false
      }
    }
    def isCol(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == column
      case Cast(a: AttributeReference, to, _, _) if a.name == column =>
        exactWidening(a.dataType, to)
      case _ => false
    }
    def walk(e: Expression): Option[(Double, Double)] = e match {
      case And(l, r) =>
        (walk(l), walk(r)) match {
          case (Some((a, b)), Some((c, d))) => Some((math.max(a, c), math.min(b, d)))
          case (one @ Some(_), None) => one
          case (None, one) => one
        }
      case GreaterThanOrEqual(c, l: Literal) if isCol(c) =>
        num(l).map(v => (v, Double.PositiveInfinity))
      case GreaterThan(c, l: Literal) if isCol(c) =>
        num(l).map(v => (v, Double.PositiveInfinity))
      case LessThanOrEqual(c, l: Literal) if isCol(c) =>
        num(l).map(v => (Double.NegativeInfinity, v))
      case LessThan(c, l: Literal) if isCol(c) =>
        num(l).map(v => (Double.NegativeInfinity, v))
      case EqualTo(c, l: Literal) if isCol(c) => num(l).map(v => (v, v))
      // reversed operand order
      case GreaterThanOrEqual(l: Literal, c) if isCol(c) =>
        num(l).map(v => (Double.NegativeInfinity, v))
      case GreaterThan(l: Literal, c) if isCol(c) =>
        num(l).map(v => (Double.NegativeInfinity, v))
      case LessThanOrEqual(l: Literal, c) if isCol(c) =>
        num(l).map(v => (v, Double.PositiveInfinity))
      case LessThan(l: Literal, c) if isCol(c) =>
        num(l).map(v => (v, Double.PositiveInfinity))
      case EqualTo(l: Literal, c) if isCol(c) => num(l).map(v => (v, v))
      case _ => None
    }
    walk(cond)
  }
}
