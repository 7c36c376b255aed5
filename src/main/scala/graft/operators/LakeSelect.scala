package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declarative index-accelerated lake reads: give [[readWhere]] a table
  * and a SQL predicate, and it picks the best pruning path the log's
  * indexes support — the user never chooses an index by hand (the
  * reference's stance: every read is a declarative SQL statement; the
  * engine owns the physical plan).
  *
  * Strategy order, most selective first:
  *  1. equality/IN on the bloom-indexed column → [[TableLog.
  *     readPointLookup]] (bloom prunes FILES, row-group stats prune
  *     inside the kept ones);
  *  2. TWO OR MORE prunable conjuncts → [[TableLog.
  *     readRowGroupPrunedMulti]]: every constraint's keep set
  *     intersects and the scan runs once — the z-order payoff (a
  *     2-column clustered table prunes on both predicate columns);
  *  3. equality/IN on any column → [[TableLog.readRowGroupPrunedIn]]
  *     (row-group zone stats only);
  *  4. range on any column → [[TableLog.readRowGroupPruned]] /
  *     `...String` (single-bound numeric ranges widen the missing side;
  *     string bounds stay exact through optional-bound scans).
  *
  * Only top-level AND-ed conjuncts of the forms `col = lit`,
  * `col IN (lits…)`, `col <cmp> lit` (either operand order, integral or
  * string literals) contribute to pruning; everything else — OR trees,
  * casts, functions, floating-point literals — is simply not prunable
  * and rides along. The FULL predicate is always re-applied on top of
  * the pruned frame, so an unprunable (or mis-typed) conjunct can never
  * change results, only pruning power: the conservative-keep contract
  * every skipping path in this engine follows.
  *
  * Scale shape: everything here is driver-side predicate analysis over
  * O(conjuncts); the heavy lifting stays in the underlying pruned reads
  * (footer-only distributed indexes, selective row-group scans).
  */
object LakeSelect {

  /** What a [[readWhere]] actually did — for plan assertions and ops
    * introspection. `strategy` ∈ point_lookup | rowgroup_multi |
    * rowgroup_in | rowgroup_range | full_scan. */
  final case class Stats(strategy: String, column: Option[String],
      rgOpened: Long, rgTotal: Long, filesOpened: Int, filesTotal: Int)

  private[operators] sealed trait Constraint
  private[operators] final case class EqIn(values: Seq[Any])
    extends Constraint
  private[operators] final case class Range(lo: Option[Any],
      hi: Option[Any]) extends Constraint

  /** Read `dir` filtered by `predicate` (any Spark SQL boolean
    * expression over the table's columns), routed through the most
    * selective index available. Returns the FILTERED frame plus the
    * pruning stats. */
  def readWhere(spark: SparkSession, dir: String, predicate: String,
      version: Int = -1, columns: Seq[String] = Nil)
      : (DataFrame, Stats) = {
    import org.apache.spark.sql.functions.{col, expr}
    val constraints = analyze(spark, predicate)
    val snap = TableLog.snapshot(dir, version)
    val bloomed = snap.bloomCol
    // projection pushdown: the SCAN must still carry every column the
    // predicate references (the exact filter re-applies on top), so
    // widen the pushed set by the predicate's attributes and trim back
    // to the caller's columns at the end
    val predCols = referencedColumns(spark, predicate)
    val scanCols =
      if (columns.isEmpty) Nil
      else (columns ++ predCols.filterNot(columns.contains)).toList

    def isStringVals(vs: Seq[Any]) = vs.forall(_.isInstanceOf[String])
    def isLongVals(vs: Seq[Any]) = vs.forall(_.isInstanceOf[Long])

    // candidate = (column, constraint) in priority order; contradictory
    // equalities intersect to an EMPTY probe set — not a usable index
    // probe, and the re-applied predicate makes the result empty anyway
    val eqCols = constraints.collect {
      case (c, e: EqIn) if e.values.nonEmpty => (c, e)
    }
    val bloomEq = eqCols.find { case (c, e) =>
      bloomed.contains(c) &&
        (isLongVals(e.values) || isStringVals(e.values))
    }
    val anyEq = eqCols.find { case (_, e) =>
      isLongVals(e.values) || isStringVals(e.values)
    }
    val anyRange = constraints.collectFirst {
      case (c, r: Range) if {
        val bs = r.lo.toSeq ++ r.hi.toSeq
        bs.nonEmpty && (bs.forall(_.isInstanceOf[Long]) ||
          bs.forall(_.isInstanceOf[String]))
      } => (c, r)
    }

    // every prunable conjunct as a row-group constraint — when two or
    // more columns prune, their keep sets INTERSECT and the scan runs
    // once (the z-order payoff: a 2-column clustered table prunes on
    // both predicate columns)
    val rgConstraints: Seq[TableLog.RgConstraint] =
      constraints.flatMap {
        case (c, e: EqIn) if e.values.nonEmpty && isLongVals(e.values) =>
          Some(TableLog.NumIn(c, e.values.map(_.asInstanceOf[Long])))
        case (c, e: EqIn)
            if e.values.nonEmpty && isStringVals(e.values) =>
          Some(TableLog.StrIn(c, e.values.map(_.asInstanceOf[String])))
        case (c, r: Range) =>
          val bs = r.lo.toSeq ++ r.hi.toSeq
          if (bs.isEmpty) None
          else if (bs.forall(_.isInstanceOf[Long]))
            Some(TableLog.NumRange(c, r.lo.map(_.asInstanceOf[Long]),
              r.hi.map(_.asInstanceOf[Long])))
          else if (bs.forall(_.isInstanceOf[String]))
            Some(TableLog.StrRange(c, r.lo.map(_.asInstanceOf[String]),
              r.hi.map(_.asInstanceOf[String])))
          else None
        case _ => None
      }

    val (df0, stats) = (bloomEq, anyEq, anyRange) match {
      case (Some((c, e)), _, _) =>
        val (df, rgo, rgt, fo, ft) =
          TableLog.readPointLookup(spark, dir, c, e.values, version,
            scanCols)
        (df, Stats("point_lookup", Some(c), rgo, rgt, fo, ft))
      case (None, _, _) if rgConstraints.size >= 2 =>
        val (df, rgo, rgt, fo, ft) = TableLog.readRowGroupPrunedMulti(
          spark, dir, rgConstraints, version, scanCols)
        (df, Stats("rowgroup_multi",
          Some(rgConstraints.map(_.column).distinct.mkString(",")),
          rgo, rgt, fo, ft))
      case (None, Some((c, e)), _) if isLongVals(e.values) =>
        val (df, rgo, rgt, fo, ft) = TableLog.readRowGroupPrunedIn(
          spark, dir, c, e.values.map(_.asInstanceOf[Long]), version,
          scanCols)
        (df, Stats("rowgroup_in", Some(c), rgo, rgt, fo, ft))
      case (None, Some((c, e)), _) =>
        val (df, rgo, rgt, fo, ft) = TableLog.readRowGroupPrunedInString(
          spark, dir, c, e.values.map(_.asInstanceOf[String]), version,
          scanCols)
        (df, Stats("rowgroup_in", Some(c), rgo, rgt, fo, ft))
      case (None, None, Some((c, r)))
          if r.lo.orElse(r.hi).exists(_.isInstanceOf[Long]) =>
        val lo = r.lo.map(_.asInstanceOf[Long]).getOrElse(Long.MinValue)
        val hi = r.hi.map(_.asInstanceOf[Long]).getOrElse(Long.MaxValue)
        val (df, rgo, rgt, fo, ft) =
          TableLog.readRowGroupPruned(spark, dir, c, lo, hi, version,
            scanCols)
        (df, Stats("rowgroup_range", Some(c), rgo, rgt, fo, ft))
      case (None, None, Some((c, r)))
          if r.lo.orElse(r.hi).exists(_.isInstanceOf[String]) =>
        val (df, rgo, rgt, fo, ft) =
          TableLog.readRowGroupPrunedStringBounds(spark, dir, c,
            r.lo.map(_.asInstanceOf[String]),
            r.hi.map(_.asInstanceOf[String]), version, scanCols)
        (df, Stats("rowgroup_range", Some(c), rgo, rgt, fo, ft))
      case _ =>
        val df = TableLog.read(spark, dir, version)
        (df, Stats("full_scan", None, 0L, 0L,
          snap.files.size, snap.files.size))
    }
    val filtered = df0.where(expr(predicate))
    (if (columns.isEmpty) filtered
     else filtered.select(columns.map(col): _*), stats)
  }

  /** Single-part column names the predicate references — what a pushed
    * projection must additionally carry so the exact re-filter can
    * evaluate. */
  private[operators] def referencedColumns(spark: SparkSession,
      predicate: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    spark.sessionState.sqlParser.parseExpression(predicate).collect {
      case a: UnresolvedAttribute if a.nameParts.size == 1 =>
        a.nameParts.head
    }.distinct
  }

  /** Driver-side conjunct analysis: top-level ANDs of parse-time
    * comparisons between a bare column and integral/string literals.
    * Everything else contributes no constraint (conservative). */
  private[operators] def analyze(spark: SparkSession,
      predicate: String): Seq[(String, Constraint)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    val parsed = spark.sessionState.sqlParser.parseExpression(predicate)
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case x => Seq(x)
    }
    def litVal(l: Literal): Option[Any] = l.value match {
      case null => None
      case b: Byte => Some(b.toLong)
      case s: Short => Some(s.toLong)
      case i: Int => Some(i.toLong)
      case l2: Long => Some(l2)
      case u: org.apache.spark.unsafe.types.UTF8String =>
        Some(u.toString)
      case s: String => Some(s)
      case _ => None // doubles/decimals/dates: not prunable here
    }
    def colName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.size == 1 =>
        Some(a.nameParts.head)
      case _ => None
    }
    // an OR tree whose every leaf is `col = lit` on ONE column is an
    // IN-list (the "k = 5 OR k = 9000" shape) — prunable; OR over
    // different columns or non-equalities stays unprunable
    def orAsIn(e: Expression): Option[(String, Constraint)] = {
      def leaves(x: Expression): Seq[Expression] = x match {
        case Or(a, b) => leaves(a) ++ leaves(b)
        case l => Seq(l)
      }
      val pairs = leaves(e).map {
        case EqualTo(a, l: Literal) =>
          for (c <- colName(a); v <- litVal(l)) yield (c, v)
        case EqualTo(l: Literal, a) =>
          for (c <- colName(a); v <- litVal(l)) yield (c, v)
        case _ => None
      }
      if (pairs.exists(_.isEmpty)) None
      else {
        val ps = pairs.map(_.get)
        if (ps.map(_._1).distinct.size == 1)
          Some((ps.head._1, EqIn(ps.map(_._2).distinct)))
        else None
      }
    }

    val raw = conjuncts(parsed).flatMap {
      case o: Or => orAsIn(o)
      // BETWEEN survives parsing as an unresolved 'between' function
      // call (the analyzer, which never runs on a bare
      // parseExpression, would rewrite it to >= AND <=)
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.map(_.toLowerCase) == Seq("between") &&
            f.arguments.size == 3 =>
        (f.arguments(0), f.arguments(1), f.arguments(2)) match {
          case (a, lo: Literal, hi: Literal) =>
            for (c <- colName(a); l <- litVal(lo); h <- litVal(hi))
              yield (c, Range(Some(l), Some(h)))
          case _ => None
        }
      case EqualTo(a, l: Literal) => for (c <- colName(a); v <- litVal(l))
        yield (c, EqIn(Seq(v)))
      case EqualTo(l: Literal, a) => for (c <- colName(a); v <- litVal(l))
        yield (c, EqIn(Seq(v)))
      case In(a, ls) if ls.forall(_.isInstanceOf[Literal]) =>
        colName(a).flatMap { c =>
          val vs = ls.map(l => litVal(l.asInstanceOf[Literal]))
          if (vs.forall(_.isDefined) && vs.nonEmpty)
            Some((c, EqIn(vs.map(_.get)))) else None
        }
      case GreaterThanOrEqual(a, l: Literal) =>
        for (c <- colName(a); v <- litVal(l))
          yield (c, Range(Some(v), None))
      case GreaterThan(a, l: Literal) =>
        for (c <- colName(a); v <- litVal(l))
          yield (c, Range(Some(v), None))
      case LessThanOrEqual(a, l: Literal) =>
        for (c <- colName(a); v <- litVal(l))
          yield (c, Range(None, Some(v)))
      case LessThan(a, l: Literal) =>
        for (c <- colName(a); v <- litVal(l))
          yield (c, Range(None, Some(v)))
      case GreaterThanOrEqual(l: Literal, a) =>
        for (c <- colName(a); v <- litVal(l))
          yield (c, Range(None, Some(v)))
      case GreaterThan(l: Literal, a) =>
        for (c <- colName(a); v <- litVal(l))
          yield (c, Range(None, Some(v)))
      case LessThanOrEqual(l: Literal, a) =>
        for (c <- colName(a); v <- litVal(l))
          yield (c, Range(Some(v), None))
      case LessThan(l: Literal, a) =>
        for (c <- colName(a); v <- litVal(l))
          yield (c, Range(Some(v), None))
      case _ => None
    }
    // merge per column: ranges intersect; equality wins over range
    raw.groupBy(_._1).toSeq.sortBy(_._1).map { case (c, cs) =>
      val eqs = cs.collect { case (_, e: EqIn) => e }
      if (eqs.nonEmpty) {
        // several equality conjuncts on one column: intersect value sets
        (c, EqIn(eqs.map(_.values.toSet).reduce(_ intersect _).toSeq))
      } else {
        val ranges = cs.collect { case (_, r: Range) => r }
        def maxOf(vs: Seq[Any]): Any = vs.head match {
          case _: Long => vs.map(_.asInstanceOf[Long]).max
          case _ => vs.map(_.asInstanceOf[String]).max
        }
        def minOf(vs: Seq[Any]): Any = vs.head match {
          case _: Long => vs.map(_.asInstanceOf[Long]).min
          case _ => vs.map(_.asInstanceOf[String]).min
        }
        val los = ranges.flatMap(_.lo)
        val his = ranges.flatMap(_.hi)
        // mixed-type bounds on one column: not prunable, drop to Range
        // with no bounds (harmless — selection requires a defined side)
        val consistent = (los ++ his).map(_.getClass).distinct.size <= 1
        if (!consistent) (c, Range(None, None))
        else (c, Range(
          if (los.isEmpty) None else Some(maxOf(los)),
          if (his.isEmpty) None else Some(minOf(his))))
      }
    }
  }
}
