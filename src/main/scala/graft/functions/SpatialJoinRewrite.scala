package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Rewrite naive spatial-predicate joins into the grid-bucketed plan —
  * the optimizer rule SURVEY.md §4.3 flagged as the one place a custom
  * `Rule[LogicalPlan]` earns its keep.
  *
  * A declarative `A JOIN B ON st_contains(b.geom, a.geom)` (or
  * `st_intersects` / `st_dwithin`) has no equi-conjunct, so Catalyst can
  * only plan a broadcast-nested-loop or cartesian product — |A|·|B|
  * predicate tests, the plan that melts at any scale.
  * [[graft.operators.SpatialJoin]] is the hand-written fix; this rule
  * applies the SAME decompositions to the logical plan automatically, so
  * plain SQL users get the scalable shape (reference analogue: every
  * DuckDB spatial query is declarative, east_asia.py:176-178).
  *
  * `st_contains(outer, inner)` — one-sided covering: the inner side keys
  * on its centroid's res-R cell (containment implies envelope
  * containment, so the centroid's cell is always among the outer's
  * covering cells), the outer side explodes its envelope covering — an
  * EQUI-join on the cell plus the exact refine as residual. A true pair
  * shares exactly one such cell, so no dedup is needed.
  *
  * `st_intersects(a, b)` — two-sided covering: BOTH sides explode their
  * envelope coverings and equi-join on the cell. A true pair may share
  * many cells, so the join keeps exactly the REFERENCE cell — the cell
  * of (max(minXa, minXb), max(minYa, minYb)), the lower-left corner of
  * the envelope intersection, which for intersecting envelopes lies in
  * both coverings — making each surviving pair appear exactly once
  * (the standard grid-partitioned spatial-join dedup).
  *
  * `st_dwithin(a, b, d)` (foldable d) — intersects with ONE side's
  * covering padded by d and that side's reference corner shifted by −d:
  * a true pair's padded envelope intersects the other's, so completeness
  * and exactly-once both carry over. Plan statistics choose the padded
  * side (the smaller input — its fan-out multiplies by ~(1+2d/cell)²,
  * so the corpus side stays one covering cell per row).
  *
  * Oversized geometries (covering overflowed the cell cap — empty array;
  * country-scale shapes, few by nature) fall back to broadcast
  * nested-loop branches, so results are IDENTICAL to the naive join,
  * never silently truncated.
  *
  * The rule fires only on Inner joins with no equality conjunct and no
  * user join hint (the coarse branches carry broadcast hints, which also
  * keeps the rewrite from re-matching its own output; the fine branch
  * re-enters with an equi-conjunct and is skipped by the guard).
  * Resolution comes from `spark.graft.spatialjoin.res` (default 10); set
  * `spark.graft.spatialjoin.rewrite=false` to disable. */
object SpatialJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** The decomposition picked off a join condition's conjunct. */
  private sealed trait Pick
  /** One-sided: outer explodes covering, inner keys on centroid cell. */
  private final case class ContainsPick(expr: Expression, outerG: Expression,
      innerG: Expression, outerPlan: LogicalPlan, innerPlan: LogicalPlan)
      extends Pick
  /** Two-sided: both explode coverings; `pad` > 0 for dwithin. */
  private final case class SymmetricPick(expr: Expression, aG: Expression,
      bG: Expression, pad: Double) extends Pick

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.spatialjoin.rewrite", "true")
      .toBoolean) return plan
    val res = conf.getConfString("spark.graft.spatialjoin.res", "10").toInt
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if hint == JoinHint.NONE =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEqui = conjuncts.exists {
          case EqualTo(l, r) =>
            (l.references.subsetOf(left.outputSet) &&
              r.references.subsetOf(right.outputSet)) ||
            (l.references.subsetOf(right.outputSet) &&
              r.references.subsetOf(left.outputSet))
          case _ => false
        }
        def sided(a: Expression, b: Expression): Boolean =
          a.references.nonEmpty && b.references.nonEmpty &&
            a.references.subsetOf(left.outputSet) &&
            b.references.subsetOf(right.outputSet)
        val pick: Option[Pick] = if (hasEqui) None else conjuncts.collectFirst {
          case c @ StContains(o, i) if sided(i, o) =>
            ContainsPick(c, o, i, outerPlan = right, innerPlan = left)
          case c @ StContains(o, i) if sided(o, i) =>
            ContainsPick(c, o, i, outerPlan = left, innerPlan = right)
          case c @ StIntersects(a, b) if sided(a, b) =>
            SymmetricPick(c, a, b, pad = 0.0)
          case c @ StIntersects(a, b) if sided(b, a) =>
            SymmetricPick(c, b, a, pad = 0.0)
          case c @ StDWithin(a, b, d) if d.foldable && sided(a, b) &&
              distOf(d) > 0 =>
            SymmetricPick(c, a, b, pad = distOf(d))
          case c @ StDWithin(a, b, d) if d.foldable && sided(b, a) &&
              distOf(d) > 0 =>
            SymmetricPick(c, b, a, pad = distOf(d))
        }
        pick match {
          case None => j
          case Some(ContainsPick(containsExpr, outerG, innerG, gSide, pSide)) =>
            val residual = conjuncts.filterNot(_ eq containsExpr)
            // fine branch: explode the outer covering, equi-join on cell
            val cells = CellsCovering(outerG, Literal(res))
            val cellAttr = AttributeReference("__graft_cell", LongType,
              nullable = false)()
            val gridable = Generate(Explode(cells), Nil, outer = false,
              qualifier = None, generatorOutput = Seq(cellAttr),
              child = gSide)
            val pKey = Coalesce(Seq(
              GridCell(CentroidX(innerG), CentroidY(innerG), Literal(res)),
              Literal(-1L)))
            val fineCond = (EqualTo(pKey, cellAttr) +: containsExpr +:
              residual).reduce(And(_, _))
            val fine = Project(j.output,
              Join(pSide, gridable, Inner, Some(fineCond), JoinHint.NONE))
            // coarse branch: covering overflowed the cap → broadcast the
            // (few) oversized outers against the inner side
            val oversized = Filter(
              And(EqualTo(Size(cells), Literal(0)), IsNotNull(outerG)),
              gSide)
            val coarseCond = (containsExpr +: residual).reduce(And(_, _))
            val coarse = Project(j.output,
              Join(pSide, oversized, Inner, Some(coarseCond),
                JoinHint(None, Some(HintInfo(Some(BROADCAST))))))
            Union(Seq(fine, coarse))
          case Some(SymmetricPick(predExpr, aG, bG, pad)) =>
            val residual = conjuncts.filterNot(_ eq predExpr)
            val pred = (predExpr +: residual).reduce(And(_, _))
            // the d-pad multiplies ONE side's covering by ~(1 + 2d/cell)²;
            // put it on the smaller input (by plan stats) so the cheap
            // side fans out and the corpus side stays one-cell-per-row —
            // the predicate is symmetric, so the choice is free
            val padLeft = pad == 0.0 ||
              left.stats.sizeInBytes <= right.stats.sizeInBytes
            def padded(g: Expression): Expression =
              CellsCoveringPad(g, Literal(res), Literal(pad))
            val cellsA: Expression =
              if (pad == 0.0 || !padLeft) CellsCovering(aG, Literal(res))
              else padded(aG)
            val cellsB: Expression =
              if (pad == 0.0 || padLeft) CellsCovering(bG, Literal(res))
              else padded(bG)
            val cellA = AttributeReference("__graft_cell_a", LongType,
              nullable = false)()
            val cellB = AttributeReference("__graft_cell_b", LongType,
              nullable = false)()
            // envelope min corners are projected ONCE per input row (one
            // WKB decode each), BEFORE the explode replicates them as
            // cheap doubles — the dedup predicate then touches only
            // attributes, never re-decoding geometry per candidate pair.
            // The −pad shift follows whichever side carries the padded
            // covering (its effective envelope is the expanded one).
            def minusPad(e: Expression, on: Boolean): Expression =
              if (pad == 0.0 || !on) e else Subtract(e, Literal(pad))
            val ax = Alias(minusPad(EnvMinX(aG), padLeft), "__graft_ax")()
            val ay = Alias(minusPad(EnvMinY(aG), padLeft), "__graft_ay")()
            val bx = Alias(minusPad(EnvMinX(bG), !padLeft), "__graft_bx")()
            val by = Alias(minusPad(EnvMinY(bG), !padLeft), "__graft_by")()
            val genA = Generate(Explode(cellsA), Nil, outer = false,
              qualifier = None, generatorOutput = Seq(cellA),
              child = Project(left.output ++ Seq(ax, ay), left))
            val genB = Generate(Explode(cellsB), Nil, outer = false,
              qualifier = None, generatorOutput = Seq(cellB),
              child = Project(right.output ++ Seq(bx, by), right))
            // exactly-once: keep only the envelope-intersection corner cell
            val refX = Greatest(Seq(ax.toAttribute, bx.toAttribute))
            val refY = Greatest(Seq(ay.toAttribute, by.toAttribute))
            val dedup = EqualTo(cellA, GridCell(refX, refY, Literal(res)))
            val fineCond = (EqualTo(cellA, cellB) +: dedup +: pred +: Nil)
              .reduce(And(_, _))
            val fine = Project(j.output,
              Join(genA, genB, Inner, Some(fineCond), JoinHint.NONE))
            // coarse branches: (oversized a) × all b, plus (fit a) ×
            // (oversized b) — a disjoint split of the non-fine pair space
            val aOver = Filter(
              And(EqualTo(Size(cellsA), Literal(0)), IsNotNull(aG)), left)
            val aFit = Filter(
              Not(And(EqualTo(Size(cellsA), Literal(0)), IsNotNull(aG))),
              left)
            val bOver = Filter(
              And(EqualTo(Size(cellsB), Literal(0)), IsNotNull(bG)), right)
            val coarse1 = Project(j.output,
              Join(aOver, right, Inner, Some(pred),
                JoinHint(Some(HintInfo(Some(BROADCAST))), None)))
            val coarse2 = Project(j.output,
              Join(aFit, bOver, Inner, Some(pred),
                JoinHint(None, Some(HintInfo(Some(BROADCAST))))))
            Union(Seq(fine, coarse1, coarse2))
        }
    }
  }

  private def distOf(d: Expression): Double = d.eval() match {
    case n: Number => n.doubleValue
    case _ => -1.0
  }
}
