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
  * A declarative `A JOIN B ON st_contains(b.geom, a.geom)` has no
  * equi-conjunct, so Catalyst can only plan a broadcast-nested-loop or
  * cartesian product — |A|·|B| containment tests, the plan that melts at
  * any scale. [[graft.operators.SpatialJoin.pointInPolygon]] is the
  * hand-written fix; this rule applies the SAME decomposition to the
  * logical plan automatically, so plain SQL users get the scalable shape:
  *
  *   fine:   inner side keys on its centroid's res-R cell (containment
  *           implies envelope containment, so the centroid's cell is
  *           always among the outer's covering cells), outer side
  *           explodes its envelope covering — an EQUI-join on the cell
  *           plus the exact JTS refine as residual;
  *   coarse: outers whose covering overflowed the cell cap (empty array
  *           — country-scale shapes, few by nature) fall back to a
  *           broadcast nested-loop branch, so results are IDENTICAL to
  *           the naive join, never silently truncated.
  *
  * The rule fires only on Inner joins with no equality conjunct and no
  * user join hint (the coarse branch carries a broadcast hint, which also
  * keeps the rewrite from re-matching its own output). Resolution comes
  * from `spark.graft.spatialjoin.res` (default 10); set
  * `spark.graft.spatialjoin.rewrite=false` to disable. */
object SpatialJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

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
        val pick = if (hasEqui) None else conjuncts.collectFirst {
          // (outerExpr, innerExpr, outerPlan, innerPlan, outerIsLeft)
          case c @ StContains(o, i)
              if o.references.nonEmpty && i.references.nonEmpty &&
                o.references.subsetOf(right.outputSet) &&
                i.references.subsetOf(left.outputSet) =>
            (c, o, i, right, left, false)
          case c @ StContains(o, i)
              if o.references.nonEmpty && i.references.nonEmpty &&
                o.references.subsetOf(left.outputSet) &&
                i.references.subsetOf(right.outputSet) =>
            (c, o, i, left, right, true)
        }
        pick match {
          case None => j
          case Some((containsExpr, outerG, innerG, gSide, pSide, _)) =>
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
        }
    }
  }
}
