package graft.sources

import java.util.Locale
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._

/** Conservative per-column range extraction from a filter predicate —
  * the bridge that lets the copy-on-write DML ops consult zone-map
  * sidecars BEFORE their discovery scan, with no caller-facing API.
  *
  * Soundness model: for `cond = c1 AND c2 AND …`, every matching row
  * satisfies EACH conjunct, so a per-column interval that over-
  * approximates one conjunct's support over-approximates the whole
  * predicate's. A data directory whose zone-map rectangle is disjoint
  * from ANY extracted interval provably holds no matching rows and can
  * be skipped entirely. Anything unrecognized (ORs, casts, functions,
  * non-numeric literals, subqueries) extracts NOTHING for its columns —
  * fail open, never wrong.
  *
  * Extracted shapes (attribute ⋈ numeric literal, either operand order):
  * `>= > <= < = IN`. Spark 4's Column API builds analysis-stage trees
  * (`UnresolvedFunction(">=", …)`); both those and the resolved catalyst
  * comparison classes are recognized. Bounds widen one ulp per side:
  * literals narrow to the zone map's double space, and a nearest-rounded
  * bound sitting a hair inside the true one could otherwise prune a file
  * that holds the boundary row — the same widening discipline as the
  * zone-map stats themselves (`Layout.widenLo/Hi`).
  */
object PredicateRanges {

  private def numeric(v: Any): Option[Double] = v match {
    case n: java.lang.Number => Some(n.doubleValue())
    case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
    case _ => None
  }

  private def lit(e: Expression): Option[Double] = e match {
    case Literal(v, _) if v != null => numeric(v)
    case _ => None
  }

  /** Bare column references only — a Cast may change comparison
    * semantics (string→double, timestamp truncation), so fail open. */
  private def attr(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute if u.nameParts.size == 1 =>
      Some(u.nameParts.head)
    case _ => None
  }

  /** Analysis-stage function nodes by (lower-cased) name. */
  private object Fn {
    def unapply(e: Expression): Option[(String, Seq[Expression])] =
      e match {
        case f: UnresolvedFunction if f.nameParts.size == 1 =>
          Some((f.nameParts.head.toLowerCase(Locale.ROOT), f.arguments))
        case _ => None
      }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case Fn("and", args) if args.size == 2 => args.flatMap(conjuncts)
    case x => Seq(x)
  }

  private val Inf = Double.PositiveInfinity

  /** `l ⋈ r` with the operator spelled as a string — the shared core of
    * the typed and analysis-stage paths. Open bounds (`>` `<`) reuse the
    * closed interval: wider, still sound. The literal-⋈-attribute order
    * routes through the SAME table with the operator mirrored. */
  private def dir(op: String, c: String,
      x: Double): Option[(String, Double, Double)] = op match {
    case ">=" | ">" => Some((c, Math.nextDown(x), Inf))
    case "<=" | "<" => Some((c, -Inf, Math.nextUp(x)))
    case "=" | "==" => Some((c, Math.nextDown(x), Math.nextUp(x)))
    case _ => None
  }

  private def mirrored(op: String): String = op match {
    case ">=" => "<="
    case ">" => "<"
    case "<=" => ">="
    case "<" => ">"
    case other => other
  }

  private def binary(op: String, l: Expression,
      r: Expression): Option[(String, Double, Double)] =
    (attr(l), lit(r)) match {
      case (Some(c), Some(x)) => dir(op, c, x)
      case _ => (attr(r), lit(l)) match {
        case (Some(c), Some(x)) => dir(mirrored(op), c, x)
        case _ => None
      }
    }

  private def inEnvelope(a: Expression,
      vs: Seq[Expression]): Option[(String, Double, Double)] =
    for {
      c <- attr(a)
      xs <- Some(vs.flatMap(lit)) if xs.size == vs.size && xs.nonEmpty
    } yield (c, Math.nextDown(xs.min), Math.nextUp(xs.max))

  private def bound(e: Expression): Option[(String, Double, Double)] =
    e match {
      case GreaterThanOrEqual(l, r) => binary(">=", l, r)
      case GreaterThan(l, r) => binary(">", l, r)
      case LessThanOrEqual(l, r) => binary("<=", l, r)
      case LessThan(l, r) => binary("<", l, r)
      case EqualTo(l, r) => binary("=", l, r)
      case In(a, vs) => inEnvelope(a, vs)
      case Fn("in", args) if args.size >= 2 =>
        inEnvelope(args.head, args.tail)
      case Fn(op, args) if args.size == 2 =>
        binary(op, args.head, args(1))
      case _ => None
    }

  /** Per-column intervals over-approximating `cond`'s support; multiple
    * bounds on one column intersect. Empty when nothing extractable. */
  def extract(cond: Column): Seq[(String, Double, Double)] = {
    val expr = org.apache.spark.sql.GraftBridge.catalystExpression(cond)
    conjuncts(expr).flatMap(bound(_))
      .groupBy(_._1).map { case (c, bs: Seq[(String, Double, Double)]) =>
        (c, bs.map(_._2).max, bs.map(_._3).min)
      }.toSeq.sortBy(_._1)
  }

  /** A literal of ANY type as its external Scala value (blooms index
    * strings too, unlike the numeric-only range envelope). */
  private def anyLit(e: Expression): Option[Any] = e match {
    case Literal(v, dt) if v != null => Some(
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToScala(v, dt))
    case _ => None
  }

  private def eqProbe(l: Expression,
      r: Expression): Option[(String, Seq[Any])] =
    (attr(l), anyLit(r)) match {
      case (Some(c), Some(v)) => Some((c, Seq(v)))
      case _ => (attr(r), anyLit(l)) match {
        case (Some(c), Some(v)) => Some((c, Seq(v)))
        case _ => None
      }
    }

  private def inProbe(a: Expression,
      vs: Seq[Expression]): Option[(String, Seq[Any])] =
    attr(a).flatMap { c =>
      val xs = vs.flatMap(anyLit)
      if (xs.size == vs.size && xs.nonEmpty) Some((c, xs)) else None
    }

  /** Scala `Set` equality coincides with SQL equality only for these
    * literal classes: same-class boxed primitives and strings. BigDecimal
    * (`1.0 != 1.00` under equals, SQL-equal), byte arrays (reference
    * equality), and MIXED classes (Int 1 vs String "1", which SQL
    * coerces equal) would make a set intersection claim a contradiction
    * SQL would not — and an over-eager "contradiction" becomes silently
    * dropped rows downstream. */
  private val intersectSafe: Set[Class[_]] = Set(
    classOf[String], classOf[java.lang.Long], classOf[java.lang.Integer],
    classOf[java.lang.Short], classOf[java.lang.Byte],
    classOf[java.lang.Double], classOf[java.lang.Float],
    classOf[java.lang.Boolean])

  /** Per-column EQUALITY probe sets from `cond`'s conjuncts (`= IN`,
    * either operand order, any literal type) — the bloom-sidecar twin of
    * [[extract]]. Multiple conjuncts on one column combine SOUNDLY: each
    * conjunct's list individually over-approximates the matching rows'
    * values, so when Scala equality is trustworthy for every involved
    * literal (one shared [[intersectSafe]] class) the sets INTERSECT —
    * an empty intersection means no row can match — and otherwise the
    * SMALLEST single list is used (sharp enough, never a false
    * contradiction: Scala's `1 != "1"` is not SQL's `1 = '1'`). Same
    * fail-open stance as [[extract]]: anything unrecognized contributes
    * nothing for its columns. */
  def extractProbes(cond: Column): Seq[(String, Seq[Any])] = {
    val expr = org.apache.spark.sql.GraftBridge.catalystExpression(cond)
    conjuncts(expr).flatMap {
      case EqualTo(l, r) => eqProbe(l, r)
      case In(a, vs) => inProbe(a, vs)
      case Fn("in", args) if args.size >= 2 => inProbe(args.head, args.tail)
      case Fn("=" , args) if args.size == 2 => eqProbe(args.head, args(1))
      case Fn("==", args) if args.size == 2 => eqProbe(args.head, args(1))
      case _ => None
    }.groupBy(_._1).map { case (c, ps: Seq[(String, Seq[Any])]) =>
      val lists = ps.map(_._2)
      val classes = lists.flatten.map(_.getClass).distinct
      val merged =
        if (lists.size == 1) lists.head
        else if (classes.size == 1 && intersectSafe(classes.head))
          lists.map(_.toSet).reduce(_ intersect _).toSeq
        else lists.minBy(_.size)
      (c, merged)
    }.toSeq.sortBy(_._1)
  }
}
