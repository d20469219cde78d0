package graft.operators

/** Nested-loop reference implementation of the as-of join semantics
  * (pandas merge_asof), used by both the example-based spec and the
  * ScalaCheck equivalence properties. Right-side (by, on) pairs are
  * assumed unique (the generators dedupe), so no positional tiebreak
  * is needed.
  */
object AsOfBrute {
  case class L[K](by: Int, on: K, id: Int)
  case class R[K](by: Int, on: K, v: Int)

  /** Returns (left.id, matched right.v or None) per left row.
    * `allowExact`/`tolerance` mirror pandas allow_exact_matches /
    * tolerance (distance in the numeric domain). */
  def asof[K](left: Seq[L[K]], right: Seq[R[K]], direction: String,
              allowExact: Boolean = true, tolerance: Option[Double] = None)(
      implicit num: Numeric[K]): Seq[(Int, Option[Int])] = {
    import num._
    left.map { l =>
      val grp = right.filter(_.by == l.by)
      def le(r: R[K]) = if (allowExact) r.on <= l.on else r.on < l.on
      def ge(r: R[K]) = if (allowExact) r.on >= l.on else r.on > l.on
      val m: Option[R[K]] = direction match {
        case "backward" =>
          val c = grp.filter(le)
          if (c.isEmpty) None else Some(c.maxBy(_.on))
        case "forward" =>
          val c = grp.filter(ge)
          if (c.isEmpty) None else Some(c.minBy(_.on))
        case "nearest" =>
          val b = grp.filter(le).sortBy(_.on).lastOption
          val f = grp.filter(r => ge(r) && !le(r)).sortBy(_.on).headOption
          (b, f) match {
            case (None, x) => x
            case (x, None) => x
            case (Some(bb), Some(ff)) =>
              val dB = l.on.toDouble - bb.on.toDouble
              val dF = ff.on.toDouble - l.on.toDouble
              if (dB <= dF) Some(bb) else Some(ff) // equidistant: prior wins
          }
      }
      val bounded = m.filter(r =>
        tolerance.forall(t => math.abs(l.on.toDouble - r.on.toDouble) <= t))
      (l.id, bounded.map(_.v))
    }
  }
}
