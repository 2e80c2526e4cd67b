package graft.etl

/** Data-driven multi-touch attribution — the Markov removal-effect
  * model (Anderl et al. 2014): channels are states of an absorbing
  * chain (conversion and null absorb), a channel's credit is how much
  * the start-state conversion probability drops when every edge into
  * it is redirected to null and its outgoing edges are removed.
  *
  * Scale contract: the DATA-SIZED work — ordering each user's journey
  * and counting (state → next state) transitions — happens in Spark
  * with user-partitioned windows before this object is ever called;
  * what reaches the driver is the transition-count matrix, bounded by
  * (channels + 2)² for an enum-bounded channel domain (the
  * bounded-model-state contract [[graft.llmops.Preference]] documents).
  *
  * Arithmetic is INTEGER-QUANTIZED (values in 1e-6 units, floor-div
  * applied AFTER each state's full Σ n·v — one rounding per state per
  * round) over a FIXED round budget, so a run is bit-identical to a
  * recursive-CTE oracle replaying the same recurrence; removal only
  * cuts conversion paths, so every removal effect is ≥ 0 by
  * construction.
  */
object Attribution {

  /** Fixed-budget value iteration + per-channel removal effects.
    *
    * @param trans (src, dst, n) transition counts; 'start' is the
    *              source state, 'conv'/'null' the absorbing sinks
    * @param iterations fixed value-iteration budget (the
    *              [[Graph.coreness]] contract)
    * @return per channel (channel, v_base, v_removed, re_micro,
    *         share_micro), channels sorted
    */
  def removalEffects(trans: Seq[(String, String, Long)],
                     iterations: Int = 12)
  : Seq[(String, Long, Long, Long, Long)] = {
    def startValue(removed: Option[String]): Long = {
      val t = scala.collection.mutable.Map.empty[(String, String), Long]
      trans.foreach { case (s, d, n) =>
        if (!removed.contains(s)) {
          val d2 = if (removed.contains(d)) "null" else d
          t((s, d2)) = t.getOrElse((s, d2), 0L) + n
        }
      }
      val nout = t.toSeq.groupBy(_._1._1)
        .map { case (s, xs) => s -> xs.map(_._2).sum }
      val states = (t.keys.flatMap(k => Seq(k._1, k._2)).toSet ++
        Set("conv", "null")).toSeq.sorted
      var v = states
        .map(st => st -> (if (st == "conv") 1000000L else 0L)).toMap
      for (_ <- 1 to iterations) {
        v = states.map { st =>
          if (st == "conv" || st == "null") st -> v(st)
          else nout.get(st) match {
            case Some(no) =>
              st -> states.map(d => t.getOrElse((st, d), 0L) * v(d)).sum / no
            case None => st -> 0L // dst-only state: no outgoing mass
          }
        }.toMap
      }
      v.getOrElse("start", 0L)
    }
    val base = startValue(None)
    val channels = trans.map(_._1).filter(_ != "start").distinct.sorted
    val removedV = channels.map(c => c -> startValue(Some(c))).toMap
    val sre = channels.map(c => math.max(base - removedV(c), 0L)).sum
    channels.map { c =>
      val d = base - removedV(c)
      (c, base, removedV(c),
        d * 1000000L / math.max(base, 1L),
        d * 1000000L / math.max(sre, 1L))
    }
  }
}
