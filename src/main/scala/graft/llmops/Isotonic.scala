package graft.llmops

/** Isotonic (monotone) calibration — PAVA, the pool-adjacent-violators
  * algorithm (Zadrozny & Elkan 2002's calibration fitter): given
  * per-score-group positives/totals ordered by score, produce the
  * non-decreasing step function closest to the raw rates in L2.
  * [[graft.QueriesAnalytics.mlCalibration]] MEASURES miscalibration;
  * this FITS the correction.
  *
  * Scale contract: the corpus reduces to (score, n, positives) groups
  * in one Spark aggregate — bounded by the score value domain, never
  * by rows — and PAVA runs on the driver over that bounded table (the
  * [[Preference]] bounded-model-state contract; the fitted step table
  * broadcasts back to score a full corpus).
  *
  * Determinism: merge decisions compare pool means as CROSS-MULTIPLIED
  * exact longs (syL·nR ≥ syR·nL — no double ever decides a merge), and
  * each fitted value is ONE division of the pool's exact integer sums.
  * By the minimax characterization f(i) = max_{j≤i} min_{k≥i}
  * avg(y_j..y_k), the same doubles fall out of a pure-SQL replay of
  * that formula — the oracle needs no sequential loop.
  */
object Isotonic {

  /** @param groups (n, positives) per score group, ALREADY in
    *               ascending score order
    * @return fitted rate per group, non-decreasing, pool means as one
    *         exact-integer division each */
  def pava(groups: Seq[(Long, Long)]): Seq[Double] = {
    // pools as (n, sy, width) stacks; merge while the left pool's mean
    // is >= the right's (violator), compared exactly.
    val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    groups.foreach { case (n, sy) =>
      var cur = (n, sy, 1)
      while (st.nonEmpty &&
        st.last._2 * cur._1 >= cur._2 * st.last._1) {
        val l = st.remove(st.length - 1)
        cur = (l._1 + cur._1, l._2 + cur._2, l._3 + cur._3)
      }
      st += cur
    }
    st.toSeq.flatMap { case (n, sy, w) =>
      Seq.fill(w)(sy.toDouble / n.toDouble)
    }
  }
}
