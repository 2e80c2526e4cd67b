package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed top-principal-component extraction over an embedding
  * column — the whitening/projection preprocessing a curation pipeline
  * runs before semantic dedup or drift tracking (and the 1-component
  * core of PCA dimensionality reduction).
  *
  * Scale shape: the ONLY thing that crosses the cluster is the d×d
  * second-moment matrix — computed as exact BIGINT sums over
  * 1e-3-quantized coordinates (the repo-wide embedding-math rule, see
  * Queries.scala's determinism contract), O(N·d²) map-side work,
  * O(d²) shuffle rows after partial aggregation. The d×d matrix (d =
  * 64 here; 4096 longs) is a bounded driver collect — the k-means
  * centroid precedent (Similarity.scala) — and power iteration runs
  * driver-side on that tiny matrix; the resulting direction vector
  * re-enters the plan as a LITERAL array, so projection is a
  * scan-side expression with no second shuffle. At 100 TB: N only
  * enters through the linear scan; everything shuffled or collected
  * is d²-bounded.
  *
  * Reference analogue: none (the reference has no vector ops); public
  * method: power iteration (Golub & Van Loan, Matrix Computations §7.3).
  */
object Pca {

  /** (scaled covariance C = n·Σqqᵀ − (Σq)(Σq)ᵀ as doubles, n).
    * Exact: every entry is a BIGINT identity in the quantized ints
    * before the final toDouble. `vecCol` is Array[Float]; coordinates
    * are quantized to floor(x·1000). */
  def scaledCovariance(vecs: DataFrame, vecCol: String): (Array[Array[Double]], Long) = {
    val q = vecs.select(expr(
      s"transform($vecCol, x -> cast(floor(x * 1000) as bigint))").as("q"))
    val xi = q.select(posexplode(col("q")).as(Seq("i", "xi")), col("q"))
    val pairs = xi.select(col("i"), col("xi"),
      posexplode(col("q")).as(Seq("j", "xj")))
    // one shuffle, d² groups, partial-aggregated map-side
    val moments = pairs.groupBy("i", "j")
      .agg(sum(col("xi") * col("xj")).as("sxy"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val dims = q.select(posexplode(col("q")).as(Seq("i", "xi")))
      .groupBy("i").agg(sum(col("xi")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
    val d = dims.size
    val n = dims(0)._2
    val cov = Array.tabulate(d, d) { (i, j) =>
      (n * moments((i, j)) - dims(i)._1 * dims(j)._1).toDouble
    }
    (cov, n)
  }

  /** Dominant eigenvector by power iteration, sign-canonicalized so
    * the largest-magnitude coordinate is positive (±v are the same
    * component; pinning the sign makes downstream frozen oracles
    * stable across refactors). Deterministic: fixed all-ones init,
    * fixed iteration count, IEEE ops only. */
  def topComponent(cov: Array[Array[Double]], iters: Int = 100): Array[Double] = {
    val d = cov.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(d)(i => {
        var acc = 0.0
        var j = 0
        while (j < d) { acc += cov(i)(j) * v(j); j += 1 }
        acc
      })
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = if (norm == 0.0) v else w.map(_ / norm)
      it += 1
    }
    val kMax = v.indices.maxBy(i => math.abs(v(i)))
    if (v(kMax) < 0) v.map(x => -x) else v
  }

  /** Rayleigh quotient vᵀCv and max diagonal entry — the invariant
    * pair the gate row checks (λ_max ≥ max_i C_ii for symmetric C). */
  def rayleighAndMaxDiag(cov: Array[Array[Double]], v: Array[Double]): (Double, Double) = {
    val d = cov.length
    var lam = 0.0
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) { lam += v(i) * cov(i)(j) * v(j); j += 1 }
      i += 1
    }
    (lam, (0 until d).map(i => cov(i)(i)).max)
  }

  /** Relative eigen-residual ‖Cv − λv‖ / λ — a direct convergence
    * certificate for the returned component. */
  def eigenResidual(cov: Array[Array[Double]], v: Array[Double], lam: Double): Double = {
    val d = cov.length
    val r = Array.tabulate(d) { i =>
      var acc = 0.0
      var j = 0
      while (j < d) { acc += cov(i)(j) * v(j); j += 1 }
      acc - lam * v(i)
    }
    math.sqrt(r.map(x => x * x).sum) / math.abs(lam)
  }

  /** Project quantized embeddings onto `v` as a scan-side expression:
    * the direction enters as a literal array, evaluation is a
    * fixed-order fold (deterministic double chain), output quantized
    * to a BIGINT score. Adds `proj_q`. */
  def project(vecs: DataFrame, vecCol: String, v: Array[Double]): DataFrame = {
    val vLit = v.mkString("array(", "D, ", "D)")
    vecs.withColumn("proj_q", expr(
      s"""cast(floor(aggregate(
            zip_with(transform($vecCol, x -> cast(floor(x * 1000) as bigint)),
                     $vLit,
                     (a, b) -> cast(a as double) * b),
            0D, (acc, x) -> acc + x)) as bigint)"""))
  }
}
