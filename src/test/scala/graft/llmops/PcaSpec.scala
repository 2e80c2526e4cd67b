package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Power-iteration PCA against hand-checkable fixtures. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("topComponent recovers the dominant eigenvector of a known matrix") {
    // C = [[4, 1], [1, 3]] has dominant eigenpair λ ≈ 4.618,
    // v ∝ (1, 0.618) (golden-ratio eigenvector of the Fibonacci-ish form)
    val cov = Array(Array(4.0, 1.0), Array(1.0, 3.0))
    val v = Pca.topComponent(cov)
    val (lam, maxDiag) = Pca.rayleighAndMaxDiag(cov, v)
    assert(math.abs(lam - 4.61803398875) < 1e-9)
    assert(lam >= maxDiag)
    assert(Pca.eigenResidual(cov, v, lam) < 1e-9)
    assert(math.abs(v(1) / v(0) - 0.61803398875) < 1e-9)
    assert(v(0) > 0) // sign canonicalization: largest coordinate positive
  }

  test("scaledCovariance matches the direct formula on a tiny input") {
    val df = Seq(
      (0L, Array(0.001f, 0.004f)),
      (1L, Array(0.003f, 0.000f)),
      (2L, Array(0.002f, 0.002f))).toDF("vec_id", "embedding")
    val (cov, n) = Pca.scaledCovariance(df, "embedding")
    assert(n == 3)
    // quantized coords: (1,4), (3,0), (2,2); n·Σxy − ΣxΣy
    // Σx=6 Σy=6 Σxx=14 Σyy=20 Σxy=1·4+3·0+2·2=8
    assert(cov(0)(0) == 3 * 14 - 36) // 6
    assert(cov(1)(1) == 3 * 20 - 36) // 24
    assert(cov(0)(1) == 3 * 8 - 36) // -12
    assert(cov(0)(1) == cov(1)(0))
  }

  test("project is a scan-side literal fold with stable quantized output") {
    val df = Seq((0L, Array(0.001f, 0.004f)), (1L, Array(0.003f, 0.000f)))
      .toDF("vec_id", "embedding")
    val out = Pca.project(df, "embedding", Array(0.6, 0.8))
      .orderBy("vec_id").select("proj_q").as[Long].collect()
    // q=(1,4): 0.6+3.2=3.8 → 3; q=(3,0): 1.8 → 1
    assert(out.toSeq == Seq(3L, 1L))
  }
}
