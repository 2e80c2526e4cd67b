package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The deterministic-GD trainer on hand-checkable fixtures. */
class QualityModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labeledFrom(rows: Seq[(Seq[Double], Double)]) =
    rows.toDF("xs", "y")

  test("learns a linearly separable concept to perfect accuracy") {
    // y = 1 iff x1 > 0.5, with a real margin (no points in 0.45–0.55
    // — a logistic boundary after finite GD sits NEAR 0.5, not on it)
    val rows = (1 to 40).map(i => i / 41.0)
      .filter(x => math.abs(x - 0.5) > 0.05)
      .map(x => (Seq(1.0, x), if (x > 0.5) 1.0 else 0.0))
    val df = labeledFrom(rows)
    val fit = QualityModel.trainLogReg(df, iters = 60, lr = 2.0)
    assert(fit.losses.last < fit.losses.head)
    assert(fit.losses.last < 0.5) // well below ln 2 chance level
    assert(QualityModel.accuracy(df, fit.weights) == 1.0)
    assert(fit.weights(1) > 0) // the concept direction
  }

  test("training is bit-for-bit repeatable") {
    val rows = (1 to 30).map(i => (Seq(1.0, i / 31.0, (i % 7) / 7.0),
      if (i % 3 == 0) 1.0 else 0.0))
    val a = QualityModel.trainLogReg(labeledFrom(rows), 20, 1.0)
    val b = QualityModel.trainLogReg(
      labeledFrom(rows).repartition(7), 20, 1.0)
    // same corpus, different partitioning → identical weights, the
    // quantized-gradient-sum guarantee
    assert(a.weights.toSeq == b.weights.toSeq)
    assert(a.losses == b.losses)
  }

  test("standardize centers and scales against quantized moments") {
    val rows = Seq(
      (Seq(1.0, 0.2, 0.0, 0.0, 0.0, 0.0), 0.0),
      (Seq(1.0, 0.4, 0.0, 0.0, 0.0, 0.0), 1.0),
      (Seq(1.0, 0.6, 0.0, 0.0, 0.0, 0.0), 1.0))
    val std = QualityModel.standardize(labeledFrom(rows))
      .select("xs").as[Seq[Double]].collect()
    val x1 = std.map(_(1)).sorted
    assert(math.abs(x1.sum) < 1e-3) // centered
    assert(math.abs(x1.max - 1.2247) < 1e-2) // (0.6-0.4)/sd, sd=.1633
    assert(std.forall(_(0) == 1.0)) // bias untouched
    // zero-variance feature passes through centered, not divided by 0
    assert(std.forall(v => v(2) == 0.0 && !v(2).isNaN))
  }
}
