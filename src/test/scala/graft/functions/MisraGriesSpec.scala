package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** True frequencies of a stream. */
  private def freqs(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  /** The MG contract: completeness above n/k, bounded undercount,
    * never overcount, ≤ k counters. */
  private def assertContract(stream: Seq[String], k: Int,
                             sketch: Map[String, Long]): Unit = {
    val n = stream.size.toLong
    val truth = freqs(stream)
    val thresh = n.toDouble / k
    assert(sketch.size <= k, s"sketch grew past k: $sketch")
    truth.filter(_._2 > thresh).keys.foreach { h =>
      assert(sketch.contains(h),
        s"heavy hitter $h (freq ${truth(h)} > n/k=$thresh) missing: $sketch")
    }
    sketch.foreach { case (key, est) =>
      val t = truth.getOrElse(key, 0L)
      assert(est <= t, s"$key overcounted: est $est > true $t")
      assert(t - est <= thresh,
        s"$key undercounted past n/k: est $est, true $t, bound $thresh")
    }
  }

  private def runLocal(stream: Seq[String], k: Int): Map[String, Long] = {
    val agg = MisraGriesAggregator(k)
    stream.foldLeft(agg.zero)(agg.reduce)
  }

  test("sequential reduce honors the MG contract on a skewed stream") {
    val stream = Seq.fill(50)("hot") ++
      (1 to 30).flatMap(i => Seq(s"c${i % 10}")) // 10 cold keys
    assertContract(stream, k = 3, runLocal(stream, 3))
    assertContract(stream, k = 5, runLocal(stream, 5))
  }

  test("contract survives ANY processing order and split point") {
    val stream = Seq.fill(12)("a") ++ Seq.fill(7)("b") ++
      (1 to 11).map(i => s"z$i")
    val k = 4
    val agg = MisraGriesAggregator(k)
    // several orders
    Seq(stream, stream.reverse,
      new scala.util.Random(3).shuffle(stream)).foreach { s =>
      assertContract(stream, k, s.foldLeft(agg.zero)(agg.reduce))
    }
    // several merge split points (partial aggregation shape)
    Seq(1, 7, 15, 29).foreach { cut =>
      val (l, r) = stream.splitAt(cut)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assertContract(stream, k, merged)
    }
  }

  test("merge with empty is identity; merge trims past k correctly") {
    val agg = MisraGriesAggregator(2)
    val b = Map("a" -> 5L, "b" -> 2L)
    assert(agg.merge(b, agg.zero) == b)
    assert(agg.merge(agg.zero, b) == b)
    // union has 3 keys: subtract the 3rd-largest (1) from all
    val merged = agg.merge(Map("a" -> 5L, "b" -> 2L), Map("c" -> 1L))
    assert(merged == Map("a" -> 4L, "b" -> 1L))
  }

  test("distributed run over shuffled partitions honors the contract") {
    val stream = Seq.fill(400)("hot") ++
      (1 to 600).map(i => s"cold${i % 37}")
    val shuffled = new scala.util.Random(11).shuffle(stream)
    val sketch = shuffled.toDF("key").repartition(7).as[String]
      .select(MisraGriesAggregator(4).toColumn).head()
    assertContract(stream, 4, sketch)
    assert(sketch.contains("hot")) // 40% > n/4
  }
}
