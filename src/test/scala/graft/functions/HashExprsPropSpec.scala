package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based contracts for the custom expressions, evaluated
  * DIRECTLY (Literal children → eval) so hundreds of generated cases
  * cost microseconds each, no Spark job. These are the algebraic laws
  * the oracled queries rely on but can only spot-check: exactness vs a
  * BigInt reference, symmetry, range bounds, determinism. */
class HashExprsPropSpec extends AnyFunSuite {

  /** Deterministic property driver over scalacheck generators (the
    * scalatestplus bridge is not on the offline classpath): 100 seeded
    * cases per law, seed fixed so a failure reproduces. */
  private def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (1 to n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def longArr(a: Seq[Long]) =
    Literal.create(a.toArray, ArrayType(LongType, containsNull = false))
  private def dblArr(a: Seq[Double]) =
    Literal.create(a.toArray, ArrayType(DoubleType, containsNull = false))
  private def strArr(a: Seq[String]) =
    Literal.create(a.toArray, ArrayType(StringType, containsNull = false))

  // bounded so |Σ a_i·b_i| stays far from Long overflow at len ≤ 64
  private val boundedLongs =
    Gen.listOfN(16, Gen.chooseNum(-1000000L, 1000000L))

  test("DotLong equals the BigInt reference dot product (exactness)") {
    forAll(boundedLongs, boundedLongs) { (a, b) =>
      val n = math.min(a.size, b.size)
      val (x, y) = (a.take(n), b.take(n))
      val got = DotLong(longArr(x), longArr(y)).eval(null)
      val want = x.zip(y).map { case (p, q) => BigInt(p) * BigInt(q) }.sum
      assert(got == want.toLong && BigInt(got.asInstanceOf[Long]) == want)
    }
  }

  test("DotLong is commutative; mismatched lengths yield null") {
    forAll(boundedLongs, boundedLongs) { (a, b) =>
      val n = math.min(a.size, b.size)
      val (x, y) = (a.take(n), b.take(n))
      assert(DotLong(longArr(x), longArr(y)).eval(null) ==
        DotLong(longArr(y), longArr(x)).eval(null))
      assert(DotLong(longArr(x), longArr(y :+ 1L)).eval(null) == null)
    }
  }

  private val vecGen =
    Gen.listOfN(8, Gen.chooseNum(-100.0, 100.0)).suchThat(v =>
      v.exists(x => math.abs(x) > 1e-9))

  test("CosineSim ∈ [-1, 1] (mod fp eps), symmetric, self = 1") {
    forAll(vecGen, vecGen) { (a, b) =>
      val c = CosineSim(dblArr(a), dblArr(b)).eval(null)
        .asInstanceOf[Double]
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      val c2 = CosineSim(dblArr(b), dblArr(a)).eval(null)
        .asInstanceOf[Double]
      assert(math.abs(c - c2) < 1e-12)
      val self = CosineSim(dblArr(a), dblArr(a)).eval(null)
        .asInstanceOf[Double]
      assert(math.abs(self - 1.0) < 1e-9)
    }
  }

  test("CosineSim: zero norm and length mismatch are null") {
    forAll(vecGen) { a =>
      assert(CosineSim(dblArr(a), dblArr(a.map(_ => 0.0))).eval(null)
        == null)
      assert(CosineSim(dblArr(a), dblArr(a :+ 1.0)).eval(null) == null)
    }
  }

  private val tokenGen = Gen.nonEmptyListOf(
    Gen.oneOf(Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.oneOf("日本語", "données", "αβγ", "x y", "")))

  test("MinHashSig: values in [0, 2^31-1), deterministic, " +
    "permutation-invariant (it is a SET signature)") {
    forAll(tokenGen) { toks =>
      def sig(ts: Seq[String]): Seq[Long] =
        MinHashSig(strArr(ts), 16).eval(null).asInstanceOf[ArrayData]
          .toLongArray().toSeq
      val s1 = sig(toks)
      assert(s1.size == 16)
      assert(s1.forall(v => v >= 0L && v <= Long.MaxValue))
      assert(sig(toks) == s1) // deterministic
      assert(sig(scala.util.Random.shuffle(toks)) == s1) // order-free
      // adding a DUPLICATE token cannot change a set signature
      assert(sig(toks :+ toks.head) == s1)
    }
  }

  test("SimHash64: deterministic, order-invariant under duplication " +
    "semantics it documents (count-based, so duplicates CAN move it)") {
    forAll(tokenGen) { toks =>
      def h(ts: Seq[String]): Long =
        SimHash64(strArr(ts)).eval(null).asInstanceOf[Long]
      val v = h(toks)
      assert(h(toks) == v)
      assert(h(scala.util.Random.shuffle(toks)) == v)
    }
  }

  test("ShingleSet: shingles are distinct, and each is a k-gram of " +
    "the normalized token stream") {
    val textGen = Gen.listOfN(12,
      Gen.oneOf("alpha", "beta", "Gamma", "DELTA", "e"))
      .map(_.mkString(" "))
    forAll(textGen, Gen.chooseNum(1, 4)) { (text, k) =>
      val out = ShingleSet(Literal.create(text, StringType), k)
        .eval(null).asInstanceOf[ArrayData].toArray[Any](StringType)
        .map(_.toString).toSeq
      assert(out.distinct == out) // a SET
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length >= k)
        out.foreach { sh =>
          val g = sh.split(" ").toSeq
          assert(g.size == k && toks.containsSlice(g), s"$sh not a $k-gram")
        }
    }
  }
}
