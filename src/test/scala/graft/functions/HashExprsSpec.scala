package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HashExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MinHashSig: deterministic, length numPerm, in-field values") {
    val df = Seq((1L, Seq("a b c", "b c d", "c d e"))).toDF("id", "sh")
    val sig1 = df.select(HashExprs.minhashSig(col("sh"), 64).as("s"))
      .collect().head.getSeq[Long](0)
    val sig2 = df.select(HashExprs.minhashSig(col("sh"), 64).as("s"))
      .collect().head.getSeq[Long](0)
    assert(sig1 == sig2)
    assert(sig1.length == 64)
    assert(sig1.forall(v => v >= 0 && v < 2147483647L))
  }

  test("MinHashSig: signature agreement tracks jaccard") {
    val a = (1 to 100).map(i => s"sh$i")
    val b = (1 to 90).map(i => s"sh$i") ++ (1 to 10).map(i => s"zz$i")
    val df = Seq((1L, a), (2L, b)).toDF("id", "sh")
    val sigs = df.select(col("id"),
      HashExprs.minhashSig(col("sh"), 128).as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agree = sigs(1L).zip(sigs(2L)).count(p => p._1 == p._2)
    // E[agreement] = jaccard ≈ 90/110 ≈ 0.82 → expect ~105 of 128
    assert(agree > 80 && agree < 128)
  }

  test("SimHash64: identical inputs → same hash; null-token safety") {
    val df = Seq((1L, Seq("x", "y", "z")), (2L, Seq("x", "y", "z")),
      (3L, Seq.empty[String])).toDF("id", "toks")
    val hs = df.select(col("id"), HashExprs.simhash64(col("toks")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L))
    assert(hs(3L) == 0L) // empty → no bits set
  }

  test("DotLong: exact integer dot product") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
    assert(df.select(HashExprs.dotLong(col("a"), col("b")))
      .collect().head.getLong(0) == 32L)
  }

  test("DotLong: null on length mismatch") {
    val df = Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
    assert(df.select(HashExprs.dotLong(col("a"), col("b")))
      .collect().head.isNullAt(0))
  }

  test("ShingleSet: unicode text, punctuation, multi-byte chars") {
    val df = Seq((1L, "Füße größer ÄLTER wäre schön"),
      (2L, "日本語 テキスト の 処理 確認"),
      (3L, "emoji 🎬 in 🎬 text 🎬 here")).toDF("id", "t")
    val sh = df.select(col("id"), HashExprs.shingleSet(col("t"), 2)
      .as("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L).contains("füße größer")) // lowercase incl. umlauts
    assert(sh(2L).contains("日本語 テキスト"))
    assert(sh(3L).contains("emoji 🎬"))
    // deterministic across calls on multi-byte content
    val again = df.select(HashExprs.minhashSig(
      HashExprs.shingleSet(col("t"), 2), 16).as("s"))
      .collect().map(_.getSeq[Long](0))
    val again2 = df.select(HashExprs.minhashSig(
      HashExprs.shingleSet(col("t"), 2), 16).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(again.toSeq == again2.toSeq)
  }

  test("CosineSim: float arrays, zero-norm → null") {
    val df = Seq((Seq(1f, 0f), Seq(1f, 0f)), (Seq(0f, 0f), Seq(1f, 0f)))
      .toDF("a", "b")
    val out = df.select(HashExprs.cosineF(col("a"), col("b")).as("c"))
      .collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(out(1).isNullAt(0))
  }

  test("FirstEqualIndex: first agreement position, -1 when disjoint, " +
    "null on length mismatch or null input") {
    val df = Seq(
      (1L, Seq(7L, 8L, 9L), Seq(7L, 0L, 0L)),  // agree at 0
      (2L, Seq(7L, 8L, 9L), Seq(0L, 8L, 9L)),  // first agreement is 1
      (3L, Seq(7L, 8L, 9L), Seq(0L, 0L, 9L)),  // only the last: 2
      (4L, Seq(7L, 8L, 9L), Seq(0L, 1L, 2L)),  // disjoint: -1
      (5L, Seq.empty[Long], Seq.empty[Long])   // empty arrays: -1
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
      HashExprs.firstEqualIndex(col("a"), col("b")).as("f")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> -1, 5L -> -1))
    // length mismatch → null (the DotLong convention)
    val mm = Seq((Seq(1L, 2L), Seq(1L)))
      .toDF("a", "b")
      .select(HashExprs.firstEqualIndex(col("a"), col("b")).as("f"))
      .collect()
    assert(mm(0).isNullAt(0))
    // null input → null (BinaryExpression null propagation)
    val nn = Seq((Some(Seq(1L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
      .select(HashExprs.firstEqualIndex(col("a"), col("b")).as("f"))
      .collect()
    assert(nn(0).isNullAt(0))
  }
}
