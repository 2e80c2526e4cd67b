package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin == plain join, with the hot key spread over salts") {
    val large = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("hot", "H"), ("k901", "A"), ("k950", "B"))
      .toDF("key", "tag")
    val salted = Skew.saltedJoin(large, small, "key", saltFactor = 8)
    val plain = large.join(small, Seq("key"))
    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == Seq("key", "v", "tag"))
    val a = salted.collect().map(r => (r.getString(0), r.getInt(1),
      r.getString(2))).toSet
    val b = plain.collect().map(r => (r.getString(0), r.getInt(1),
      r.getString(2))).toSet
    assert(a == b)
  }

  test("saltedJoin: bit-identical duplicate rows spread via the " +
    "disambiguator, result still equals the plain join") {
    import org.apache.spark.sql.functions._
    // 800 IDENTICAL copies of one hot row: hash(all columns) alone puts
    // every copy in one salt bucket — the disambiguator must spread them
    val large = ((1 to 800).map(_ => ("hot", 1)) ++
      Seq(("k1", 2), ("k2", 3))).toDF("key", "v")
    val small = Seq(("hot", "H"), ("k1", "A")).toDF("key", "tag")
    val factor = 8
    // without a disambiguator: every identical copy lands in ONE bucket
    val saltsPlain = large.filter(col("key") === "hot")
      .withColumn("__salt", pmod(hash(col("key"), col("v")), lit(factor)))
      .select("__salt").distinct().count()
    assert(saltsPlain == 1L)
    val dis = Some(monotonically_increasing_id())
    val salted = Skew.saltedJoin(large, small, "key", factor, dis)
    val plain = large.join(small, Seq("key"))
    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == Seq("key", "v", "tag"))
    // identical rows: multiset equality == same groupBy counts
    val a = salted.groupBy("key", "v", "tag").count().collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)) ->
        r.getLong(3)).toMap
    val b = plain.groupBy("key", "v", "tag").count().collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(a == b)
  }

  test("keySkewReport surfaces the hot key first") {
    val df = (1 to 100).map(i => if (i <= 80) "hot" else s"k$i")
      .toDF("key")
    val top = Skew.keySkewReport(df, "key", 3).collect()
    assert(top.head.getString(0) == "hot")
    assert(top.head.getLong(1) == 80L)
  }

  test("factEngagement without an events column yields empty fact " +
    "with the contract schema (P16 branch)") {
    val df = Seq(("v1", "1.2.3.4", "DE", "m1"))
      .toDF("visitor_key", "ip_address", "country", "media_id")
    val fact = Transforms.factEngagement(df)
    assert(fact.count() == 0)
    assert(fact.schema.fieldNames.toSeq ==
      graft.model.Schemas.factEngagement.fieldNames.toSeq)
  }
}
