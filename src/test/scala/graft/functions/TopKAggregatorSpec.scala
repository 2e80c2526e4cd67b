package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TopKAggregatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keeps k largest by score with id tie-break, sorted") {
    val ds = Seq((1L, (0.5, 10L)), (1L, (0.9, 3L)), (1L, (0.9, 2L)),
      (1L, (0.1, 7L)), (2L, (0.3, 1L)))
      .toDS()
    val top = ds.groupByKey(_._1).mapValues(_._2)
      .agg(TopKAggregator(2).toColumn.name("topk"))
      .collect().toMap
    assert(top(1L) == Seq((0.9, 2L), (0.9, 3L))) // tie → smaller id first
    assert(top(2L) == Seq((0.3, 1L)))
  }

  test("partial-merge path: many partitions, same answer") {
    val rows = (1 to 1000).map(i => (1L, (i.toDouble / 1000, i.toLong)))
    val ds = spark.createDataset(rows).repartition(13)
    val top = ds.groupByKey(_._1).mapValues(_._2)
      .agg(TopKAggregator(3).toColumn.name("topk"))
      .collect().toMap
    assert(top(1L) == Seq((1.0, 1000L), (0.999, 999L), (0.998, 998L)))
  }

  test("SQL registration: custom expressions callable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT dot_long(array(1L,2L,3L), array(4L,5L,6L)) AS d, " +
        "simhash64(array('a','b')) AS s, " +
        "size(minhash_sig(shingle_set('a b c d', 2), 16)) AS m, " +
        "cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect().head
    assert(r.getAs[Long]("d") == 32L)
    assert(r.getAs[Int]("m") == 16)
    assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-12)
  }

  test("aggregator topk matches window topk on the testdata") {
    val dir = "/root/testdata/sf0.001"
    val a = Queries_topk("sim_topk_bruteforce", dir)
    val b = Queries_topk("sim_topk_aggregator", dir)
    assert(a == b)
  }

  private def Queries_topk(name: String, dir: String) =
    graft.Queries.all.find(_.name == name).get.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
}
