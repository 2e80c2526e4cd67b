package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs on sf0.001 and produces a sane
  * frame. (Exact value correctness is enforced by the DuckDB oracle via
  * Verify + scripts/verify_local.py; this keeps `sbt test` covering the
  * full registry.) */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // queries whose correct result may legitimately be empty at tiny SF
  private val mayBeEmpty = Set("dup_groups", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_embedding")

  Queries.all.foreach { q =>
    test(s"query ${q.name} runs on sf0.001") {
      val df = q.run(spark, dir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracled query name exists in queries") {
    val qn = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qn))
  }

  test("registry names are unique (a duplicate silently shadows a row)") {
    val names = Queries.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate registry names: ${dups.mkString(",")}")
  }

  test("every registered query carries an oracle") {
    // the correctness gate only audits rows that HAVE oracle SQL — a
    // registry entry without one silently escapes the driver's compare
    val missing = Queries.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"oracle-less queries: ${missing.mkString(",")}")
  }
}
