package graft

import org.scalatest.funsuite.AnyFunSuite

/** The streaming scratch-dir lifecycle: every `graft_stream_*` dir a
  * run creates (staged input + per-query checkpoint/output roots) is
  * registered with [[QueriesStreaming.StreamTemp]] and swept by its
  * shutdown hook — a bench/verify run leaves no /tmp residue. The spec
  * drives the hook body directly (`cleanup()`), since the hook itself
  * only fires at JVM exit. */
class StreamTempSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("a streaming run's scratch dirs are all registered and " +
    "cleanup sweeps them") {
    val q = Queries.all.find(_.name == "stream_dedup").get
    assert(q.run(spark, dir).count() > 0)
    val regs = QueriesStreaming.StreamTemp.registered
    // at least the shared staged input and this query's root
    assert(regs.size >= 2, s"expected >=2 scratch dirs, got $regs")
    assert(regs.forall(java.nio.file.Files.exists(_)))
    QueriesStreaming.StreamTemp.cleanup()
    regs.foreach(p =>
      assert(!java.nio.file.Files.exists(p), s"$p survived cleanup"))
    assert(QueriesStreaming.StreamTemp.registered.isEmpty)
    // the StreamStage cache was dropped with its dir: a later streaming
    // query must re-stage, not read the swept path
    assert(q.run(spark, dir).count() > 0)
    QueriesStreaming.StreamTemp.cleanup()
  }
}
