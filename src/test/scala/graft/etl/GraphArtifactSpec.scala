package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The graph family's build/serve split ([[Graph.commitEdges]] /
  * [[Graph.edgesFromManifest]]) and the k-core convergence certificate
  * ([[Graph.hIndexRound]] fixed-point check) — the spec twins of the
  * oracled `graph_edges_artifact` / `graph_kcore_serve` /
  * `graph_kcore_gate` registry rows. */
class GraphArtifactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tempTable(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString +
      "/edges"

  test("symmetrize: both directions, self-loops out, parallel collapsed") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 4L))
      .toDF("src", "dst")
    val und = Graph.symmetrize(edges).as[(Long, Long)].collect().toSet
    assert(und == Set((1L, 2L), (2L, 1L), (2L, 4L), (4L, 2L)))
  }

  test("commitEdges/edgesFromManifest: pinned v1 undisturbed by rebuild") {
    val tbl = tempTable("edges_mt")
    val e1 = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val v1 = Graph.commitEdges(spark, tbl, e1, targetFiles = 2)
    val v2 = Graph.commitEdges(spark, tbl,
      e1.filter(col("src") =!= 1L), targetFiles = 2)
    assert(v2 == v1 + 1)
    // pinned v1 read serves the ORIGINAL symmetrized set
    val pinned = Graph.edgesFromManifest(spark, tbl, Some(v1))
      .as[(Long, Long)].collect().toSet
    assert(pinned == Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (3L, 4L), (4L, 3L)))
    // latest (unpinned) serves the rebuild
    val latest = Graph.edgesFromManifest(spark, tbl)
      .as[(Long, Long)].collect().toSet
    assert(latest == Set((2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L)))
  }

  test("coreness served from the artifact == coreness built in-plan") {
    // two triangles joined by a bridge + a pendant: known 2-core/1-core
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 4L), (6L, 7L)).toDF("src", "dst")
    val tbl = tempTable("kcore_mt")
    val v = Graph.commitEdges(spark, tbl, edges)
    val served = Graph
      .corenessOfUndirected(Graph.edgesFromManifest(spark, tbl, Some(v)),
        iterations = 6)
      .as[(Long, Long)].collect().toMap
    val built = Graph.coreness(edges, iterations = 6)
      .as[(Long, Long)].collect().toMap
    assert(served == built)
    assert(served == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L,
      5L -> 2L, 6L -> 2L, 7L -> 1L))
  }

  test("appendEdges: overlapping growth batch absorbed, not duplicated") {
    val tbl = tempTable("edges_inc")
    val v1 = Graph.commitEdges(spark, tbl,
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    // growth batch re-delivers (2,3) and brings (3,4); (2,3) must be
    // absorbed by the anti-join, (3,4) appended
    val v2 = Graph.appendEdges(spark, tbl,
      Seq((2L, 3L), (3L, 4L)).toDF("src", "dst"))
    assert(v2 == v1 + 1)
    val latest = Graph.edgesFromManifest(spark, tbl)
      .as[(Long, Long)].collect().toList
    assert(latest.distinct.size == latest.size, "append duplicated edges")
    assert(latest.toSet == Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (3L, 4L), (4L, 3L)))
    // pinned v1 reader untouched by the increment
    assert(Graph.edgesFromManifest(spark, tbl, Some(v1))
      .as[(Long, Long)].collect().toSet ==
      Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
    // the chain is append-only: the file-level CDC read stays sound
    assert(graft.sources.ManifestTable
      .readAppendsSince(spark, tbl, v1)
      .as[(Long, Long)].collect().toSet == Set((3L, 4L), (4L, 3L)))
  }

  test("removeEdges: both orientations retracted together, absent " +
    "edges absorbed, pinned pre-delete version intact") {
    val tbl = tempTable("edges_del")
    val v1 = Graph.commitEdges(spark, tbl,
      Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst"))
    // CDC retraction delivers (3,2) — REVERSED vs the commit's (2,3) —
    // plus (7,8), absent from the artifact: symmetrize must kill both
    // orientation rows of 2—3; the absent edge must be a clean absorb
    val v2 = Graph.removeEdges(spark, tbl,
      Seq((3L, 2L), (7L, 8L)).toDF("src", "dst"))
    assert(v2 == v1 + 1)
    assert(Graph.edgesFromManifest(spark, tbl)
      .as[(Long, Long)].collect().toSet ==
      Set((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)))
    // pinned v1 reader still serves the pre-delete graph
    assert(Graph.edgesFromManifest(spark, tbl, Some(v1))
      .as[(Long, Long)].collect().toSet ==
      Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L)))
    // retraction is idempotent: redelivery commits nothing new
    val v3 = Graph.removeEdges(spark, tbl,
      Seq((2L, 3L)).toDF("src", "dst"))
    assert(v3 == v2, "re-delivered retraction should be a no-op")
    // end-to-end maintenance: incremental coreness over the
    // post-delete artifact equals a fresh recompute
    val old = Graph.corenessOfUndirected(
      Graph.edgesFromManifest(spark, tbl, Some(v1)), iterations = 8)
    val after = Graph.edgesFromManifest(spark, tbl)
    val incr = Graph.incrementalCoreness(after, old, batchEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(incr == Graph.corenessOfUndirected(after, iterations = 8)
      .as[(Long, Long)].collect().toMap)
  }

  test("appendEdges stats-prune is an optimization, never a filter: a " +
    "narrow batch dedups against the ONE overlapping artifact file and " +
    "a far-range batch (all files pruned) appends in full") {
    val tbl = tempTable("edges_prune")
    // range-clustered build: targetFiles=2 puts the low cluster and the
    // high cluster in different files with disjoint src footer stats
    Graph.commitEdges(spark, tbl,
      Seq((1L, 2L), (2L, 3L), (100L, 101L), (101L, 102L))
        .toDF("src", "dst"), targetFiles = 2)
    // narrow low-range batch: (2,3) is a duplicate living in the low
    // file — the prune must KEEP that file and absorb the edge
    Graph.appendEdges(spark, tbl, Seq((2L, 3L), (3L, 4L)).toDF("src", "dst"))
    val afterLow = Graph.edgesFromManifest(spark, tbl)
      .as[(Long, Long)].collect().toList
    assert(afterLow.distinct.size == afterLow.size,
      "pruned anti-join resurrected a duplicate edge")
    assert(afterLow.toSet.contains((3L, 4L)) && afterLow.size == 10)
    // far-range batch overlapping NO committed file: everything is new
    Graph.appendEdges(spark, tbl, Seq((500L, 501L)).toDF("src", "dst"))
    val afterFar = Graph.edgesFromManifest(spark, tbl)
      .as[(Long, Long)].collect().toList
    assert(afterFar.distinct.size == afterFar.size)
    assert(afterFar.toSet.contains((500L, 501L)) && afterFar.size == 12)
    // empty growth batch: a clean no-op version, no crash on the
    // null min/max probe
    Graph.appendEdges(spark, tbl,
      spark.emptyDataset[(Long, Long)].toDF("src", "dst"))
    assert(Graph.edgesFromManifest(spark, tbl)
      .as[(Long, Long)].collect().size == 12)
  }

  test("appendEdges probe path (artifact above the file threshold): " +
    "range prune still absorbs duplicates and keeps far appends whole") {
    val tbl = tempTable("edges_prune_big")
    // 60 disjoint src clusters range-partitioned into 24 files — above
    // ProbeSkipMaxFiles (16), so the batch min/max probe + manifest
    // prune path runs (the small-artifact fast path is covered above)
    Graph.commitEdges(spark, tbl,
      (1L to 60L).map(k => (k * 10, k * 10 + 1)).toDF("src", "dst"),
      targetFiles = 24)
    assert(graft.sources.ManifestTable.fileCount(spark, tbl) > 16,
      "test setup must exceed the probe-skip threshold")
    // batch with one duplicate (100,101) and one new edge in the same
    // narrow range: the prune keeps only overlapping files, and the
    // anti-join still absorbs the duplicate
    Graph.appendEdges(spark, tbl,
      Seq((100L, 101L), (105L, 106L)).toDF("src", "dst"))
    val after = Graph.edgesFromManifest(spark, tbl)
      .as[(Long, Long)].collect().toList
    assert(after.distinct.size == after.size,
      "probe-path anti-join resurrected a duplicate edge")
    assert(after.toSet.contains((105L, 106L)) && after.size == 122)
    // far-range batch overlapping NO file: prune drops everything,
    // the append lands in full
    Graph.appendEdges(spark, tbl, Seq((9000L, 9001L)).toDF("src", "dst"))
    assert(Graph.edgesFromManifest(spark, tbl)
      .as[(Long, Long)].collect().size == 124)
    // empty growth batch through the probe path: the empty-batch guard
    // fires before the null min/max can reach readPruned
    Graph.appendEdges(spark, tbl,
      spark.emptyDataset[(Long, Long)].toDF("src", "dst"))
    assert(Graph.edgesFromManifest(spark, tbl)
      .as[(Long, Long)].collect().size == 124)
  }

  test("commitWeightedEdges: typed (src,dst,w), pinned across rebuild") {
    val tbl = tempTable("wedges_mt")
    val e1 = Seq((1, 2, 5), (1, 3, 2), (2, 3, 1)).toDF("src", "dst", "w")
    val v1 = Graph.commitWeightedEdges(spark, tbl, e1, targetFiles = 2)
    val v2 = Graph.commitWeightedEdges(spark, tbl,
      e1.filter(col("w") > 1), targetFiles = 2)
    assert(v2 == v1 + 1)
    val pinned = graft.sources.ManifestTable.read(spark, tbl, Some(v1))
    assert(pinned.schema.fields.map(f => (f.name, f.dataType.typeName))
      .toSeq == Seq(("src", "long"), ("dst", "long"), ("w", "long")))
    assert(pinned.as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 2L, 5L), (1L, 3L, 2L), (2L, 3L, 1L)))
    assert(graft.sources.ManifestTable.read(spark, tbl)
      .as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 2L, 5L), (1L, 3L, 2L)))
  }

  test("hIndexRound certificate: converged scores are a fixed point, " +
    "unconverged scores are caught") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("src", "dst")
    val und = Graph.symmetrize(edges)
    val c = Graph.corenessOfUndirected(und, iterations = 6)
    val replay = Graph.hIndexRound(und, c).withColumnRenamed("c", "c2")
      .join(c, "node")
    assert(replay.filter(col("c") =!= col("c2")).count() == 0,
      "converged coreness must be a fixed point of one more round")
    // degree (iteration 0) on this graph is NOT yet coreness: the
    // certificate replay must flag at least one contracting node
    val c0 = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("c"))
    val replay0 = Graph.hIndexRound(und, c0).withColumnRenamed("c", "c2")
      .join(c0, "node")
    assert(replay0.filter(col("c") =!= col("c2")).count() > 0,
      "an unconverged score vector must fail the certificate")
  }
}
