package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ManifestTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_manifest")
    java.nio.file.Files.delete(d) // table dir is created by the commit
    d.toString
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("append commits are atomic versions; time travel reads back") {
    val t = tmpTable()
    val v1 = ManifestTable.commitOverwrite(spark, t,
      (1L to 10L).toDF("id"))
    val v2 = ManifestTable.commitAppend(spark, t,
      (11L to 15L).toDF("id"))
    assert((v1, v2) == (1L, 2L))
    assert(ids(ManifestTable.read(spark, t)) == (1L to 15L))
    assert(ids(ManifestTable.read(spark, t, Some(1L))) == (1L to 10L))
  }

  test("readers are pinned to their snapshot across an overwrite") {
    val t = tmpTable()
    ManifestTable.commitOverwrite(spark, t, (1L to 5L).toDF("id"))
    val pinned = ManifestTable.read(spark, t) // resolves v1's file list
    ManifestTable.commitOverwrite(spark, t, (100L to 102L).toDF("id"))
    assert(ids(pinned) == (1L to 5L), "v1 reader saw v2's rows")
    assert(ids(ManifestTable.read(spark, t)) == (100L to 102L))
  }

  test("compact rewrites files, keeps rows, and old versions intact") {
    val t = tmpTable()
    ManifestTable.commitOverwrite(spark, t,
      (1L to 100L).toDF("id").repartition(8))
    val v2 = ManifestTable.compact(spark, t, targetFiles = 2)
    assert(ids(ManifestTable.read(spark, t)) == (1L to 100L))
    assert(ManifestTable.read(spark, t).inputFiles.length == 2)
    // pre-compaction snapshot still reads its own (small) files
    assert(ids(ManifestTable.read(spark, t, Some(v2 - 1))) == (1L to 100L))
    assert(ManifestTable.read(spark, t, Some(v2 - 1))
      .inputFiles.length == 8)
  }

  test("vacuum deletes only files no retained version references") {
    val t = tmpTable()
    ManifestTable.commitOverwrite(spark, t,
      (1L to 50L).toDF("id").repartition(4))
    ManifestTable.compact(spark, t, targetFiles = 1)
    ManifestTable.commitAppend(spark, t, (51L to 60L).toDF("id"))
    // keep v2 (compacted) + v3 (append): v1's four small files orphan
    val deleted = ManifestTable.vacuum(spark, t, keepVersions = 2,
      minFileAgeMs = 0L)
    assert(deleted.length == 4, s"deleted: $deleted")
    assert(ids(ManifestTable.read(spark, t)) == (1L to 60L))
    assert(ids(ManifestTable.read(spark, t, Some(2L))) == (1L to 50L))
    intercept[Exception] { // v1's manifest is expired
      ManifestTable.read(spark, t, Some(1L)).collect()
    }
  }

  test("vacuum under a live pinned reader: retained survives, expired " +
    "fails with the documented missing-file error") {
    val t = tmpTable()
    ManifestTable.commitOverwrite(spark, t,
      (1L to 40L).toDF("id").repartition(4))         // v1: 4 small files
    val pinnedExpired = ManifestTable.read(spark, t, Some(1L))
    ManifestTable.compact(spark, t, targetFiles = 1) // v2
    ManifestTable.commitAppend(spark, t, (41L to 45L).toDF("id")) // v3
    val pinnedRetained = ManifestTable.read(spark, t, Some(2L))
    // keep v2+v3: v1 expires and its 4 exclusive files are reclaimed
    // WHILE both readers hold their frozen file lists
    val deleted = ManifestTable.vacuum(spark, t, keepVersions = 2,
      minFileAgeMs = 0L)
    assert(deleted.length == 4, s"deleted: $deleted")
    // retained-version reader: completely unaffected by the vacuum
    assert(ids(pinnedRetained) == (1L to 40L))
    // expired-version reader: fails at action time with the store's
    // missing-file error (the documented contract — retention must
    // cover the longest-running reader), never silently partial rows
    val e = intercept[Exception] { pinnedExpired.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c =>
      c.isInstanceOf[java.io.FileNotFoundException] ||
        c.getMessage != null && (c.getMessage.contains("does not exist")
          || c.getMessage.contains("FileNotFound"))),
      s"expected a missing-file failure, got: $e")
  }

  test("readAppendsSince delivers only new rows; rewrites fail loudly") {
    val t = tmpTable()
    ManifestTable.commitOverwrite(spark, t, (1L to 5L).toDF("id"))
    ManifestTable.commitAppend(spark, t, (6L to 8L).toDF("id"))
    ManifestTable.commitAppend(spark, t, (9L to 10L).toDF("id"))
    assert(ids(ManifestTable.readAppendsSince(spark, t, 1L)) ==
      (6L to 10L))
    assert(ids(ManifestTable.readAppendsSince(spark, t, 2L)) ==
      (9L to 10L))
    // caught up: empty frame, same schema
    val upToDate = ManifestTable.readAppendsSince(spark, t, 3L)
    assert(upToDate.count() == 0 &&
      upToDate.columns.toSeq == Seq("id"))
    // compaction rewrites rows into new files — a file diff would
    // re-deliver them, so the incremental read must refuse
    ManifestTable.compact(spark, t, targetFiles = 1)
    val e = intercept[IllegalArgumentException] {
      ManifestTable.readAppendsSince(spark, t, 2L)
    }
    assert(e.getMessage.contains("re-sync"))
  }

  test("syncAppends: full first load, delta steady state, crash redelivery") {
    val t = tmpTable()
    val state = s"${tmpTable()}/sync.version"
    ManifestTable.commitOverwrite(spark, t, (1L to 5L).toDF("id"))
    var seen = Seq.empty[Seq[Long]]
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      seen = seen :+ ids(df)

    // first run: full snapshot
    assert(ManifestTable.syncAppends(spark, t, state)(sink) == 1L)
    assert(seen == Seq(1L to 5L))
    // caught up: process not invoked
    assert(ManifestTable.syncAppends(spark, t, state)(sink) == 1L)
    assert(seen.size == 1)
    // steady state: only the appended rows
    ManifestTable.commitAppend(spark, t, (6L to 7L).toDF("id"))
    assert(ManifestTable.syncAppends(spark, t, state)(sink) == 2L)
    assert(seen.last == (6L to 7L))
    // crash mid-process: state not advanced, batch redelivered
    ManifestTable.commitAppend(spark, t, (8L to 9L).toDF("id"))
    intercept[RuntimeException] {
      ManifestTable.syncAppends(spark, t, state) { _ =>
        sys.error("sink down")
      }
    }
    assert(ManifestTable.syncAppends(spark, t, state)(sink) == 3L)
    assert(seen.last == (8L to 9L))
  }

  test("staged-but-unpublished files are invisible to readers") {
    val t = tmpTable()
    ManifestTable.commitOverwrite(spark, t, (1L to 3L).toDF("id"))
    // simulate a crashed writer: files land in data/ with no manifest
    val orphan = new org.apache.hadoop.fs.Path(s"$t/data/orphan.parquet")
    (90L to 95L).toDF("id").coalesce(1)
      .write.parquet(s"$t/_crash_tmp")
    val f = orphan.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = f.listStatus(new org.apache.hadoop.fs.Path(s"$t/_crash_tmp"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    f.rename(part, orphan)
    assert(ids(ManifestTable.read(spark, t)) == (1L to 3L),
      "reader listed data/ instead of the manifest")
    // vacuum reclaims the crash leftover
    val deleted = ManifestTable.vacuum(spark, t, keepVersions = 1,
      minFileAgeMs = 0L)
    assert(deleted.contains("orphan.parquet"))
  }

  test("two writers racing commitAppend lose no commit; versions dense") {
    // the optimistic-concurrency contract under REAL contention: both
    // threads hammer the same head; the loser of each
    // create-no-overwrite must land on the NEXT version with its file
    // list rebased (not overwrite the winner, not vanish). The local
    // commit is a hard-link create — atomic-and-exclusive at the
    // kernel — so this spec is deterministic, not
    // probably-won't-collide.
    val t = tmpTable()
    ManifestTable.commitOverwrite(spark, t, Seq(0L).toDF("id"))
    val nPer = 5
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { w =>
      new Thread(() => {
        try {
          barrier.await()
          for (i <- 1 to nPer)
            ManifestTable.commitAppend(spark, t,
              Seq(((w + 1) * 100 + i).toLong).toDF("id"))
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"racing commit threw: $errs")
    val head = ManifestTable.latestVersion(spark, t)
    assert(head == 1 + 2 * nPer,
      s"expected dense versions to ${1 + 2 * nPer}, head is $head")
    assert(ids(ManifestTable.read(spark, t)) ==
      (Seq(0L) ++ (1 to nPer).map(_ + 100L) ++ (1 to nPer).map(_ + 200L))
        .sorted,
      "a racing writer's rows were lost")
    // every version must read back whole (no torn manifest), and each
    // append's rows must stay present from their commit version onward
    (1L to head).sliding(2).foreach { case Seq(a, b) =>
      val before = ids(ManifestTable.read(spark, t, Some(a))).toSet
      val after = ids(ManifestTable.read(spark, t, Some(b))).toSet
      assert(before.subsetOf(after),
        s"version $b dropped rows committed by version $a")
      assert(after.size == before.size + 1) // exactly one append landed
    }
  }

  test("readPruned skips disjoint files, keeps straddlers, and NEVER " +
    "prunes stats-less files") {
    val t = java.nio.file.Files.createTempDirectory("graft_prune").toString
    def batch(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"r$i")).toDF("k", "v").repartition(1)
    // two stats-bearing commits with disjoint key ranges...
    ManifestTable.commitAppend(spark, t, batch(0, 100), Some("k"))
    ManifestTable.commitAppend(spark, t, batch(100, 200), Some("k"))
    // ...and one commit WITHOUT stats (e.g. an old writer)
    ManifestTable.commitAppend(spark, t, batch(200, 300))

    // query inside file 1 only: file 2 pruned, stats-less file kept
    val pr = ManifestTable.readPruned(spark, t, "k", 10, 20)
    assert(pr.filesTotal == 3 && pr.filesKept == 2)
    assert(pr.df.filter($"k".between(10, 20)).count() == 11)

    // straddling range: both stats files kept
    val pr2 = ManifestTable.readPruned(spark, t, "k", 90, 110)
    assert(pr2.filesKept == 3)
    assert(pr2.df.filter($"k".between(90, 110)).count() == 21)

    // pruning on an untracked column keeps everything (safe fallback)
    val pr3 = ManifestTable.readPruned(spark, t, "nope", 0, 1)
    assert(pr3.filesKept == 3)

    // compaction rewrites files without stats: pruning degrades to
    // keep-all, never to wrong answers
    ManifestTable.compact(spark, t, targetFiles = 1)
    val pr4 = ManifestTable.readPruned(spark, t, "k", 10, 20)
    assert(pr4.filesKept == pr4.filesTotal)
    assert(pr4.df.count() == 300)

    // compactSorted re-clusters AND re-records stats: pruning works
    // again on the rewritten layout, rows still intact
    ManifestTable.compactSorted(spark, t, targetFiles = 3,
      clusterCol = "k")
    val pr5 = ManifestTable.readPruned(spark, t, "k", 10, 20)
    assert(pr5.filesTotal == 3 && pr5.filesKept < pr5.filesTotal,
      s"sorted compaction lost pruning: ${pr5.filesKept}/${pr5.filesTotal}")
    assert(pr5.df.filter($"k".between(10, 20)).count() == 11)
    assert(ManifestTable.read(spark, t).count() == 300)
  }

  test("create-race classification: retry only genuine already-exists " +
    "collisions, however delivered") {
    import graft.sources.ManifestTable.isCreateRace
    // the three documented deliveries
    assert(isCreateRace(
      new org.apache.hadoop.fs.FileAlreadyExistsException("m")))
    assert(isCreateRace(
      new java.nio.file.FileAlreadyExistsException("/p")))
    assert(isCreateRace(new org.apache.hadoop.ipc.RemoteException(
      "org.apache.hadoop.hdfs.protocol.AlreadyBeingCreatedException",
      "already being created")))
    // name-matched direct delivery + a SUBCLASS of it (an hdfs client
    // upgrade subclassing the race exception must classify the same)
    assert(isCreateRace(new AlreadyBeingCreatedException))
    assert(isCreateRace(new SubclassedRace))
    // NOT races: persistent failures must rethrow, not burn retries
    assert(!isCreateRace(new java.io.IOException("quota exceeded")))
    assert(!isCreateRace(
      new org.apache.hadoop.security.AccessControlException("denied")))
    assert(!isCreateRace(new org.apache.hadoop.ipc.RemoteException(
      "org.apache.hadoop.security.AccessControlException", "denied")))
  }

  test("deleteRows: copy-on-write, stats-pruned, pinned version intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mt_del")
    val tbl = s"$dir/t"
    import spark.implicits._
    val v1 = ManifestTable.commitOverwrite(spark, tbl,
      (1L to 300L).toDF("k").repartitionByRange(3, $"k")
        .sortWithinPartitions("k"),
      statsCol = Some("k"))
    val v1Files = ManifestTable.read(spark, tbl, Some(v1))
      .inputFiles.toSet
    val res = ManifestTable.deleteRows(spark, tbl, "k", Seq(5L, 7L, 9L))
    assert(res.version == v1 + 1)
    // the doomed keys live in ONE range-clustered file: exactly one
    // rewritten, the rest carried forward verbatim
    assert(res.rewrittenFiles == 1 && res.untouchedFiles == 2,
      s"expected 1 rewrite / 2 untouched, got $res")
    val after = ManifestTable.read(spark, tbl)
    assert(after.count() == 297)
    assert(after.filter($"k".isin(5L, 7L, 9L)).count() == 0)
    // untouched files are the SAME physical files (copy-on-write, not
    // copy-everything)
    assert((after.inputFiles.toSet & v1Files).size == 2)
    // pinned pre-delete version still serves the doomed keys
    assert(ManifestTable.read(spark, tbl, Some(v1))
      .filter($"k".isin(5L, 7L, 9L)).count() == 3)
    // rewritten file carries FRESH stats: pruning still works after
    val pr = ManifestTable.readPruned(spark, tbl, "k", 1, 10)
    assert(pr.filesKept < pr.filesTotal)
    // a no-op delete (keys outside every range) rewrites nothing
    val res2 = ManifestTable.deleteRows(spark, tbl, "k", Seq(9999L))
    assert(res2.rewrittenFiles == 0 &&
      res2.version == res.version) // no new version for a no-op
    // keys on a STATS-LESS table rewrite everything (never prune blind)
    val tbl2 = s"$dir/t2"
    ManifestTable.commitOverwrite(spark, tbl2,
      (1L to 100L).toDF("k").repartition(2))
    val res3 = ManifestTable.deleteRows(spark, tbl2, "k", Seq(1L))
    assert(res3.untouchedFiles == 0)
    assert(ManifestTable.read(spark, tbl2).count() == 99)
  }

  test("mergeRows: upsert with range pruning; empty merge is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mt_mrg")
    val tbl = s"$dir/t"
    import spark.implicits._
    val v1 = ManifestTable.commitOverwrite(spark, tbl,
      (1L to 300L).map(k => (k, s"old$k")).toDF("k", "payload")
        .repartitionByRange(3, $"k").sortWithinPartitions("k"),
      statsCol = Some("k"))
    val v1Files = ManifestTable.read(spark, tbl, Some(v1))
      .inputFiles.toSet
    // range-local batch: update keys 5/7, insert key 0 — only the low
    // file overlaps [0, 7]
    val res = ManifestTable.mergeRows(spark, tbl, "k",
      Seq((5L, "new5"), (7L, "new7"), (0L, "new0"))
        .toDF("k", "payload"))
    assert(res.version == v1 + 1)
    assert(res.rewrittenFiles == 1 && res.untouchedFiles == 2, s"$res")
    val after = ManifestTable.read(spark, tbl)
    assert(after.count() == 301) // 300 - 2 replaced + 2 new forms + 1 insert
    val m = after.filter($"k".isin(0L, 5L, 7L, 9L))
      .as[(Long, String)].collect().toMap
    assert(m == Map(0L -> "new0", 5L -> "new5", 7L -> "new7",
      9L -> "old9"))
    // copy-on-write: untouched files physically identical
    assert((after.inputFiles.toSet & v1Files).size == 2)
    // pinned pre-merge version unchanged
    assert(ManifestTable.read(spark, tbl, Some(v1))
      .filter($"k" === 5L).as[(Long, String)].head()._2 == "old5")
    // empty updates: no-op, no new version
    val res2 = ManifestTable.mergeRows(spark, tbl, "k",
      Seq.empty[(Long, String)].toDF("k", "payload"))
    assert(res2.version == res.version && res2.rewrittenFiles == 0)
  }

  test("deleteMatching: composite-key anti-join delete with range " +
    "pruning; NULL-key targets survive; absent tuples absorbed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mt_delm")
    val tbl = s"$dir/t"
    import spark.implicits._
    // (k, sub) composite rows, range-clustered on k into 3 files;
    // one row carries a NULL sub — it must survive ANY delete
    val rows = (1L to 300L).map(k => (k, k % 3, s"p$k")) :+
      (301L, -1L, "nullsub")
    val v1 = ManifestTable.commitOverwrite(spark, tbl,
      rows.toDF("k", "sub", "payload")
        .withColumn("sub", org.apache.spark.sql.functions
          .when($"sub" === -1L, org.apache.spark.sql.functions.lit(null))
          .otherwise($"sub"))
        .repartitionByRange(3, $"k").sortWithinPartitions("k"),
      statsCol = Some("k"))
    val v1Files = ManifestTable.read(spark, tbl, Some(v1))
      .inputFiles.toSet
    // doomed batch: (5, 2) and (7, 1) exist; (5, 0) does NOT (sub
    // mismatch — composite key semantics); (12, 0) exists. All in the
    // low range file; duplicates in the batch are fine.
    val res = ManifestTable.deleteMatching(spark, tbl, "k",
      Seq((5L, 2L), (7L, 1L), (5L, 0L), (12L, 0L), (5L, 2L))
        .toDF("k", "sub"))
    assert(res.version == v1 + 1)
    assert(res.rewrittenFiles == 1 && res.untouchedFiles == 2, s"$res")
    val after = ManifestTable.read(spark, tbl)
    assert(after.count() == 298) // 301 - 3 matching tuples
    assert(after.filter($"k" === 5L || $"k" === 7L || $"k" === 12L)
      .count() == 0)
    assert(after.filter($"k" === 6L).count() == 1) // neighbors intact
    // NULL-sub target row survives (null never matches a doomed tuple)
    assert(after.filter($"sub".isNull).count() == 1)
    // copy-on-write: untouched files physically identical
    assert((after.inputFiles.toSet & v1Files).size == 2)
    // pinned pre-delete version still serves the doomed tuples
    assert(ManifestTable.read(spark, tbl, Some(v1))
      .filter($"k" === 5L).count() == 1)
    // empty batch: no-op, no new version
    val res2 = ManifestTable.deleteMatching(spark, tbl, "k",
      Seq.empty[(Long, Long)].toDF("k", "sub"))
    assert(res2.version == res.version && res2.rewrittenFiles == 0)
    // out-of-range batch: pruned to a no-op (no file overlaps)
    val res3 = ManifestTable.deleteMatching(spark, tbl, "k",
      Seq((9999L, 0L)).toDF("k", "sub"))
    assert(res3.rewrittenFiles == 0 && res3.version == res.version)
    // NULL pruning keys rejected loudly
    intercept[IllegalArgumentException] {
      ManifestTable.deleteMatching(spark, tbl, "k",
        Seq((Some(1L), 0L), (None, 2L))
          .toDF("k", "sub"))
    }
    // pruning column must be part of the match key
    intercept[IllegalArgumentException] {
      ManifestTable.deleteMatching(spark, tbl, "k",
        Seq((1L, 2L)).toDF("a", "b"))
    }
  }

  test("DML idempotence + the compliance erasure clock end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mt_clock")
    val tbl = s"$dir/t"
    import spark.implicits._
    ManifestTable.commitOverwrite(spark, tbl,
      (1L to 300L).map(k => (k, s"p$k")).toDF("k", "payload")
        .repartitionByRange(3, $"k").sortWithinPartitions("k"),
      statsCol = Some("k"))
    // crash-retry convergence: re-running the same delete converges on
    // the same content (the retry of a failed orchestration step)
    val d1 = ManifestTable.deleteRows(spark, tbl, "k", Seq(5L, 7L))
    val afterOnce = ManifestTable.read(spark, tbl)
      .as[(Long, String)].collect().toSet
    val d2 = ManifestTable.deleteRows(spark, tbl, "k", Seq(5L, 7L))
    assert(ManifestTable.read(spark, tbl)
      .as[(Long, String)].collect().toSet == afterOnce)
    // same for merge: the second identical merge rewrites, but content
    // is byte-for-byte the same relation
    ManifestTable.mergeRows(spark, tbl, "k",
      Seq((9L, "new9")).toDF("k", "payload"))
    val afterMerge = ManifestTable.read(spark, tbl)
      .as[(Long, String)].collect().toSet
    ManifestTable.mergeRows(spark, tbl, "k",
      Seq((9L, "new9")).toDF("k", "payload"))
    assert(ManifestTable.read(spark, tbl)
      .as[(Long, String)].collect().toSet == afterMerge)
    // erasure clock: after the retention window expires the pre-delete
    // versions, vacuum physically reclaims the files that still held
    // the doomed rows — and only then does the pinned reader break
    val pinnedPre = ManifestTable.read(spark, tbl, Some(d1.version - 1))
    val deleted = ManifestTable.vacuum(spark, tbl, keepVersions = 1,
      minFileAgeMs = 0L)
    assert(deleted.nonEmpty,
      "vacuum must reclaim the rewritten-away pre-delete files")
    assert(ManifestTable.read(spark, tbl)
      .filter($"k".isin(5L, 7L)).count() == 0)
    intercept[Exception] { pinnedPre.filter($"k" === 5L).count() }
    assert(d2.version == d1.version + 1)
  }

  test("countRows: metadata-only count per version; legacy entries -> None") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mt_cnt")
    val tbl = s"$dir/t"
    import spark.implicits._
    val v1 = ManifestTable.commitOverwrite(spark, tbl,
      (1 to 100).toDF("v").repartition(3))
    val v2 = ManifestTable.commitAppend(spark, tbl,
      (1 to 40).toDF("v"))
    assert(ManifestTable.countRows(spark, tbl, Some(v1)).contains(100L))
    assert(ManifestTable.countRows(spark, tbl, Some(v2)).contains(140L))
    assert(ManifestTable.countRows(spark, tbl).contains(140L))
    // a legacy manifest entry without the #rows tag poisons the fast
    // path to None (fall back to the scan, never a wrong number)
    val p = new org.apache.hadoop.fs.Path(s"$tbl/_manifests")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val mf = fs.listStatus(p).map(_.getPath)
      .find(_.getName.endsWith(f"v$v2%09d.txt")).get
    val lines = scala.io.Source.fromInputStream(fs.open(mf), "UTF-8")
      .getLines().toList
    val legacy = lines.head.split('\t').head +: lines.tail
    val out = fs.create(mf, true)
    try out.write((legacy.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    assert(ManifestTable.countRows(spark, tbl, Some(v2)).isEmpty)
    // the stats-free legacy entry still reads fine (kept-by-default)
    assert(ManifestTable.read(spark, tbl, Some(v2)).count() == 140L)
  }

  test("deleteRows keeps NULL-key rows; empty key list is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mt_null")
    val tbl = s"$dir/t"
    import spark.implicits._
    // 10 keyed rows + 3 NULL-key rows, all in ONE file so the NULL
    // rows sit inside a touched file (the failure mode: a bare !isin
    // NULLs them out of the rewrite while identical rows in untouched
    // files would survive — inconsistent silent loss)
    val rows = (1L to 10L).map(k => (Some(k), s"p$k")) ++
      Seq((None, "n1"), (None, "n2"), (None, "n3"))
    ManifestTable.commitOverwrite(spark, tbl,
      rows.toDF("k", "payload").repartition(1), statsCol = Some("k"))
    val res = ManifestTable.deleteRows(spark, tbl, "k", Seq(5L))
    assert(res.rewrittenFiles == 1)
    val after = ManifestTable.read(spark, tbl)
    assert(after.count() == 12, "NULL-key rows were silently deleted")
    assert(after.filter($"k".isNull).count() == 3)
    assert(after.filter($"k" === 5L).count() == 0)
    // empty key list: nothing to delete — no rewrite, no commit (the
    // old code rewrote EVERY stats-less file with an isin() that
    // dropped its NULL rows)
    val res2 = ManifestTable.deleteRows(spark, tbl, "k", Seq.empty)
    assert(res2.version == res.version && res2.rewrittenFiles == 0)
    assert(ManifestTable.read(spark, tbl).count() == 12)
  }

  test("mergeRows rejects NULL keys and duplicate keys loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mt_badmrg")
    val tbl = s"$dir/t"
    import spark.implicits._
    val v1 = ManifestTable.commitOverwrite(spark, tbl,
      (1L to 20L).map(k => (k, s"old$k")).toDF("k", "payload"),
      statsCol = Some("k"))
    // all-NULL keys is NOT "empty updates": min(k) is NULL for both,
    // but silently discarding real rows is data loss — reject
    val eNull = intercept[IllegalArgumentException] {
      ManifestTable.mergeRows(spark, tbl, "k",
        Seq((None: Option[Long], "x")).toDF("k", "payload"))
    }
    assert(eNull.getMessage.contains("NULL"))
    // duplicate source keys: Delta MERGE's multiple-source-matches
    val eDup = intercept[IllegalArgumentException] {
      ManifestTable.mergeRows(spark, tbl, "k",
        Seq((5L, "a"), (5L, "b")).toDF("k", "payload"))
    }
    assert(eDup.getMessage.contains("duplicate"))
    // neither rejected call committed anything
    assert(ManifestTable.latestVersion(spark, tbl) == v1)
    assert(ManifestTable.read(spark, tbl)
      .filter($"k" === 5L).as[(Long, String)].head()._2 == "old5")
  }

  test("two concurrent disjoint-key deletes BOTH land (loser re-plans)") {
    // the first concurrency shape a compliance pipeline hits at scale:
    // two erasure batches over the same table. Both threads plan
    // against the same head and touch the SAME file; the commit-race
    // loser must detect that its touched entry was rewritten and
    // recompute against the winner's head — the old filterNot rebase
    // silently resurrected the winner's deletions.
    val dir = java.nio.file.Files.createTempDirectory("graft_mt_dmlrace")
    val tbl = s"$dir/t"
    import spark.implicits._
    ManifestTable.commitOverwrite(spark, tbl,
      (1L to 100L).toDF("k").repartition(1), statsCol = Some("k"))
    val keySets = Seq(Seq(3L, 5L), Seq(80L, 90L))
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = keySets.map { ks =>
      new Thread(() => {
        try { barrier.await(); ManifestTable.deleteRows(spark, tbl, "k", ks) }
        catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing delete threw: $errs")
    val after = ManifestTable.read(spark, tbl)
    assert(after.count() == 96, "a racing delete's rows were resurrected")
    assert(after.filter($"k".isin(3L, 5L, 80L, 90L)).count() == 0)
    // aborted attempts' staged files are plain vacuum fodder
    ManifestTable.vacuum(spark, tbl, keepVersions = 1, force = true,
      minFileAgeMs = 0L)
    assert(ids(ManifestTable.read(spark, tbl).select($"k".as("id"))) ==
      (1L to 100L).filterNot(Set(3L, 5L, 80L, 90L)))
  }

  test("deleteRows racing compact: doomed rows never resurrect, " +
    "compact never drops a concurrent append") {
    // compact is a logical no-op, so whatever the interleaving the
    // final content must equal "delete applied, append applied". The
    // old overwrite-based compact could republish pre-delete files
    // (resurrection) or drop a concurrent append.
    val dir = java.nio.file.Files.createTempDirectory("graft_mt_cmprace")
    val tbl = s"$dir/t"
    import spark.implicits._
    ManifestTable.commitOverwrite(spark, tbl,
      (1L to 100L).toDF("k").repartition(4), statsCol = Some("k"))
    val barrier = new java.util.concurrent.CyclicBarrier(3)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ops: Seq[() => Unit] = Seq(
      () => { ManifestTable.deleteRows(spark, tbl, "k", Seq(10L, 20L)); () },
      () => { ManifestTable.compact(spark, tbl, targetFiles = 1); () },
      () => { ManifestTable.commitAppend(spark, tbl,
        Seq(101L).toDF("k"), statsCol = Some("k")); () })
    val threads = ops.map { op =>
      new Thread(() => {
        try { barrier.await(); op() }
        catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing ops threw: $errs")
    val got = ManifestTable.read(spark, tbl).select($"k")
      .as[Long].collect().sorted.toSeq
    assert(got == ((1L to 100L).filterNot(Set(10L, 20L)) :+ 101L),
      "content diverged from the serial delete+append outcome")
  }

  test("vacuum racing a DML rebase loser: staged files reclaimed " +
    "between re-plan and retry commit force another re-plan — the " +
    "delete lands on live files, never as dangling references") {
    // The last DML/vacuum corner: attempt 1 loses to a concurrent
    // compact (its touched files were rewritten); attempt 2 re-plans
    // and re-stages, and a vacuum then reclaims those staged (still
    // manifest-less) files before the retry commit. Publishing anyway
    // would commit a manifest referencing deleted files — the
    // stagedLive re-check must instead force attempt 3.
    val dir = java.nio.file.Files.createTempDirectory("graft_mt_vacrace")
    val tbl = s"$dir/t"
    import spark.implicits._
    ManifestTable.commitOverwrite(spark, tbl,
      (1L to 100L).toDF("k").repartition(2), statsCol = Some("k"))
    var stagings = 0
    ManifestTable.onDmlStaged = () => {
      stagings += 1
      val n = stagings
      val saved = ManifestTable.onDmlStaged
      ManifestTable.onDmlStaged = () => () // compact re-enters publishDml
      try {
        if (n == 1) // attempt 1 becomes the rebase LOSER
          ManifestTable.compactSorted(spark, tbl, targetFiles = 1,
            clusterCol = "k")
        else if (n == 2) // vacuum eats the loser's re-staged files
          ManifestTable.vacuum(spark, tbl, keepVersions = 1, force = true,
            minFileAgeMs = 0L)
      } finally ManifestTable.onDmlStaged = saved
    }
    try {
      val res = ManifestTable.deleteRows(spark, tbl, "k", Seq(7L, 42L))
      assert(stagings == 3,
        s"expected attempt 3 to commit (got $stagings stagings)")
      assert(res.version == ManifestTable.latestVersion(spark, tbl))
    } finally ManifestTable.onDmlStaged = () => ()
    // the committed head references only LIVE files and correct content
    val after = ManifestTable.read(spark, tbl).select($"k")
      .as[Long].collect().sorted.toSeq
    assert(after == (1L to 100L).filterNot(Set(7L, 42L)),
      "delete content diverged after the vacuum race")
    after.foreach(_ => ()) // full scan above already proves readability
  }

  test("vacuum minFileAgeMs grace window: fresh unreferenced files " +
    "(an in-flight commit's staging) survive; aged ones reclaim") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mt_vage")
    val tbl = s"$dir/t"
    import spark.implicits._
    ManifestTable.commitOverwrite(spark, tbl, Seq(1L, 2L).toDF("k"))
    // orphan file, as an in-flight writer's staging would look
    val orphan = java.nio.file.Paths.get(s"$tbl/data/part-orphan.parquet")
    java.nio.file.Files.write(orphan, Array[Byte](1, 2, 3))
    assert(ManifestTable.vacuum(spark, tbl, keepVersions = 1,
      minFileAgeMs = 3600L * 1000).isEmpty,
      "grace window must not reclaim a fresh unreferenced file")
    assert(java.nio.file.Files.exists(orphan))
    assert(ManifestTable.vacuum(spark, tbl, keepVersions = 1,
      minFileAgeMs = 0L) ==
      Seq("part-orphan.parquet"),
      "age-expired orphan must reclaim with the window off")
  }

  test("vacuum refuses to reclaim inside the declared min-retained " +
    "window; force overrides") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mt_vgrd")
    val tbl = s"$dir/t"
    import spark.implicits._
    ManifestTable.commitOverwrite(spark, tbl, Seq(1L).toDF("id"))
    ManifestTable.commitOverwrite(spark, tbl, Seq(2L).toDF("id"))
    ManifestTable.commitOverwrite(spark, tbl, Seq(3L).toDF("id"))
    val e = intercept[IllegalArgumentException] {
      ManifestTable.vacuum(spark, tbl, keepVersions = 1,
        minRetainedVersions = 3)
    }
    assert(e.getMessage.contains("min-retained"))
    // refused vacuum deleted nothing: every version still reads
    assert(ids(ManifestTable.read(spark, tbl, Some(1L))) == Seq(1L))
    // the explicit operator override proceeds
    val deleted = ManifestTable.vacuum(spark, tbl, keepVersions = 1,
      minRetainedVersions = 3, force = true, minFileAgeMs = 0L)
    assert(deleted.nonEmpty)
    assert(ids(ManifestTable.read(spark, tbl)) == Seq(3L))
  }
}

/** Mimics org.apache.hadoop.hdfs.protocol.AlreadyBeingCreatedException
  * (not a compile-time dependency) for the name-suffix classification. */
private class AlreadyBeingCreatedException extends java.io.IOException
private class SubclassedRace extends AlreadyBeingCreatedException
