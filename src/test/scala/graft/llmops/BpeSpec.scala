package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BPE training semantics on hand-checkable corpora. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learns the obvious merge and re-feeds merged symbols") {
    // "ababab" dominates: (a,b) wins round 1; round 2 must merge the
    // MERGED symbol pair (ab, ab) — proof the loop trains on its own
    // output, not the raw characters
    val docs = Seq("ababab ababab ababab", "cd cd").toDF("text")
    val (merges, vocab) = Bpe.train(docs, "text", 2, audit = true)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b"), ("ab", "ab")))
    assert(merges.head.weight == 9) // 3 tokens × 3 occurrences
    // round 1 (a≠b): applied == weight exactly; round 2 is a
    // SELF-pair — [ab,ab,ab] counts 2 slots × freq 3 = 6 but the
    // greedy fold consumes one per run: applied = 3
    assert(merges(0).symsBefore - merges(0).symsAfter == 9)
    assert(merges(1).weight == 6)
    assert(merges(1).symsBefore - merges(1).symsAfter == 3)
    val syms = vocab.filter($"tok" === "ababab").select("syms")
      .as[Seq[String]].head
    assert(syms == Seq("abab", "ab"))
  }

  test("greedy fold merges leftmost non-overlapping occurrences") {
    // "aaa" under rule (a,a): leftmost pair merges, third 'a' survives
    val docs = Seq("aaa aaa").toDF("text")
    val (merges, vocab) = Bpe.train(docs, "text", 1, audit = true)
    assert(merges.head.left == "a" && merges.head.right == "a")
    // adjacent counting sees both (a,a) slots in "aaa" (weight 2 × freq
    // 2 = 4) but the greedy fold consumes only the leftmost per run:
    // applied = 2 — the self-pair case of the conservation law
    assert(merges.head.weight == 4)
    assert(merges.head.symsBefore - merges.head.symsAfter == 2)
    val syms = vocab.filter($"tok" === "aaa").select("syms")
      .as[Seq[String]].head
    assert(syms == Seq("aa", "a"))
  }

  test("argmax tie-break is the (weight, left, right) total order") {
    // "xy" and "xz" both appear twice → tie; ("x","y") < ("x","z")
    val docs = Seq("xy xz", "xy xz").toDF("text")
    val (merges, _) = Bpe.train(docs, "text", 1)
    assert(merges.head.left == "x" && merges.head.right == "y")
  }

  test("training stops cleanly when no pairs remain") {
    val docs = Seq("a b c").toDF("text") // all 1-char tokens: no pairs
    val (merges, _) = Bpe.train(docs, "text", 5)
    assert(merges.isEmpty)
  }

  test("merge artifact roundtrip: loaded merges encode identically") {
    import org.apache.spark.sql.functions.col
    val docs = Seq("ababab ababab ababab", "cd cd", "abcd abcd").toDF("text")
    val (merges, vocab) = Bpe.train(docs, "text", 4)
    val path = java.nio.file.Files
      .createTempDirectory("graft_bpe_art").toString + "/merges"
    Bpe.saveMerges(spark, merges, path)
    val loaded = Bpe.loadMerges(spark, path)
    assert(loaded.map(m => (m.round, m.left, m.right, m.weight)) ==
      merges.map(m => (m.round, m.left, m.right, m.weight)))
    // serving with the LOADED artifact reproduces training's symbols
    val mismatches = vocab.select(col("tok"), col("syms"),
        Bpe.encodeColumn(Bpe.charSplit(col("tok")), loaded).as("enc"))
      .filter(!(col("syms") === col("enc"))).count()
    assert(mismatches == 0)
  }

  test("encodeColumn replays training exactly, including OOV tokens") {
    import org.apache.spark.sql.functions.col
    val docs = Seq("ababab ababab ababab", "cd cd").toDF("text")
    val (merges, vocab) = Bpe.train(docs, "text", 2)
    // trained tokens: raw chars + rank-ordered replay == final vocab
    val enc = vocab.select(col("tok"), col("syms"),
      Bpe.encodeColumn(Bpe.charSplit(col("tok")), merges).as("encoded"))
    val mismatches = enc.filter(!(col("syms") === col("encoded"))).count()
    assert(mismatches == 0)
    // OOV token never seen in training: merges still apply greedily
    // where they match ("ab" inside "xabay"), untouched chars survive
    val oov = Seq("xabay").toDF("tok")
      .select(Bpe.encodeColumn(Bpe.charSplit(col("tok")), merges).as("e"))
      .as[Seq[String]].head
    assert(oov == Seq("x", "ab", "a", "y"))
    // self-pair rule on an OOV run: leftmost-greedy, like training
    val (selfMerges, _) = Bpe.train(Seq("aaa aaa").toDF("text"), "text", 1)
    val run = Seq("aaaa").toDF("tok")
      .select(Bpe.encodeColumn(Bpe.charSplit(col("tok")), selfMerges).as("e"))
      .as[Seq[String]].head
    assert(run == Seq("aa", "aa"))
    // empty merge list: encoding is the identity char split
    val none = Seq("ab").toDF("tok")
      .select(Bpe.encodeColumn(Bpe.charSplit(col("tok")), Nil).as("e"))
      .as[Seq[String]].head
    assert(none == Seq("a", "b"))
  }
}
