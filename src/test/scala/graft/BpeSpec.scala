package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges: counts weighted by word frequency, greedy merge, early stop") {
    // vocab: aa x2, ab x1 -> pairs (a,a):2, (a,b):1
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val ms = Bpe.learnMerges(docs, "text", numMerges = 5)
    // merge 1: (a,a) cnt 2; after " a a "->" aa ", 'ab' still " a b "
    // merge 2: (a,b) cnt 1; then no pairs remain -> stops at 2 of 5
    assert(ms.map(m => (m.rank, m.left, m.right, m.count)) ==
      Seq((1, "a", "a", 2L), (2, "a", "b", 1L)))
  }

  test("learnMerges tie on count breaks to the lexicographically smallest pair") {
    val docs = Seq((1L, "cd ab cd ab")).toDF("doc_id", "text")
    val ms = Bpe.learnMerges(docs, "text", numMerges = 1)
    assert(ms.head.left == "a" && ms.head.right == "b")
  }

  test("learnMerges applies merges left-to-right non-overlapping (aaa -> aa+a)") {
    // 'aaa' x1: pairs (a,a):2 within the word? No — adjacent pair count
    // is positional: ' a a a ' has two (a,a) slots, weight 1 each = 2.
    // After merging (a,a): ' aa a ' — greedy left-to-right, one merge
    // consumed the shared middle symbol. Next round's best is (aa,a).
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val ms = Bpe.learnMerges(docs, "text", numMerges = 2)
    assert(ms.map(m => (m.left, m.right)) == Seq(("a", "a"), ("aa", "a")))
  }

  test("segmentStats: per-doc subword counts under a partial merge list") {
    val docs = Seq((1L, "aa ab"), (2L, "b")).toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge(1, "a", "a", 2L)) // only (a,a) learned
    val out = Bpe.segmentStats(docs, "doc_id", "text", merges)
      .orderBy(col("doc_id")).collect()
    // doc 1: 'aa' -> [aa] 1 subword; 'ab' -> [a, b] 2 subwords
    assert((out(0).getLong(1), out(0).getLong(2), out(0).getDouble(3)) ==
      ((2L, 3L, 1.5)))
    // doc 2: single char word
    assert((out(1).getLong(1), out(1).getLong(2), out(1).getDouble(3)) ==
      ((1L, 1L, 1.0)))
  }

  test("merge application is greedy left-to-right on repeated-symbol runs (aaaa -> aa aa)") {
    // ' a a a a ': greedy scan merges positions (1,2) and (3,4) ->
    // [aa, aa]. A single literal replace(' a a ',' aa ') would eat the
    // shared boundary space and stop at [aa, a, a] — and the surviving
    // (a,a) occurrences would then re-win later rounds. With the fold,
    // round 2's best pair is (aa,aa).
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val ms = Bpe.learnMerges(docs, "text", numMerges = 2)
    assert(ms.map(m => (m.left, m.right, m.count)) ==
      Seq(("a", "a", 3L), ("aa", "aa", 1L)))
    // and segmentation with only merge 1 yields 2 subwords, not 3
    val seg = Bpe.segmentStats(docs, "doc_id", "text", ms.take(1)).collect()
    assert(seg(0).getLong(2) == 2L)
  }

  test("checkpointed trainer learns the identical merge list") {
    // maxDriverVocab = 0 forces the distributed round loop — the
    // checkpoint cadence is inert on the driver fast path
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plain = Bpe.learnMerges(docs, "text", numMerges = 12,
      checkpointEvery = 1000, maxDriverVocab = 0) // never snapshots
    val snapped = Bpe.learnMerges(docs, "text", numMerges = 12,
      checkpointEvery = 4, maxDriverVocab = 0) // 3 snapshots
    assert(plain == snapped)
  }

  test("driver fast path learns the identical merge list to the distributed loop") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dist = Bpe.learnMerges(docs, "text", numMerges = 16,
      maxDriverVocab = 0)
    val local = Bpe.learnMerges(docs, "text", numMerges = 16)
    assert(local == dist)
    // and on a tie-heavy synthetic vocab (every pair count equal)
    import spark.implicits._
    val tie = Seq((1L, "ab ba ab ba")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(tie, "text", numMerges = 3) ==
      Bpe.learnMerges(tie, "text", numMerges = 3, maxDriverVocab = 0))
  }

  test("learnMergesDf on the corpus sample is rank-ordered with positive counts") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val rows = Bpe.learnMergesDf(docs, "text", numMerges = 3)
      .orderBy(col("rank")).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // counts are non-increasing: a later merge can never beat an earlier
    // one it coexisted with
    val cnts = rows.map(_.getLong(3))
    assert(cnts.sameElements(cnts.sorted.reverse))
    assert(cnts.last > 0)
  }
}
