package graft

import graft.operators.Dedup

/** The two exact-jaccard variants must produce identical pair sets. */
class PrefixFilterSpec extends SparkSpec {

  test("prefix-filtered jaccard equals count-based jaccard (sf0.001 documents)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12))).toSet
    for (t <- Seq(0.5, 0.8)) {
      val base = pairs(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, t))
      val pref = pairs(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, t))
      assert(pref == base, s"variants disagree at t=$t")
      assert(base.nonEmpty)
    }
  }
}
