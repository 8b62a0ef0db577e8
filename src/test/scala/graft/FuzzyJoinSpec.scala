package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** Fuzzy (edit-distance) record linkage: the broadcast probe path and the
  * PassJoin-blocked self join, both checked against naive full
  * levenshtein evaluation. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alice"), (2L, "alicf"), (3L, "alce"), (4L, "bob"),
    (5L, "bobby"), (6L, "carol"), (7L, "carrol"), (8L, "karol"),
    (9L, "dave"), (10L, "alice")
  ).toDF("id", "name")

  test("linkProbes: within-k pairs only, self-id excluded, dist is long") {
    val probes = corpus.filter(col("id") === 1L)
    val out = FuzzyJoin.linkProbes(corpus, probes, "id", "name", k = 1)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // alice(1) vs: alicf d1, alce d1, alice(10) d0 (different id: kept);
    // bob/bobby/carol/... all exceed k=1
    assert(out == Map(2L -> 1L, 3L -> 1L, 10L -> 0L))
  }

  test("linkProbes matches naive levenshtein over a cross join") {
    val probes = corpus.filter(col("id") % 3 === 0)
    val naive = corpus.select(col("id").as("pid"), col("name").as("pn"))
      .join(corpus.select(col("id"), col("name")), col("pid") =!= col("id"))
      .filter(col("pid") % 3 === 0 && levenshtein(col("pn"), col("name")) <= 2)
      .select(col("pid"), col("id"), levenshtein(col("pn"), col("name")).as("d"))
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2) -> t._3.toLong).toMap
    val got = FuzzyJoin.linkProbes(corpus, probes, "id", "name", k = 2)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(got == naive)
  }

  test("selfPairsSegments matches naive all-pairs at k=1 and k=2") {
    for (k <- Seq(1, 2)) {
      val naive = corpus.select(col("id").as("ia"), col("name").as("na"))
        .join(corpus.select(col("id").as("ib"), col("name").as("nb")),
          col("ia") < col("ib"))
        .filter(levenshtein(col("na"), col("nb")) <= k)
        .select(col("ia"), col("ib"),
          levenshtein(col("na"), col("nb")).cast("long").as("d"))
        .as[(Long, Long, Long)].collect().toSet
      val got = FuzzyJoin.selfPairsSegments(corpus, "id", "name", k)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == naive, s"k=$k")
    }
  }

  test("selfPairsSegments: unequal-length pairs across the band boundary") {
    // lengths 1..5 around a common stem: deletions/insertions at ends and
    // middle, plus an exact-length substitution
    val df = Seq(
      (1L, "abcde"), (2L, "abde"), (3L, "abcd"), (4L, "bcde"),
      (5L, "abzde"), (6L, "ab"), (7L, "a")
    ).toDF("id", "s")
    val naive = df.select(col("id").as("ia"), col("s").as("sa"))
      .join(df.select(col("id").as("ib"), col("s").as("sb")), col("ia") < col("ib"))
      .filter(levenshtein(col("sa"), col("sb")) <= 1)
      .select(col("ia"), col("ib"),
        levenshtein(col("sa"), col("sb")).cast("long").as("d"))
      .as[(Long, Long, Long)].collect().toSet
    val got = FuzzyJoin.selfPairsSegments(df, "id", "s", k = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == naive)
  }

  test("entity resolution: typo clusters collapse to the min-id golden record") {
    val recs = Seq(
      (10L, "acme corp"),   // cluster {10, 11, 12}: one-edit chain
      (11L, "acme corp."),
      (12L, "acme cor"),
      (20L, "zenith ltd"),  // cluster {20, 21}
      (21L, "zenith ltd."),
      (30L, "unrelated co") // singleton
    ).toDF("rid", "name")
    val out = graft.operators.EntityResolution.resolve(recs, "rid", "name", k = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out == Map(
      10L -> ((3L, "acme corp")),
      20L -> ((2L, "zenith ltd")),
      30L -> ((1L, "unrelated co"))))
  }

  test("entity resolution: no pairs at all -> every record is its own entity") {
    val recs = Seq((1L, "aaaa"), (2L, "bbbb"), (3L, "cccc")).toDF("rid", "name")
    val out = graft.operators.EntityResolution.resolve(recs, "rid", "name", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }
}
