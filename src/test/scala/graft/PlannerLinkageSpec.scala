package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, EntityResolution, EventAnalytics,
  GraphRank, Scale}

/** Round-7 additions: layout planners (compaction, range splits, epoch
  * shuffle), sampling design (Neyman), linkage calibration (Fellegi-
  * Sunter), partition quality (modularity), and CUPED. Each test is a
  * hand-computable fixture — the cross-engine gates live in SparkEntry
  * (x193-x199). */
class PlannerLinkageSpec extends SparkSpec {
  import spark.implicits._

  test("epochShuffle: round-robin permutation — balanced, dense, seeded") {
    val docs = (0L until 10L).toDF("id")
    val out = CorpusOps.epochShuffle(docs, "id", seed = 7, nShards = 3)
      .select("id", "shard", "shard_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every doc exactly once, shard sizes differ by at most one
    assert(out.map(_._1).sorted.toSeq == (0L until 10L))
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet.subsetOf(Set(0L, 1L, 2L)))
    assert(sizes.values.max - sizes.values.min <= 1)
    // positions within each shard are dense from 0
    sizes.foreach { case (s, n) =>
      assert(out.filter(_._2 == s).map(_._3).sorted.toSeq == (0L until n.toLong))
    }
    // same seed replays the identical permutation; another seed does not
    val again = CorpusOps.epochShuffle(docs, "id", seed = 7, nShards = 3)
      .select("id", "shard", "shard_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
    val other = CorpusOps.epochShuffle(docs, "id", seed = 8, nShards = 3)
      .select("id", "shard", "shard_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(other.sortBy(_._1).toSeq != out.sortBy(_._1).toSeq)
  }

  test("compactionPlan: next-fit packing never splits a file, overflows by at most one") {
    val files = Seq(("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 100L),
      ("a", 4L, 100L), ("b", 5L, 600L), ("b", 6L, 10L))
      .toDF("dir", "fid", "sz")
    val plan = CorpusOps.compactionPlan(files, "dir", "fid", "sz", 250L)
      .orderBy("dir", "bin")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // a: files 1-3 start below the 250 target (offsets 0/100/200) -> bin 0;
    // file 4 starts at 300 -> bin 1. b: the 600-byte file owns bin 0
    // alone (bins 0-2 by first-byte; one bin, never split), file 6 starts
    // at 600 -> bin 2.
    assert(plan.toSeq == Seq(("a", 0L, 3L, 300L), ("a", 1L, 1L, 100L),
      ("b", 0L, 1L, 600L), ("b", 2L, 1L, 10L)))
  }

  test("neymanAllocation: budget flows to the high-variance stratum") {
    val rows = Seq.fill(4)(("flat", 5L)) ++ Seq(("vary", 0L), ("vary", 10L),
      ("vary", 0L), ("vary", 10L))
    val out = CorpusOps.neymanAllocation(rows.toDF("stratum", "v"),
        "stratum", "v", totalN = 4L)
      .orderBy("stratum")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getLong(3), r.getDouble(4)))
    // flat: sigma 0 -> 0 rows; vary: sigma 5 -> entire budget (capped at N_h)
    assert(out.toSeq == Seq(("flat", 4L, 0.0, 0L, 0.0),
      ("vary", 4L, 5.0, 4L, 1.0)))
  }

  test("neymanAllocation: largest-remainder keeps the allocation sum at the budget") {
    // shares 1.4 / 1.4 / 1.2 of a 4-row budget: independent half-up
    // rounding yields 1+1+1 = 3 (the round-7 drift); largest-remainder
    // floors then hands the leftover row to the largest remainder
    // (tie broken by stratum) -> 2+1+1 = 4
    val rows = Seq(("a", 0L), ("a", 7L), ("b", 0L), ("b", 7L),
      ("c", 0L), ("c", 6L))
    val out = CorpusOps.neymanAllocation(rows.toDF("stratum", "v"),
        "stratum", "v", totalN = 4L)
      .orderBy("stratum").collect().map(r => (r.getString(0), r.getLong(3)))
    assert(out.toSeq == Seq(("a", 2L), ("b", 1L), ("c", 1L)))
  }

  test("bloomAdvisor: clustered key opens ~1 true file per probe plus the exact fp mass") {
    // 8 rows, key 1..8, probe value = key: 4 bins of 2 keys, each file
    // holds 2 distinct probe values; every probe truly lives in exactly
    // one file, and the other 3 files open at the Bloom fpp for nd=2,
    // m=8 bits, k=3 hashes
    val df = (1L to 8L).map(k => (k, k)).toDF("k", "v")
    val out = Scale.bloomAdvisor(df, Seq("k"), "v", nBins = 4,
      nProbes = 3, bitsPerFile = 8, nHashes = 3).collect()(0)
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val fpp = BigDecimal(r6(math.pow(1.0 - math.exp(-3.0 * 2.0 / 8.0), 3.0)))
    assert(out.getLong(1) == 4L)
    assert(out.getDouble(2) == 1.0)                        // avg_true_bins
    assert(out.getDouble(3) == r6((fpp * 3).toDouble))     // 3 fp files/probe
    assert(out.getDouble(4) == r6((1.0 + (fpp * 3).toDouble) / 4.0))
  }

  test("broadcastAdvisor: exact byte estimates cross the pinned thresholds into the three strategies") {
    // strings of known octet length; thresholds chosen so the three
    // tables land in the three strategy tiers
    val small = Seq(("ab", 1L), ("cd", 2L)).toDF("s", "k") // 2*(2+8)=20
    val mid = (1L to 5L).map(i => ("abcdefgh", i)).toDF("s", "k") // 5*16=80
    val big = (1L to 40L).map(i => ("abcdefgh", i)).toDF("s", "k") // 640
    val out = Scale.broadcastAdvisor(
        Seq("t1_small" -> small, "t2_mid" -> mid, "t3_big" -> big),
        broadcastBytes = 32L, hashBytes = 300L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out.toSeq == Seq(
      ("t1_small", 2L, 20L, "broadcast"),
      ("t2_mid", 5L, 80L, "shuffle_hash"),
      ("t3_big", 40L, 640L, "sort_merge")))
  }

  test("kAnonPlanner: the ladder audits every granularity and marks the coarsest-necessary one") {
    // A: 1,2,3,11,12; B: 5,6,7,8,9 with k=3:
    // g=1 all singleton cells; g=10 leaves A's {11,12} cell at 2;
    // g=100 pools each source into one 5-cell -> first satisfying
    val rows = (Seq(1L, 2L, 3L, 11L, 12L).map(("A", _)) ++
      Seq(5L, 6L, 7L, 8L, 9L).map(("B", _))).toDF("c", "v")
    val out = graft.operators.Profile.kAnonPlanner(rows, "c", "v",
        k = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, 10L, 1L, 10L, false, false),
      (10L, 3L, 2L, 1L, false, false),
      (100L, 2L, 5L, 0L, true, true),
      (1000L, 2L, 5L, 0L, true, false)))
  }

  test("rangeSplits: keys never split; ties concentrate and are reported as skew") {
    val uniform = (1 to 10).map(k => ("r", k.toLong)).toDF("x", "k")
    val even = Scale.rangeSplits(uniform, "k", nParts = 2)
      .orderBy("part").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(even.toSeq == Seq((0L, 1L, 5L, 5L, 1.0), (1L, 6L, 10L, 5L, 1.0)))
    // 9 copies of key 1: the tie block lands in one partition (skew 1.8)
    val skewed = (Seq.fill(9)(1L) :+ 2L).map(("r", _)).toDF("x", "k")
    val parts = Scale.rangeSplits(skewed, "k", nParts = 2)
      .orderBy("part").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    assert(parts.toSeq == Seq((0L, 9L, 1.8), (1L, 1L, 0.2)))
  }

  test("partitionModularity: hand-computed two-community graph") {
    val pairs = Seq((1L, 2L), (3L, 4L), (1L, 3L)).toDF("a", "b")
    val mem = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B")).toDF("id", "c")
    val out = GraphRank.partitionModularity(pairs, "a", "b", mem, "id", "c")
      .orderBy("community").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // m=3; A: within 1 (1-2), deg 2+1=3 -> 1/3 - (3/6)^2 = 0.083333
    assert(out.toSeq == Seq(("A", 2L, 1L, 3L, 0.083333),
      ("B", 2L, 1L, 3L, 0.083333)))
    // all-edges-within single community: Q = 1 - 1 = 0 (null partition)
    val one = GraphRank.partitionModularity(pairs, "a", "b",
      mem.withColumn("c", lit("all")), "id", "c").collect()
    assert(one.length == 1 && one(0).getDouble(4) == 0.0)
  }

  test("fellegiSunterWeights: smoothed m/u and log2 weights from labeled pairs") {
    val recs = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "z")).toDF("id", "f")
    val matches = Seq((1L, 2L)).toDF("pa", "pb")       // f agrees
    val nons = Seq((1L, 3L), (1L, 4L), (3L, 4L)).toDF("pa", "pb") // 0 agree
    val out = EntityResolution.fellegiSunterWeights(recs, "id",
      matches, nons, Seq("field_f" -> "f")).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 1L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.75)   // (2*1+1)/(2*2)
    assert(r.getDouble(4) == 0.125)  // (2*0+1)/(2*4)
    assert(r.getDouble(5) == 2.584963)  // log2(6)
    assert(r.getDouble(6) == -1.807355) // log2(0.25/0.875)
  }

  test("clusteringCoefficients: triangle closes to coeff 1, chain node gets 0, leaves drop") {
    // triangle 1-2-3 plus a pendant 3-4: node 3 has deg 3, 1 triangle
    // -> 2*1/(3*2) = 0.333333; node 4 deg 1 -> excluded
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val out = GraphRank.clusteringCoefficients(pairs, "a", "b")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, 0.333333)))
  }

  test("sortKeyAdvisor: the clustering key wins, the scrambling key scans everything") {
    val rows = (0L until 100L).map(i => (i, (i * 37L) % 100L, i))
      .toDF("v", "scr", "probe")
    val out = Scale.sortKeyAdvisor(rows, Seq("v", "scr"), "probe",
        nBins = 10, nProbes = 9)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    // ordering by v clusters probe perfectly: 1 bin per lookup
    assert(out("v")._1 == 10L && out("v")._2 == 0.1)
    // the scrambling key spreads probe across (almost) every bin
    assert(out("scr")._2 > 0.5)
  }

  test("neighborhoodJaccard: clique edge scores high, bridge edge scores low") {
    // triangle 1-2-3 bridged to triangle 4-5-6 via edge 3-4
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("a", "b")
    val out = GraphRank.neighborhoodJaccard(pairs, "a", "b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // edge 1-2: N(1)={2,3}, N(2)={1,3} -> common {3}=1, union 2+2-1=3
    assert(out((1L, 2L)) == ((1L, 3L, 0.333333)))
    // bridge 3-4: N(3)={1,2,4}, N(4)={3,5,6} -> common 0, union 6
    assert(out((3L, 4L)) == ((0L, 6L, 0.0)))
  }

  test("centroidDrift: identical slices cosine 1, opposing slice drifts") {
    val embs = Seq(
      (0L, 1, Seq(1.0f, 0.0f)), (1L, 1, Seq(1.0f, 0.0f)),   // label 1: same
      (2L, 2, Seq(0.0f, 1.0f)), (3L, 2, Seq(1.0f, 0.0f)))   // label 2: rotated
      .toDF("vec_id", "label", "embedding")
    val out = graft.operators.Similarity.centroidDrift(
        embs, "label", "embedding", "vec_id % 2 = 1")
      .orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(out.toSeq == Seq((1, 1L, 1L, 1.0, false),
      (2, 1L, 1L, 0.0, true)))
    // a label present on only one side is dropped, not divided by zero
    val oneSided = Seq((2L, 7, Seq(1.0f, 1.0f))).toDF("vec_id", "label", "embedding")
    assert(graft.operators.Similarity.centroidDrift(
      embs.unionAll(oneSided), "label", "embedding", "vec_id % 2 = 1")
      .filter(col("label") === 7).isEmpty)
  }

  test("readability: hand-computed Flesch on a two-sentence doc") {
    // "the cat sat. it ran!" -> 5 words, 2 sentences,
    // syllables: e,a,a,i,a -> 5 vowel groups
    val docs = Seq((1L, "the cat sat. it ran!")).toDF("doc_id", "text")
    val r = graft.operators.QualityFilters.readability(docs, "doc_id", "text")
      .collect()(0)
    assert(r.getLong(1) == 5L && r.getLong(2) == 5L && r.getLong(3) == 2L)
    val expected = 206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (5.0 / 5.0)
    assert(r.getDouble(4) == BigDecimal(expected).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("lDiversity: a k-anonymous cell with one sensitive value is still flagged") {
    val rows = Seq(("a", 100L), ("a", 105L), ("a", 110L), // one bucket (1)
      ("b", 100L), ("b", 250L), ("b", 300L))              // buckets 1,2,3
      .toDF("qi", "v")
    val out = graft.operators.Profile.lDiversity(rows, Seq("qi"),
        "v div 100", l = 3L)
      .orderBy("qi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // cell a: n=3 (k-anonymous at k=3) but l_distinct=1 -> at risk
    assert(out.toSeq == Seq(("a", 3L, 1L, true), ("b", 3L, 3L, false)))
  }

  test("tCloseness: a class matching the global distribution scores 0; a skewed class scores its exact TVD; missing values counted") {
    // global: x appears 4 times, y 4 times (N=8). class p = (2x, 2y) ->
    // tvd 0. class q = (2x, 2y missing) -> dist (1, 0) vs global
    // (0.5, 0.5) -> tvd = 0.5
    val rows = Seq(("p", "x"), ("p", "x"), ("p", "y"), ("p", "y"),
      ("q", "x"), ("q", "x"), ("r", "y"), ("r", "y"))
      .toDF("qi", "sv")
    val out = graft.operators.Profile.tCloseness(rows, Seq("qi"), "sv",
        t = 0.3)
      .orderBy("qi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    assert(out.toSeq == Seq(("p", 4L, 0.0, false),
      ("q", 2L, 0.5, true), ("r", 2L, 0.5, true)))
  }

  test("tCloseness: NULL QI classes are audited and NULL sensitive values keep their mass (round-10 null-safety)") {
    // global: x:2, y:2, NULL:2 (N=6). class p = (x,y) and class NULL =
    // (x,y): tvd = 1/2*(1/6+1/6+1/3) = 1/3. class q = (NULL,NULL):
    // tvd = 1/2*(1/3+1/3+2/3) = 2/3. The pre-round-10 equi-joins
    // dropped the NULL class entirely and leaked NULL-sv mass.
    val rows = Seq((Some("p"), Some("x")), (Some("p"), Some("y")),
      (None, Some("x")), (None, Some("y")),
      (Some("q"), None), (Some("q"), None))
      .toDF("qi", "sv")
    val out = graft.operators.Profile.tCloseness(rows, Seq("qi"), "sv",
        t = 0.5)
      .orderBy("qi").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    assert(out.toSeq == Seq((None, 2L, 0.333333, false),
      (Some("p"), 2L, 0.333333, false), (Some("q"), 2L, 0.666667, true)))
  }

  test("blockingQuality: count-only reduction ratio and pairs completeness match the hand-enumerated pairs") {
    // 6 rows. truth groups by t: {A: r1,r2,r3}, {B: r4,r5}, {C: r6} ->
    // true pairs = 3 + 1 = 4. blocks by b: {u: r1,r2,r4}, {v: r3,r5,r6}
    // -> cand pairs = 3 + 3 = 6 of the 15 total -> rr = 0.6.
    // captured (t,b) cells: (A,u) n=2 -> 1 pair; rest singletons ->
    // pc = 1/4 = 0.25
    val rows = Seq(("u", "A"), ("u", "A"), ("v", "A"),
      ("u", "B"), ("v", "B"), ("v", "C")).toDF("b", "t")
    val r = graft.operators.EntityResolution.blockingQuality(
      rows, "b", "t").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((6L, 6L, 4L, 1L)))
    assert(r.getDouble(4) == 0.6 && r.getDouble(5) == 0.25)
  }

  test("powerMdeProportion: exact per-arm counts and the closed-form rate MDE") {
    val users = (1L to 40L)
    val bits = users.map(Tuple1(_)).toDF("u")
      .withColumn("h", graft.functions.TextFunctions.md5Long(col("u")))
      .collect().map(r => r.getLong(0) -> r.getLong(1) % 2).toMap
    val evs = users.flatMap { u =>
      Seq((u, "view")) ++
        (if (u % 5 == 0L) Seq((u, "purchase")) else Nil)
    }.toDF("user_id", "event_type")
    val r = graft.operators.Experiment.powerMdeProportion(evs, "user_id",
      "event_type", "purchase").collect()(0)
    val n0 = users.count(bits(_) == 0L).toLong
    val n1 = users.count(bits(_) == 1L).toLong
    val k0 = users.count(u => bits(u) == 0L && u % 5 == 0L).toLong
    val k1 = users.count(u => bits(u) == 1L && u % 5 == 0L).toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((n0, n1, k0, k1)))
    val pbar = (k0 + k1).toDouble / (n0 + n1)
    val mde = (1.959964 + 0.841621) *
      math.sqrt(pbar * (1 - pbar) * (1.0 / n0 + 1.0 / n1))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(5) == r6(mde))
    assert(r.getDouble(6) == r6(mde / (k0.toDouble / n0)))
  }

  test("powerMdeProportion: a missing arm yields one row of NULLs, not an empty frame (round-10 pivot)") {
    val users = (1L to 40L)
    val bits = users.map(Tuple1(_)).toDF("u")
      .withColumn("h", graft.functions.TextFunctions.md5Long(col("u")))
      .collect().map(r => r.getLong(0) -> r.getLong(1) % 2).toMap
    val arm0only = users.filter(bits(_) == 0L)
    val evs = arm0only.map(u => (u, "view")).toDF("user_id", "event_type")
    val rows = graft.operators.Experiment.powerMdeProportion(evs,
      "user_id", "event_type", "purchase").collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getLong(0) == arm0only.length.toLong)
    assert(r.isNullAt(1) && r.isNullAt(3) && r.isNullAt(4) &&
      r.isNullAt(5) && r.isNullAt(6))
  }

  test("psiDrift: identical slices score 0; a shifted slice drifts; bins follow the reference CDF") {
    // reference: values 1..80 uniform -> 8 even bins of 10
    val ref = (1L to 80L).map(v => Tuple1(v)).toDF("v")
    val same = graft.operators.Profile.psiDrift(ref, ref, "v", bins = 8)
      .orderBy("bin").collect()
    assert(same.length == 8)
    // p == q per bin exactly (same counts, same totals) -> every term 0
    assert(same.forall(r => r.getDouble(3) == 0.0))
    assert(same.forall(r => r.getDouble(4) == 0.0 && !r.getBoolean(5)))
    // ref-CDF binning: each bin holds exactly 10 of the 80 ref values
    assert(same.forall(r => r.getLong(1) == 10L))
    // current slice concentrated in the top decile -> large psi, flagged
    val cur = (71L to 80L).map(v => Tuple1(v)).toDF("v")
    val drift = graft.operators.Profile.psiDrift(ref, cur, "v", bins = 8)
      .orderBy("bin").collect()
    assert(drift.forall(r => r.getDouble(4) > 0.2 && r.getBoolean(5)))
    // all current mass lands in the last reference bin
    assert(drift.last.getLong(2) == 10L &&
      drift.init.forall(_.getLong(2) == 0L))
    // psi equals the decimal-summed rounded terms
    val termSum = drift.map(r => BigDecimal(r.getDouble(3))).sum.toDouble
    assert(drift.head.getDouble(4) == termSum)
  }

  test("tokenBurstiness: a piled-up token scores the closed-form VMR, an evenly-spread one scores 0") {
    // 6 docs; 'spam' appears 10x in each of 2 docs, 'the' once per doc
    val docs = (1L to 6L).map { i =>
      val spam = if (i <= 2) Seq.fill(10)("spam") else Seq.empty
      (i, (Seq("the") ++ spam).mkString(" "))
    }.toDF("doc_id", "text")
    val out = graft.operators.QualityFilters.tokenBurstiness(
        docs, "doc_id", "text", minDf = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // spam: total 20, s2 200 -> vmr = (6*200 - 400) / (5*20) = 8
    assert(out.head == (("spam", 2L, 20L, 8.0)))
    // 'the': one per doc -> zero variance -> vmr exactly 0
    assert(out.find(_._1 == "the").get._4 == 0.0)
    // bursty token ranks first
    assert(out.map(_._4).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("jsDivergence: identical slices score 0; disjoint vocabularies hit the ln2 bound") {
    val a = Seq((1L, "a a b"), (2L, "b c")).toDF("id", "text")
    val same = graft.operators.Profile.jsDivergence(a, a, "text")
      .collect()(0)
    // p == q per token -> both ln terms are ln(1) = 0 exactly
    assert(same.getDouble(3) == 0.0 && same.getDouble(4) == 0.0)
    assert(!same.getBoolean(5))
    // disjoint vocabularies: every token one-sided -> JS = ln 2 (up to
    // the per-token 1e-6 term rounding)
    val b = Seq((3L, "x y"), (4L, "z z")).toDF("id", "text")
    val dis = graft.operators.Profile.jsDivergence(a, b, "text")
      .collect()(0)
    assert(dis.getLong(0) == 5L && dis.getLong(1) == 4L &&
      dis.getLong(2) == 6L)
    assert(math.abs(dis.getDouble(4) - 1.0) <= 3e-6)
    assert(dis.getBoolean(5))
  }

  test("cupedAdjust: a fully-explaining covariate zeroes adjusted variance") {
    // y = 2x per user -> theta = 2, y_adj = 2*mean(x) for every user
    val cutoff = "2024-01-16 00:00:00"
    val evs = Seq(
      (1L, "2024-01-10 00:00:00", 1.0), (1L, "2024-01-20 00:00:00", 2.0),
      (2L, "2024-01-10 00:00:00", 2.0), (2L, "2024-01-20 00:00:00", 4.0),
      (3L, "2024-01-10 00:00:00", 3.0), (3L, "2024-01-20 00:00:00", 6.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = EventAnalytics.cupedAdjust(evs, "user_id", "ts", "value",
      cutoff, arms = 2).collect()
    assert(out.map(_.getLong(1)).sum == 3L) // every user in exactly one arm
    out.foreach { r =>
      assert(r.getDouble(3) == 4.0) // mean_y_adj = 2 * mean(x) = 4
      assert(r.getDouble(5) == 0.0) // var_y_adj = 0
      // arms with y-variance show full reduction
      if (r.getDouble(4) > 0) assert(r.getDouble(6) == 1.0)
    }
  }

  test("regressionAdjust2: y exactly linear in both covariates zeroes adjusted variance; coefficients recovered") {
    // user u: (u % 3 + 1) pre events of value u -> x1 = (u%3+1)*u,
    // x2 = u%3+1 (non-collinear); one post event y = 2*x1 + 3*x2
    val cutoff = "2024-01-16 00:00:00"
    val evs = (1L to 8L).flatMap { u =>
      val k = (u % 3).toInt + 1
      Seq.fill(k)((u, "2024-01-10 00:00:00", u.toDouble)) :+
        ((u, "2024-01-20 00:00:00", 2.0 * k * u + 3.0 * k))
    }.toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = EventAnalytics.regressionAdjust2(evs, "user_id", "ts",
      "value", cutoff).collect()
    assert(out.map(_.getLong(1)).sum == 8L)
    out.foreach { r =>
      assert(r.getDouble(5) == 0.0) // var_y_adj = 0: fully explained
      if (r.getDouble(4) > 0) assert(r.getDouble(6) == 1.0)
      assert(r.getDouble(7) == 2.0 && r.getDouble(8) == 3.0) // b1, b2
    }
  }

  test("histogramAdvisor: exact cent-grid quartiles drive the FD width; point mass pins bins to 1") {
    // values 1..8 dollars: q1 = 200c, q3 = 600c, iqr = 4.0,
    // width = 2*400/cbrt(8) = 400c = 4.0, bins = ceil(700/400) = 2
    val df = (1 to 8).map(v => Tuple1(v.toDouble)).toDF("v")
    val out = graft.operators.Profile.histogramAdvisor(df, "v", 100L)
      .collect()(0)
    assert(out.getLong(0) == 8L)
    assert(out.getDouble(1) == 1.0 && out.getDouble(2) == 8.0)
    assert(out.getDouble(3) == 4.0 && out.getDouble(4) == 4.0)
    assert(out.getLong(5) == 2L)
    // a point mass has zero IQR: width NULL, one bin
    val flat = Seq.fill(5)(Tuple1(3.0)).toDF("v")
    val o2 = graft.operators.Profile.histogramAdvisor(flat, "v", 100L)
      .collect()(0)
    assert(o2.isNullAt(4) && o2.getLong(5) == 1L)
  }

  test("wasserstein1d: hand case matches the exact CDF-gap fold; identical slice scores 0") {
    import spark.implicits._
    // A = (1,1,3) vs global (1,1,3,3): |2/3 - 1/2| * gap 2 = 1/3;
    // B = (3): |0 - 1/2| * 2 = 1
    val df = Seq(("A", 1L), ("A", 1L), ("A", 3L), ("B", 3L))
      .toDF("source", "v")
    val out = graft.operators.Profile.wasserstein1d(df, "source", "v")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("A", 3L, 0.333333), ("B", 1L, 1.0)))
    // a single group IS the global distribution -> W1 = 0
    val one = graft.operators.Profile.wasserstein1d(
      Seq(("A", 1L), ("A", 5L), ("A", 9L)).toDF("source", "v"),
      "source", "v").collect()
    assert(one.length == 1 && one(0).getDouble(2) == 0.0)
  }

  test("benford: digit ladder buckets exactly; expectation sums to 1; uniform data flags high chi2") {
    import spark.implicits._
    // one value per digit at mixed magnitudes: 0.01 -> 1, 2.34 -> 2,
    // 30 -> 3, ... ladder must pick the LEADING digit at any scale
    val vals = Seq(0.01, 2.34, 30.0, 400.05, 5.0, 60.0, 7000.0, 0.08,
      99999.99)
    val out = graft.operators.Profile.benford(
        vals.map(Tuple1(_)).toDF("v"), "v", scale = 100L)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 9L))
    assert(out.forall(_.getLong(1) == 1L), "one value per digit")
    assert(out.forall(r => r.getDouble(2) == 0.111111))
    // Benford expectation is a probability distribution
    val expSum = out.map(_.getDouble(3)).sum
    assert(math.abs(expSum - 1.0) < 1e-5)
    // digit-1 mass ~30.1%, digit-9 ~4.6%
    assert(out(0).getDouble(3) == 0.30103 && out(8).getDouble(3) == 0.045757)
    // non-positives are dropped, never bucketed
    val o2 = graft.operators.Profile.benford(
      Seq(-5.0, 0.0, 1.0).map(Tuple1(_)).toDF("v"), "v").collect()
    assert(o2.map(_.getLong(1)).sum == 1L)
  }

  test("blockingKeyAdvisor: hand-computed RR/PC/F per candidate, null block keys kept, truth-equal key scores PC=1") {
    // 6 rows, truth groups t1{1,2,3} t2{4,5} t3{6}: true_pairs = 3+1 = 4,
    // total pairs C(6,2) = 15
    val rows = Seq(
      (1L, "X", "z1", "n1", "t1"), (2L, "X", "z1", "n1", "t1"),
      (3L, "Y", "z1", "n1", "t1"), (4L, "X", "z2", "n1", "t2"),
      (5L, "Y", "z2", null.asInstanceOf[String], "t2"),
      (6L, "Y", "z3", null.asInstanceOf[String], "t3"))
      .toDF("id", "city", "zip", "nullable", "truth")
    val out = EntityResolution.blockingKeyAdvisor(rows,
        Seq("all_same" -> "'k'", "city" -> "city",
          "nullable" -> "nullable", "zip" -> "zip"),
        truthExpr = "truth")
      .orderBy("candidate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), Option(r.get(5)), Option(r.get(6)), Option(r.get(7))))
    assert(out.length == 4)
    // all_same: 1 block of 6 -> 15 cand pairs, RR=0, PC=1, F=0
    assert(out(0) == ("all_same", 1L, 15L, 4L, 4L,
      Some(0.0), Some(1.0), Some(0.0)))
    // city: X{1,2,4} Y{3,5,6} -> 6 pairs, captured only (X,t1)={1,2}:
    // RR = 1-6/15 = .6, PC = 1/4, F = .3/.85
    assert(out(1) == ("city", 2L, 6L, 4L, 1L,
      Some(0.6), Some(0.25), Some(0.352941)))
    // nullable: n1{1,2,3,4} NULL{5,6} -> the NULL group is a real block
    // (2 blocks, 6+1=7 pairs); captured (n1,t1)={1,2,3}=3:
    // RR = 8/15, PC = 3/4, F = 0.8/1.283333
    assert(out(2) == ("nullable", 2L, 7L, 4L, 3L,
      Some(0.533333), Some(0.75), Some(0.623377)))
    // zip == truth grouping: z1{1,2,3} z2{4,5} z3{6} -> 4 pairs all
    // captured: RR = 11/15, PC = 1, F = 22/26
    assert(out(3) == ("zip", 3L, 4L, 4L, 4L,
      Some(0.733333), Some(1.0), Some(0.846154)))
  }
}
