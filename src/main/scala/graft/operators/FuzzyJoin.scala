package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Approximate string matching (record linkage / entity resolution):
  * find pairs whose edit (Levenshtein) distance is within a threshold.
  * Reference behavior: lisad/phaser exposes only exact-key lookup joins
  * (J1); fuzzy linkage is a north-star extension for corpus curation —
  * matching incoming records/URLs/titles against a master snapshot where
  * keys drift by typos and formatting.
  *
  * Two physical paths, chosen by the caller to match the data shape:
  *
  *  - [[linkProbes]] — small probe set vs. a huge corpus (the nightly
  *    batch-vs-snapshot shape, e2's fuzzy twin). The probe side is
  *    BROADCAST and the corpus evaluated in ONE narrow scan: a length
  *    band prefilter (|len(a)-len(b)| <= k, cheap long compare) then
  *    `levenshtein(a, b, k)` — Spark's thresholded form abandons the DP
  *    after cost exceeds k, so the per-pair cost is O(k*len), not
  *    O(len^2). The corpus is never shuffled, nothing is collected.
  *
  *  - [[selfPairsSegments]] — large-vs-large fuzzy SELF join, PassJoin
  *    pigeonhole blocking (Li, Deng, Feng 2011): split every string into
  *    k+1 contiguous segments; two strings within edit distance k must
  *    share at least one segment VERBATIM at a start position shifted by
  *    at most k. Candidates come from an equi-join on (segment index,
  *    segment text, length) — a shuffle on segment content, never a
  *    cartesian — then exact verify. CAVEAT: blocking power depends on
  *    segment entropy; corpora with long shared prefixes (e.g. uniform
  *    "Customer#0...") collapse toward the cross product and should use
  *    [[linkProbes]] per batch or a discriminative-substring key instead.
  */
object FuzzyJoin {

  /** Fuzzy-link `probes` (small, broadcastable by contract) against
    * `corpus`: one row per (probe, corpus) pair with distance <= k,
    * excluding identical-id self pairs. Output:
    * (probe_<idCol>, <idCol>, dist long).
    */
  def linkProbes(corpus: DataFrame, probes: DataFrame,
      idCol: String, strCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("__pid"), col(strCol).as("__ps"))
    val d = levenshtein(col("__ps"), col(strCol), k)
    // the per-pair DP is the cost here, and it runs in the corpus's OWN
    // scan tasks — fan a sub-parallel corpus out first (identity at
    // cluster scale; see Scale.fanOut)
    Scale.fanOut(corpus).join(broadcast(p),
        // length band first: a long compare guards the DP
        abs(length(col("__ps")) - length(col(strCol))) <= k &&
        col("__pid") =!= col(idCol) &&
        d >= 0 && d <= k)
      .select(col("__pid").as(s"probe_$idCol"), col(idCol),
        d.cast(LongType).as("dist"))
  }

  /** PassJoin-blocked fuzzy self join: all unordered pairs (a.id < b.id)
    * with edit distance <= k. See object docs for the blocking lemma and
    * the entropy caveat. Output: (<idCol>_a, <idCol>_b, dist long).
    */
  def selfPairsSegments(df: DataFrame, idCol: String, strCol: String,
      k: Int): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).as("__len"))

    // Index side: the k+1 balanced segments of every string. Segment i of
    // a length-L string starts at floor(i*L/(k+1)) (0-based) and runs to
    // the next segment's start. The lemma: if ED(A,B) <= k then B
    // contains SOME segment of A verbatim, at a start position shifted
    // from the segment's own by at most k.
    val segs = (0 to k).map { i =>
      val st = floor(col("__len") * i / (k + 1)).cast("int")
      val en = floor(col("__len") * (i + 1) / (k + 1)).cast("int")
      struct(lit(i).as("i"), col("__s").substr(st + 1, en - st).as("seg"))
    }
    val indexed = base.select(col("__id").as("__ida"), col("__s").as("__sa"),
        col("__len").as("__lena"), explode(array(segs: _*)).as("g"))
      .select(col("__ida"), col("__sa"), col("__lena"),
        col("g.i").as("__ia"), col("g.seg").as("__sega"))
      .filter(length(col("__sega")) > 0)

    // Probe side: for each partner length within +-k and each segment
    // index, every substring of this string with the PARTNER's segment
    // geometry, start shifted by at most k — (k+1)(2k+1)^2 bounded rows
    // per string, independent of corpus size.
    val wins = (for { i <- 0 to k; dL <- -k to k; sh <- -k to k }
      yield struct(lit(i).as("i"), lit(dL).as("dl"), lit(sh).as("sh")))
    val geom = base.select(col("__id").as("__idb"), col("__s").as("__sb"),
        col("__len").as("__lenb"), explode(array(wins: _*)).as("w"))
      .withColumn("__plen", col("__lenb") + col("w.dl"))
      .withColumn("__pst",
        floor(col("__plen") * col("w.i") / (k + 1)).cast("int"))
      .withColumn("__psl",
        floor(col("__plen") * (col("w.i") + 1) / (k + 1)).cast("int") -
          col("__pst"))
      .withColumn("__pos", col("__pst") + col("w.sh"))
      .filter(col("__psl") > 0 && col("__pos") >= 0 &&
        col("__pos") + col("__psl") <= col("__lenb") && col("__plen") > 0)
      .select(col("__idb"), col("__sb"), col("__lenb"),
        col("w.i").as("__ib"), col("__plen"),
        col("__sb").substr(col("__pos") + 1, col("__psl")).as("__sub"))
      .distinct() // shift windows overlap: same substring from several sh

    val cand = indexed
      .join(geom,
        col("__ia") === col("__ib") && col("__lena") === col("__plen") &&
        col("__sega") === col("__sub") && col("__ida") < col("__idb"))
      .select(col("__ida").as("ida"), col("__idb").as("idb"),
        col("__sa").as("sa"), col("__sb").as("sb"))
      .distinct()

    val d = levenshtein(col("sa"), col("sb"), k)
    cand.filter(d >= 0 && d <= k)
      .select(col("ida").as(s"${idCol}_a"), col("idb").as(s"${idCol}_b"),
        d.cast(LongType).as("dist"))
  }
}
