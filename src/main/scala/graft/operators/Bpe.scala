package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/** From-scratch distributed BPE merge learning (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-training step of a pretraining data pipeline. Each round
  * counts adjacent symbol pairs over the corpus and merges the most
  * frequent pair into one symbol; after k rounds the merge list IS the
  * (rank-ordered) tokenizer.
  *
  * 100 TB shape — the classic trainer trick, distributed: iterations run
  * on the WORD-FREQUENCY VOCABULARY (distinct word, count), never the
  * corpus. The corpus is scanned exactly once to build that vocab (one
  * explode + partial-agged groupBy); every merge round is then a narrow
  * map + one partial-agged pair-count agg over vocab-sized rows, and the
  * only driver traffic is each round's 1-row argmax. Words are held as
  * SPACE-JOINED SYMBOL STRINGS padded with sentinel spaces (" h e l l o ");
  * applying merge (a,b) folds left-to-right over the symbol array
  * ([[applyMerge]]) — the same greedy scan reference BPE uses. Ties on
  * pair count break to the lexicographically smallest (left, right) via
  * a min-struct agg, so the learned merge list is fully deterministic.
  */
object Bpe {

  /** The corpus's word-frequency vocabulary: (word, wc long) over
    * lowercased whitespace tokens — the ONE corpus-scale scan of the
    * trainer; empty tokens (from repeated separators) are dropped. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(lower(col(textCol))))
        .as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))

  /** " h e l l o " — chars joined by single spaces, sentinel-padded so a
    * merge is one literal mid-string replace. */
  private def symbolize(word: Column): Column =
    concat(lit(" "),
      array_join(filter(split(word, ""), s => s =!= ""), " "), lit(" "))

  /** Apply ONE merge (a,b) to a sentinel-padded symbol string: fold
    * left-to-right over the symbol array, merging the accumulator's last
    * symbol with the incoming one iff they equal (a,b). This IS reference
    * BPE's greedy scan — after a merge the new `ab` symbol is never the
    * `a` of the next step of the same pass (b is non-empty, so ab != a),
    * matching the scan's i += 2 skip. A single literal
    * `replace(" a b ", " ab ")` is NOT equivalent: the match consumes the
    * shared boundary space, so a run of 4+ repeated symbols merges only
    * alternately (" a a a a " -> " aa a a " where greedy BPE gives
    * " aa aa "). `get` (0-based, null out-of-range) keeps the
    * empty-accumulator probe ANSI-safe. */
  private[operators] def applyMerge(s: Column, a: String, b: String): Column =
    concat(lit(" "), array_join(
      aggregate(
        split(trim(s), " "),
        array().cast("array<string>"),
        (acc, x) => when(
          x === lit(b) && get(acc, size(acc) - 1) === lit(a),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x)))),
      " "), lit(" "))

  /** One learned merge. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** The (-cnt, a, b) struct-min tie-break, replayed on the driver: order
    * by count DESC, then (a, b) ASC under Spark's STRING ordering — which
    * is unsigned byte-wise over UTF-8 (UTF8String), NOT Java's UTF-16
    * compareTo; the two differ on supplementary characters, so the local
    * fast path compares UTF-8 bytes to stay bit-identical. */
  private def utf8Less(x: String, y: String): Boolean = {
    val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  /** The round loop of [[learnMerges]] run on a driver-collected
    * vocabulary — SAME pair counting, SAME (cnt DESC, a ASC, b ASC)
    * argmax, SAME greedy left-to-right merge scan (the i += 2 skip:
    * a just-merged symbol is never the `a` of the immediately following
    * pair in the same pass), so the learned list is row-identical to the
    * distributed path (spec-gated property). Exists because k rounds of
    * sub-second distributed actions are pure fixed cost when the vocab
    * fits on the driver — the ConnectedComponents union-find precedent. */
  private def learnMergesLocal(vocab0: Array[(Array[String], Long)],
      numMerges: Int): Seq[Merge] = {
    var cur = vocab0
    var merges = Vector.empty[Merge]
    var done = false
    var r = 1
    while (r <= numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      cur.foreach { case (syms, wc) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + wc)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var bk: (String, String) = null
        var bc = Long.MinValue
        counts.foreach { case (k, c) =>
          if (c > bc || (c == bc && (utf8Less(k._1, bk._1) ||
              (k._1 == bk._1 && utf8Less(k._2, bk._2))))) { bk = k; bc = c }
        }
        val (a, b) = bk
        merges = merges :+ Merge(r, a, b, bc)
        val ab = a + b
        cur = cur.map { case (syms, wc) =>
          if (syms.length < 2) (syms, wc)
          else {
            val out = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += ab; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), wc)
          }
        }
      }
      r += 1
    }
    merges
  }

  /** Learn `numMerges` BPE merges from the corpus. Returns the bounded
    * driver-side merge list (rank order = merge priority); rounds whose
    * best pair count is 0 (vocabulary fully merged) stop early.
    *
    * `checkpointEvery`: every that-many rounds the working vocabulary is
    * localCheckpoint'ed (eager), snapping its lineage — without this a
    * production-scale trainer (30k merges) stacks one fold expression per
    * round into a 30k-deep plan that breaks analysis/codegen long before
    * the data does. Snapshots are vocab-sized cached blocks, at most
    * numMerges/checkpointEvery of them, all dropped by the caller's
    * next [[graft.plans.Persists.releaseAll]].
    *
    * `maxDriverVocab`: vocabularies at or under this row count (known
    * exactly from the materializing count) run the round loop on the
    * driver ([[learnMergesLocal]], result-identical) — k rounds of
    * sub-second distributed actions are fixed cost, not data; at real
    * scale a 10M-type vocabulary exceeds the guard and takes the
    * distributed loop. 0 disables the fast path (specs gate the two
    * paths against each other). */
  def learnMerges(docs: DataFrame, textCol: String,
      numMerges: Int, checkpointEvery: Int = 16,
      maxDriverVocab: Int = 1 << 16): Seq[Merge] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val vocab = wordVocab(docs, textCol)
      .select(symbolize(col("word")).as("s"), col("wc"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    // Materialize the vocab at full session parallelism BEFORE the round
    // loop: the one corpus-scale scan must not run under the loop's
    // reduced-shuffle conf below.
    val vocabRows = vocab.count()
    if (vocabRows <= maxDriverVocab.toLong && maxDriverVocab > 0) {
      val local = vocab.collect().map { row =>
        (row.getString(0).trim.split(" ").filter(_.nonEmpty), row.getLong(1))
      }
      vocab.unpersist(blocking = false)
      return learnMergesLocal(local, numMerges)
    }
    // The trainer is a chain of numMerges tiny sequential actions (one
    // 1-row argmax each); their per-round fixed cost, not data, dominates
    // wall time (measured: k=64 costs the same at sf0.001 and sf0.1). Pin
    // AQE off around them like the ingest pipelines do
    // (Persists.withSessionConf doc) and drop shuffle parallelism: each
    // round's exchange carries only post-partial-agg (a,b,cnt) rows —
    // bounded by the corpus's distinct adjacent-pair count, never vocab-
    // or corpus-sized — so launching the session's full shuffle-partition
    // fan-out per round is pure scheduling overhead, k times over.
    try graft.plans.Persists.withSessionConf(docs.sparkSession)(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "2") {
      var merges = Vector.empty[Merge]
      var cur = vocab.select(col("s"), col("wc"))
      var done = false
      for (r <- 1 to numMerges if !done) {
        val syms = split(trim(col("s")), " ")
        val best = cur
          .select(col("wc"), syms.as("__sy"))
          .filter(size(col("__sy")) >= 2)
          .select(col("wc"), explode(arrays_zip(
            slice(col("__sy"), lit(1), size(col("__sy")) - 1).as("a"),
            slice(col("__sy"), lit(2), size(col("__sy")) - 1).as("b")))
            .as("__p"))
          .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
          .agg(sum(col("wc")).as("cnt"))
          // min over (-cnt, a, b): highest count, then smallest pair
          .agg(min(struct((-col("cnt")).as("nc"), col("a"), col("b")))
            .as("m"))
          .select(col("m.a"), col("m.b"), (-col("m.nc")).as("cnt"))
          .collect()
        if (best.isEmpty || best(0).isNullAt(0)) done = true
        else {
          val (a, b, c) = (best(0).getString(0), best(0).getString(1),
            best(0).getLong(2))
          merges = merges :+ Merge(r, a, b, c)
          cur = cur.select(applyMerge(col("s"), a, b).as("s"), col("wc"))
          if (r % checkpointEvery == 0) cur = cur.localCheckpoint(true)
        }
      }
      merges
    } finally vocab.unpersist(blocking = false)
  }

  /** The merge list as a gated DataFrame: (rank, lhs, rhs, pair_count)
    * — lhs/rhs, not left/right, to spare the oracle SQL the reserved
    * keywords. */
  def learnMergesDf(docs: DataFrame, textCol: String,
      numMerges: Int, checkpointEvery: Int = 16,
      maxDriverVocab: Int = 1 << 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnMerges(docs, textCol, numMerges, checkpointEvery, maxDriverVocab)
      .map(m => (m.rank, m.left, m.right, m.count))
      .toDF("rank", "lhs", "rhs", "pair_count")
      .select(col("rank").cast("long").as("rank"), col("lhs"),
        col("rhs"), col("pair_count"))
  }

  /** Segment every document with an already-learned merge list: applies
    * the merges in rank order to each word and returns per-document
    * subword statistics — (idCol, n_words, n_subwords long,
    * avg_subwords_per_word double rounded 6). The merge list is bounded
    * (driver-side literals compiled into the plan, like a broadcast
    * dict); the pass is one narrow corpus scan, no join, no shuffle
    * beyond the id agg. */
  def segmentStats(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val applied = merges.sortBy(_.rank).foldLeft(
      symbolize(col("word")): Column) { (c, m) =>
      applyMerge(c, m.left, m.right)
    }
    docs
      .select(col(idCol),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .filter(col("word") =!= "")
      .select(col(idCol), size(split(trim(applied), " ")).as("__ns"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__ns")).as("n_subwords"))
      .select(col(idCol), col("n_words"), col("n_subwords"),
        round(col("n_subwords").cast("double") /
          col("n_words").cast("double"), 6).as("avg_subwords_per_word"))
  }
}
