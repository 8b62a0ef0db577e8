package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact top-k frequent items at scale, without a full-vocabulary shuffle.
  *
  * The naive plan — groupBy(item).count + global top-k — shuffles one row
  * per DISTINCT item: at 100 TB of text that is the n-gram vocabulary
  * (billions of keys), most of which occur a handful of times and can
  * never reach a top-k. This operator:
  *
  *  1. summarizes each PARTITION with a Misra-Gries sketch of `capacity`
  *     counters, then MERGES the sketches distributedly (treeAggregate —
  *     the mergeable-summaries merge of Agarwal et al., PODS 2012: sum
  *     counters, subtract the (capacity+1)-th largest, drop non-positive).
  *     The driver therefore receives ONE sketch of <= capacity counters,
  *     not capacity x numPartitions candidate rows (at 10^5-10^6
  *     partitions the un-merged union is itself a driver OOM). The merged
  *     guarantee: any item with global frequency > N/(capacity+1) keeps a
  *     positive counter, so every possible top-k member under the
  *     certificate below is a candidate.
  *  2. exactly recounts ONLY the candidates (broadcast semi-join filter,
  *     then an ordinary partial-agged groupBy whose key space is
  *     #candidates, not #vocabulary) and takes the top-k.
  *
  * EXACTNESS is certified at runtime, not assumed: if the k-th recounted
  * frequency exceeds N/capacity (> N/(capacity+1), the merged sketch's
  * survival bound), no non-candidate can belong to the top-k, so the
  * result equals the naive plan's bit for bit — the x37 oracle replays
  * the naive rule and the gate proves it. If the certificate fails
  * (capacity too small for the distribution), the operator falls back to
  * the exact groupBy — always correct, just not sketch-accelerated.
  *
  * Ties break (count desc, item asc), matching the SQL replay.
  */
object FrequentItems {

  /** Serializable Misra-Gries summary: `capacity` counters + the total
    * element count (so the certificate needs no extra corpus pass).
    * [[add]] is the classic streaming update; [[merge]] sums counters and,
    * when more than `capacity` survive, subtracts the (capacity+1)-th
    * largest value from all and drops the non-positive — the standard
    * mergeable-summaries merge, preserving the error bound N/(capacity+1)
    * over the combined stream. */
  private final class MgSummary(val capacity: Int) extends Serializable {
    val counters = new java.util.HashMap[String, Long]()
    var total = 0L

    def add(x: String): this.type = {
      total += 1L
      val c = counters.get(x) // null unboxes to 0L for absent keys
      if (c != 0L || counters.containsKey(x)) counters.put(x, c + 1L)
      else if (counters.size < capacity) counters.put(x, 1L)
      else {
        // decrement-all step; drop zeroed counters
        val it = counters.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
      this
    }

    def merge(o: MgSummary): this.type = {
      total += o.total
      val oi = o.counters.entrySet().iterator()
      while (oi.hasNext) {
        val e = oi.next()
        val c = counters.get(e.getKey)
        counters.put(e.getKey, c + e.getValue)
      }
      if (counters.size > capacity) {
        val values = new Array[Long](counters.size)
        var i = 0
        val vi = counters.values().iterator()
        while (vi.hasNext) { values(i) = vi.next(); i += 1 }
        java.util.Arrays.sort(values)
        val d = values(values.length - capacity - 1) // (capacity+1)-th largest
        val ei = counters.entrySet().iterator()
        while (ei.hasNext) {
          val e = ei.next()
          if (e.getValue <= d) ei.remove() else e.setValue(e.getValue - d)
        }
      }
      this
    }
  }

  /** Exact top-k of `itemCol` by occurrence count. Output (rk, item, n),
    * rk long 1..k. `capacity` trades sketch size for certificate
    * strength; the fallback keeps correctness unconditional. */
  def topK(df: DataFrame, itemCol: String, k: Int,
      capacity: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(k > 0 && capacity > k, s"need capacity > k > 0, got k=$k capacity=$capacity")

    val items = df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull).as[String]

    def rank(counts: DataFrame): DataFrame = {
      val w = Window.orderBy(col("n").desc, col("item").asc)
      // global top-k window over #candidates (or #vocabulary in the
      // fallback) rows AFTER full aggregation — k and candidates are
      // small by construction, this is not a data-sized window
      counts.withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= k)
        .select(col("rk"), col("item"), col("n"))
    }

    // one narrow pass: per-partition sketches merged UP THE TREE (depth 2
    // => the driver receives ~sqrt(numPartitions) pre-merged summaries,
    // each <= capacity counters; raise depth for >10^6 partitions) —
    // yields candidates AND the total row count in the same scan
    val summary = items.rdd.treeAggregate(new MgSummary(capacity))(
      (sk, x) => sk.add(x), (a, b) => a.merge(b), depth = 2)
    val total = summary.total
    import scala.jdk.CollectionConverters._
    val cand = summary.counters.keySet().iterator().asScala.toSeq
    val recount = items.toDF("item")
      .join(broadcast(cand.toDF("item")), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("n"))
    val top = rank(recount).collect()
    val certified = top.length >= k &&
      top.last.getAs[Long]("n") > total / capacity
    if (certified) {
      spark.createDataFrame(java.util.Arrays.asList(top: _*),
        recount.withColumn("rk", lit(1L)).select("rk", "item", "n").schema)
    } else {
      // certificate failed: the distribution is too flat for this
      // capacity — recount everything (always exact, no sketch savings)
      rank(items.toDF("item").groupBy("item").agg(count(lit(1)).as("n")))
    }
  }

  // --------------------------------------------------------------------
  // Count-min sketch (Cormode & Muthukrishnan 2005) — the point-query
  // frequency companion to [[topK]] (which answers "what are the heavy
  // items"; count-min answers "how often does THIS item occur" for any
  // item, from O(depth x width) state). Like Profile.hllRegisters, the
  // hash rows go through the repo's md5-long so the SAME cells — and
  // therefore the SAME estimates, integer-exact — reproduce on any
  // engine: a sketch one system built can be queried (or merged, cell-
  // wise +) by another, and the x94 gate PROVES the estimates rather
  // than trusting a private hash. Guarantee: est >= true count always;
  // est <= true + 2N/width with probability 1 - (1/2)^depth.
  // --------------------------------------------------------------------

  private def cmBucket(item: org.apache.spark.sql.Column,
      r: org.apache.spark.sql.Column, width: Int) =
    pmod(graft.functions.TextFunctions.md5Long(
      concat(r.cast("string"), lit("|"), item)), lit(width.toLong))

  /** Build the sketch: (r, bucket, n) cells, r in [0, depth). 100 TB
    * shape: ONE narrow scan explodes each item into its `depth` (row,
    * bucket) coordinates; the hash agg partial-combines per partition, so
    * the shuffle carries at most depth x width x partitions cell rows —
    * never the item stream. Cells from different corpora merge by
    * cell-wise sum (same (r, bucket) key space for equal depth/width). */
  def countMinCells(df: DataFrame, itemCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"), col("item"))
      .select(col("r"), cmBucket(col("item"), col("r"), width).as("bucket"))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Point-query the sketch for each distinct item in `queries`: the
    * estimate is min over rows of the item's cell (absent cell = 0). The
    * cell frame is depth x width rows at most — broadcast — so the query
    * side never shuffles. Output (item, cm_est long), integer-exact. */
  def countMinEstimate(cells: DataFrame, queries: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame = {
    val qb = queries.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull).distinct()
      .select(col("item"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("item"), col("r"),
        cmBucket(col("item"), col("r"), width).as("bucket"))
    qb.join(broadcast(cells), Seq("r", "bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("n"), lit(0L))).as("cm_est"))
  }

  /** Build + query in one call (the x94 gate shape). */
  def countMin(df: DataFrame, itemCol: String, queries: DataFrame,
      queryItemCol: String, depth: Int = 4, width: Int = 512): DataFrame =
    countMinEstimate(countMinCells(df, itemCol, depth, width),
      queries, queryItemCol, depth, width)

  /** Equi-join SIZE estimation from two count-min sketches (Cormode &
    * Muthukrishnan 2005 §4.2: |A ⋈_k B| = Σ_k cA(k)·cB(k) is the inner
    * product of the frequency vectors, estimated by min over sketch rows
    * of Σ_bucket cellA·cellB) — the "will this join explode" pre-flight a
    * planner runs from O(depth × width) state per side WITHOUT touching
    * either table again. Estimate >= exact always (same-bucket
    * collisions only add mass); est <= exact + N_A·N_B/width w.h.p.
    *
    * The gate computes the EXACT size too (two key-count aggregates +
    * one key join — the expensive truth this sketch exists to avoid) and
    * proves the one-sided bound as data: `overestimates` must be true.
    * All arithmetic integer-exact on md5-derived cells, so any engine
    * reproduces the same estimate from the same sketches.
    *
    * 100 TB shape: each side is one [[countMinCells]] scan (shuffle
    * bounded by depth × width × partitions); the inner product joins two
    * ≤ depth×width cell frames. Output: one row (exact_size, cm_estimate,
    * overestimates, rel_error). */
  def cmJoinSizeEstimate(a: DataFrame, keyA: String, b: DataFrame,
      keyB: String, depth: Int = 4, width: Int = 512): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    // Self-join fast path: when both sides are the same frame AND key,
    // the inner product collapses to Σ_bucket n² over ONE cells frame
    // and the exact arm to Σ_k c(k)² over ONE key-count aggregate — two
    // scans and zero joins instead of four scans and two joins, with
    // bit-identical output (the general arm would join each cell/key to
    // its own copy).
    val (est, exact) =
      if ((a eq b) && keyA == keyB) {
        val cells = countMinCells(a, keyA, depth, width)
        val e = cells.groupBy(col("r")).agg(sum(col("n") * col("n")).as("e"))
          .agg(min(col("e")).as("cm_estimate"))
        val x = a.select(col(keyA).cast("string").as("k"))
          .filter(col("k").isNotNull).groupBy(col("k"))
          .agg(count(lit(1)).as("ca"))
          .agg(sum(col("ca") * col("ca")).as("exact_size"))
        (e, x)
      } else {
        val ca = countMinCells(a, keyA, depth, width)
          .select(col("r"), col("bucket"), col("n").as("na"))
        val cb = countMinCells(b, keyB, depth, width)
          .select(col("r"), col("bucket"), col("n").as("nb"))
        val e = ca.join(cb.hint("shuffle_hash"), Seq("r", "bucket"))
          .groupBy(col("r")).agg(sum(col("na") * col("nb")).as("e"))
          .agg(min(col("e")).as("cm_estimate"))
        val fa = a.select(col(keyA).cast("string").as("k"))
          .filter(col("k").isNotNull).groupBy(col("k"))
          .agg(count(lit(1)).as("ca"))
        val fb = b.select(col(keyB).cast("string").as("k"))
          .filter(col("k").isNotNull).groupBy(col("k"))
          .agg(count(lit(1)).as("cb"))
        val x = fa.join(fb.hint("shuffle_hash"), Seq("k"))
          .agg(sum(col("ca") * col("cb")).as("exact_size"))
        (e, x)
      }
    exact.crossJoin(broadcast(est))
      .select(col("exact_size"), col("cm_estimate"),
        (col("cm_estimate") >= col("exact_size")).as("overestimates"),
        round((col("cm_estimate") - col("exact_size")).cast(DoubleType) /
          col("exact_size").cast(DoubleType), 6).as("rel_error"))
  }
}
