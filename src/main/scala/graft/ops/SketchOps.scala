package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Frequency-sketch operators: corpus-wide heavy hitters (frequent tokens)
  * in two formulations with identical results.
  *
  * The exact formulation shuffles the full token-frequency table — key
  * cardinality is the vocabulary, which at 100 TB of web text is billions
  * of distinct tokens, most of them singletons that exist only to be
  * discarded by the threshold. The Misra–Gries formulation never
  * materializes that long tail: each input partition keeps at most `k`
  * counters (a per-partition Misra–Gries summary), the union of surviving
  * candidates is provably a superset of every token with global frequency
  * > N/k (pigeonhole over partitions: a token below the local bar in EVERY
  * partition is below N/k globally), and a second pass recounts ONLY the
  * candidates exactly. For a threshold ≥ N/k + 1 the two-pass result is
  * therefore exact — a sketch that degrades to an exact algorithm, which
  * is what makes it oracle-checkable (the reference's profiling surface is
  * exact-only; this is the scale path for the same report).
  *
  * Threshold convention: a token is a heavy hitter if its count is
  * > 0.05% of all tokens (`n >= n_total div 2000 + 1`), computed inside
  * the plan from a 1-row broadcast total so both engines derive the same
  * integer bar from the same data.
  */
object SketchOps {

  private val ThresholdDiv = 2000L // heavy = count > n_total / 2000

  private def tokens(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("token"))

  /** Exact heavy hitters: full explode → groupBy(token) → threshold. The
    * frequency agg is map-side combinable, but the shuffle still carries
    * one key per distinct token — the formulation to beat at scale. */
  def heavyHittersExact(docs: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(docs, textCol)
    val freq = toks.groupBy("token").agg(count(lit(1)).as("n"))
    // total from the aggregated counts, not a second corpus pass — the
    // identical shuffle subtree dedupes via ReusedExchange, so the corpus
    // is scanned and exploded exactly once
    val tot = freq.agg(sum(col("n")).as("n_total"))
    freq
      .crossJoin(broadcast(tot))
      .withColumn("thresh", expr(s"n_total div $ThresholdDiv") + lit(1L))
      .filter(col("n") >= col("thresh"))
      .select(col("token"), col("n"), col("thresh"))
  }

  /** Per-partition Misra–Gries candidate generation: at most `k` counters
    * per partition, emitted as candidate tokens. Decrement-all is O(k) per
    * trigger but each trigger retires k+1 token credits, so the total cost
    * is amortized O(1) per input token. */
  private[graft] def mgCandidates(toks: Dataset[String], k: Int): Dataset[String] = {
    import toks.sparkSession.implicits._
    toks.mapPartitions { it =>
      val counters = new scala.collection.mutable.HashMap[String, Long]()
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1)
          case None if counters.size < k => counters.update(t, 1L)
          case None =>
            // decrement-all; drop counters that reach zero
            val dead = new scala.collection.mutable.ArrayBuffer[String]()
            counters.foreach { case (tok, c) =>
              if (c == 1L) dead += tok else counters.update(tok, c - 1)
            }
            dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }
  }

  /** Two-pass exact heavy hitters via Misra–Gries candidates + exact
    * recount. `k` must satisfy N/k < threshold for exactness; with the
    * 1/2000 threshold, k = 4096 leaves a 2× guarantee margin. The recount
    * pass is a broadcast semi-join (candidate set ≤ partitions·k rows) so
    * the only full-cardinality token shuffle of the exact formulation
    * disappears — the shuffled key space shrinks from |vocabulary| to
    * |candidates|. */
  def heavyHittersMG(docs: DataFrame, textCol: String, k: Int = 4096): DataFrame = {
    import docs.sparkSession.implicits._
    val toks = tokens(docs, textCol)
    val cand = mgCandidates(toks.select("token").as[String], k)
      .toDF("token").distinct()
    // token total without exploding: size(split(...)) per doc — one scan,
    // no Generate, numerically identical to counting exploded rows
    val tot = docs.agg(
      sum(size(split(trim(lower(col(textCol))), "\\s+")).cast("long"))
        .as("n_total"))
    toks.join(broadcast(cand), Seq("token"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .withColumn("thresh", expr(s"n_total div $ThresholdDiv") + lit(1L))
      .filter(col("n") >= col("thresh"))
      .select(col("token"), col("n"), col("thresh"))
  }

  def qHeavyHitters(s: SparkSession, sf: String): DataFrame =
    heavyHittersExact(tWide(s, sf, "documents"), "text")
      .orderBy(col("n").desc, col("token").asc)

  def qHeavyHittersMg(s: SparkSession, sf: String): DataFrame =
    heavyHittersMG(tWide(s, sf, "documents"), "text")
      .orderBy(col("n").desc, col("token").asc)

  /** X52b: per-window distinct-user sketches as a CHECKED CONTRACT — the
    * batch face of `EventStream.windowedDistinctUsers` (whose streaming
    * run produces the identical estimates, StreamingSpec) joined with the
    * exact per-window distinct count and a 3·rsd bound verdict per window.
    * The oracle computes the exact counts and asserts every verdict TRUE;
    * the stream can then serve the estimate knowing its error bar is
    * data-certified, in the one regime (unbounded streams) where the exact
    * count cannot be computed at all. */
  def qWindowDistinctSketch(s: SparkSession, sf: String): DataFrame = {
    val ev = t(s, sf, "events")
    val approx = graft.streaming.EventStream.windowedDistinctUsers(ev)
    val exact = ev
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("exact_users"))
    approx.join(exact, Seq("hour_start", "event_type"))
      .select(col("hour_start"), col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double") <=
          lit(3 * 1.04 / math.sqrt(1 << 12)) * col("exact_users"))
          .as("within_3rsd"))
      .orderBy("hour_start", "event_type")
  }

  /** X60: mergeable approximate percentiles (Spark's `approx_percentile`,
    * Greenwald–Khanna-style quantile summaries) as a CHECKED CONTRACT.
    *
    * The summary's guarantee — each returned value's rank is within
    * n/accuracy of the target rank — holds REGARDLESS of the
    * nondeterministic order partial summaries merge in; the estimate
    * itself may vary run to run, the bound may not. So the query emits
    * nothing estimate-valued: it computes the estimates, re-derives their
    * EXACT rank intervals in a second conditional-agg pass (count of v <
    * est and v ≤ est — ties give an interval), and outputs the exact row
    * count plus one verdict per percentile that the interval intersects
    * [p·n − n/acc, p·n + n/acc]. Verdicts are integer arithmetic ×100
    * (accuracy = 100), so no float boundary can flip them. The oracle
    * computes the count and asserts every verdict literally TRUE — a hash
    * match certifies the sketch's rank-error guarantee on this data.
    *
    * Scale shape: one aggregation to build the summary (mergeable partials
    * — the 1000-executor shape), one broadcast of the 1-row estimate
    * frame, one conditional-agg scan for the exact ranks. The exact-rank
    * pass exists for the CONTRACT; a production consumer reads just the
    * estimates and skips it. */
  def qApproxPercentiles(s: SparkSession, sf: String): DataFrame = {
    val v = t(s, sf, "lineitem").select(col("l_extendedprice").as("v"))
    val appr = v.agg(
      expr("approx_percentile(v, array(0.25, 0.5, 0.75), 100)").as("ap"))
    def okCols = Seq((1, 25, "q25_ok"), (2, 50, "q50_ok"), (3, 75, "q75_ok"))
      .map { case (i, p100, name) =>
        val rLo = sum(when(col("v") < element_at(col("ap"), i), 1L)
          .otherwise(0L)) // ranks strictly below the estimate
        val rHi = sum(when(col("v") <= element_at(col("ap"), i), 1L)
          .otherwise(0L)) // max rank of the estimate (ties included)
        val n = count(lit(1))
        // interval [rLo+1, rHi] must intersect [p·n − n/100, p·n + n/100]:
        // ×100 keeps it in exact integer space (accuracy = 100)
        (((rLo + 1) * 100 <= n * (p100 + 1)) && (rHi * 100 >= n * (p100 - 1)))
          .as(name)
      }
    val aggs = count(lit(1)).as("n") +: okCols
    v.crossJoin(broadcast(appr))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** X66: Count-Min sketch (Cormode & Muthukrishnan 2005) — the frequency
    * sketch whose SIZE is fixed (d×w counters) no matter how large the
    * corpus: each executor folds its partition of the token stream into
    * d·w partial counters (the groupBy key space is bounded by d·w = 8192,
    * so map-side combine collapses every partition to at most 8192 rows
    * before the shuffle), the merged table IS the sketch, and a point
    * query reads back min over d cells — broadcast-joinable precisely
    * because the sketch cannot grow. This is the companion to the
    * Misra–Gries pass above: MG keeps exact candidates for the heavy tail,
    * CM answers frequency point queries for ANY key with a one-sided
    * error (est ≥ true always; est ≤ true + 2N/w with prob ≥ 1−(1/2)^d).
    *
    * FULLY ORACLE-CHECKED, not just a contract: the d hash functions are
    * disjoint 8-hex-digit windows of ONE `md5("cm:" ++ token)` digest
    * (mod w — exact-uniform since w divides 2³²), bit-identical in Spark
    * (`conv(…,16,10)`) and DuckDB
    * (`CAST('0x'||… AS BIGINT)`), so the whole sketch — every counter,
    * every estimate — is a deterministic pure function of the data that
    * DuckDB replays end to end. The probe set is the exact heavy-hitter
    * list (self-contained: derived from the same corpus), and the output
    * carries the exact count, the CM estimate, and the never-underestimate
    * verdict per token.
    *
    * 100 TB shape: one corpus scan, bounded-key aggregation (the ONLY
    * shuffle, ≤ d·w rows after partial agg), probe side joins the
    * broadcast sketch. Compare `heavyHittersExact`, whose shuffle key
    * space is the full vocabulary. */
  private val CmD = 4   // hash rows
  private val CmW = 2048L // counters per row

  /** The d cell indexes come from ONE md5 per key, not d salted calls:
    * an md5 digest is 32 hex chars, and the d = 4 rows each read a
    * DISJOINT 8-hex-digit window (32 uniform bits; 2048 divides 2³², so
    * `mod w` stays exactly uniform) — independent-enough hash rows at a
    * quarter of the hashing cost, which is the dominant per-row work of
    * every sketch build (measured: the 16×-scale `q_cm_join_est` spends
    * its time in md5). Both engines slice the same digest, so DuckDB
    * replay stays bit-exact. */
  private def cmDigest(tok: org.apache.spark.sql.Column) =
    md5(concat(lit("cm:"), tok))

  private def cmCell(j: Int, digest: org.apache.spark.sql.Column) =
    pmod(conv(substring(digest, 1 + 8 * j, 8), 16, 10)
      .cast("long"), lit(CmW))

  /** The d×w counter table for a token column — at most d·w rows. */
  private[graft] def cmSketch(toks: DataFrame): DataFrame =
    toks.withColumn("h", cmDigest(col("token")))
      .select(posexplode(
        array((0 until CmD).map(j => cmCell(j, col("h"))): _*))
      .as(Seq("j", "cell")))
      .groupBy("j", "cell").agg(count(lit(1)).as("cnt"))

  /** Carter–Wegman hash rows for NATIVE LONG keys — the join-estimate
    * path's hash (r14; the md5-hex `conv` tower it replaces was ~10× the
    * arithmetic cost and made `q_cm_join_est` the suite's worst x16
    * scaler). h_j(k) = ((k mod p)·a_j + b_j mod p) mod w with p = 2³¹−1
    * (Mersenne prime) and fixed constants a_j, b_j < p: a 2-universal
    * family (Carter & Wegman 1979), which is exactly the independence the
    * CM guarantee needs (Cormode & Muthukrishnan 2005, Thm 1). Every
    * intermediate fits int64 ((p−1)² + p < 2⁶³ — no ANSI overflow), so
    * DuckDB replays the whole hash in plain integer arithmetic,
    * bit-exactly. Keys here are row identifiers (orderkeys, user ids) —
    * for string keys the md5-window rows above remain the hash. */
  private val CwP = 2147483647L // 2^31 − 1
  private val CwA = Array(1941293871L, 1117695901L, 2097157061L, 894712253L)
  private val CwB = Array(722160293L, 1583031327L, 176114077L, 1909869133L)

  /** PRECONDITION: callers feed NON-NEGATIVE keys (row identifiers —
    * orderkeys, custkeys, uids with a 0 default). Spark's pmod is always
    * non-negative while the DuckDB oracle replay uses sign-of-dividend %;
    * the oracle side is written sign-safe (`(k % p + p) % p`), but a
    * negative key would still split a logical key across two cells versus
    * intuition, so the domain is asserted where keys are derived. */
  private def cmCellKey(j: Int, k: org.apache.spark.sql.Column) =
    pmod(pmod(pmod(k, lit(CwP)) * lit(CwA(j)) + lit(CwB(j)), lit(CwP)),
      lit(CmW))

  /** `(j, a_j, b_j)` rows for oracle `VALUES` lists, so the DuckDB replay
    * — `((k % 2147483647) * a + b) % 2147483647 % 2048` joined against
    * these rows — stays in lockstep with [[cmCellKey]]'s constants. */
  private[graft] def cmCwValuesSql: String =
    (0 until CmD).map(j => s"(${j}, ${CwA(j)}, ${CwB(j)})").mkString(", ")

  /** Weighted sketch from a PRE-AGGREGATED (k: long, wn) key-frequency
    * frame — [[cmSketchWeighted]]'s long-key twin, hashing with
    * [[cmCellKey]]: d pure-arithmetic hashes per DISTINCT key, no string
    * rendering, no md5. */
  private[graft] def cmSketchWeightedKey(keyCounts: DataFrame): DataFrame =
    keyCounts
      .select(col("wn"), posexplode(
        array((0 until CmD).map(j => cmCellKey(j, col("k"))): _*))
      .as(Seq("j", "cell")))
      .groupBy("j", "cell").agg(sum(col("wn")).as("cnt"))

  /** CM join-cardinality estimate between two PRE-AGGREGATED (k: long, wn)
    * key-frequency frames, as a 1-row (est_n) frame — the planner-facing
    * primitive behind [[qCmJoinEst]] and the broadcast/salt/shuffle
    * decision in `SkewOps.qPlannedSkewJoin`. NULL est (no cell ever
    * collides — disjoint key sets on an empty corpus) is the caller's to
    * coalesce to 0. */
  private[graft] def cmJoinEstimate(aCnt: DataFrame, bCnt: DataFrame): DataFrame = {
    val skA = cmSketchWeightedKey(aCnt).withColumnRenamed("cnt", "ca")
    val skB = cmSketchWeightedKey(bCnt).withColumnRenamed("cnt", "cb")
    skA.join(skB, Seq("j", "cell"))
      .groupBy("j").agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min(col("ip")).as("est_n"))
  }

  /** Sketch from a PRE-AGGREGATED (token, wn) frequency frame: counter for
    * (j, cell) = Σ wn over tokens hashing there — identical counters to
    * [[cmSketch]] over the raw rows, but the d salted-md5 hashes are
    * computed once per DISTINCT key instead of once per row, and the
    * group-count subtree can be SHARED (ReusedExchange) with any exact-side
    * consumer of the same key frequencies. */
  private[graft] def cmSketchWeighted(keyCounts: DataFrame): DataFrame =
    keyCounts.withColumn("h", cmDigest(col("token")))
      .select(col("wn"), posexplode(
        array((0 until CmD).map(j => cmCell(j, col("h"))): _*))
      .as(Seq("j", "cell")))
      .groupBy("j", "cell").agg(sum(col("wn")).as("cnt"))

  /** Point-query `queries` (a `token` column) against a sketch: min over
    * the d matching cells. The sketch side is broadcast — it is bounded.
    * LEFT join with missing cells coalesced to 0: a token the corpus never
    * produced may hash to (j, cell) pairs absent from the counter table,
    * and an inner join would either drop the token or take min over only
    * the colliding cells (inflated) — the correct CM answer for an unseen
    * key is 0, which still never underestimates. */
  private[graft] def cmEstimate(queries: DataFrame, sketch: DataFrame): DataFrame = {
    val probes = queries.withColumn("h", cmDigest(col("token")))
      .select(col("*"), posexplode(
        array((0 until CmD).map(j => cmCell(j, col("h"))): _*))
      .as(Seq("j", "cell"))).drop("h")
    val others = queries.columns.filter(_ != "token").map(col).toSeq
    probes.join(broadcast(sketch), Seq("j", "cell"), "left")
      .groupBy(col("token") +: others: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
  }

  /** X70: JOIN-SIZE ESTIMATION from CM sketches (the AMS/Count-Min inner
    * product, Cormode & Muthukrishnan §4.2) — |A ⋈ B on k| = Σ_k nA(k)·nB(k)
    * is estimated as min_j Σ_cell cmA[j][cell]·cmB[j][cell], the planner
    * primitive that prices a join WITHOUT running it. Hash collisions only
    * ADD cross terms, so the estimate NEVER undershoots (the same one-sided
    * guarantee as the point query); overshoot is bounded by nA·nB/w per row
    * w.h.p. At 100 TB this is how an optimizer decides broadcast vs
    * shuffle vs skew-salt from two 8 KB summaries instead of a dry run —
    * and because both sketches use the salted-md5 rows, DuckDB replays the
    * entire estimate exactly.
    *
    * The output also carries the EXACT join cardinality — itself computed
    * WITHOUT materializing the join (Σ over shared keys of the two group
    * counts' product — group-count shuffles, never row×row fan-out) — plus
    * the never-undershoot verdict and the e6 overshoot ratio.
    *
    * 100 TB shape: ONE group-count pass per table feeds BOTH the sketch
    * build (weighted — md5 ×d per distinct key, not per row) and the
    * exact side, sharing the keyed shuffle via ReusedExchange; then two
    * bounded-key (≤ d·w) sketch aggs and one 8192-row join between them —
    * no row-level join output ever exists. */
  def qCmJoinEst(s: SparkSession, sf: String): DataFrame = {
    // one keyed group-count per table, consumed twice (identical subtrees
    // → one exchange, ReusedExchange). Everything downstream of the
    // aggregation stays on the NATIVE 8-byte long key: the sketch hashes
    // with the Carter–Wegman integer rows ([[cmCellKey]]) — at 16× scale
    // first the string-keyed shuffle (r13) and then the per-distinct-key
    // md5 tower (r14) dominated this query; both are gone. The exact side
    // joins on the same long key.
    val liCnt = t(s, sf, "lineitem")
      .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("wn"))
    val ordCnt = t(s, sf, "orders")
      .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("wn"))
    val est = cmJoinEstimate(liCnt, ordCnt)
    val exact = liCnt.withColumnRenamed("wn", "na")
      .join(ordCnt.withColumnRenamed("wn", "nb"), "k")
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("exact_n"))
    exact.crossJoin(broadcast(est))
      .select(col("exact_n"), col("est_n"),
        (col("est_n") >= col("exact_n")).as("overestimate_ok"),
        // ×100 (percent), not ×1e6: est_n·1e6 would overflow int64 once
        // the join passes ~9.2e12/1e6 rows — percent precision is what a
        // broadcast-vs-shuffle decision needs anyway. greatest(…, 1)
        // guards disjoint key sets: exact_n = 0 must yield a defined
        // ratio in BOTH engines (DuckDB integer // 0 errors out).
        expr("(est_n * 100) div greatest(exact_n, 1L)").as("ratio_pct"))
  }

  def qCmSketch(s: SparkSession, sf: String): DataFrame = {
    val docs = tWide(s, sf, "documents")
    // WEIGHTED build (r14): counter(j, cell) = Σ n over distinct tokens
    // hashing there — identical counters to cmSketch over the raw token
    // stream (so the oracle's raw-row replay is unchanged), but md5 runs
    // once per DISTINCT token, and the token group-count subtree is the
    // SAME subtree heavyHittersExact aggregates for the probe side, so
    // the exchange is computed once (ReusedExchange)
    val freq = tokens(docs, "text")
      .groupBy("token").agg(count(lit(1)).as("wn"))
    val hh = heavyHittersExact(docs, "text")
      .select(col("token"), col("n").as("exact_n"))
    cmEstimate(hh, cmSketchWeighted(freq))
      .select(col("token"), col("exact_n"), col("est_n"),
        (col("est_n") >= col("exact_n")).as("overestimate_ok"))
      .orderBy("token")
  }

  /** Mergeable distinct-count sketches (Apache DataSketches HLL, built into
    * Spark as `hll_sketch_agg`/`hll_union_agg`): per-(group, shard) sketches
    * are built independently — the shape of 1000 executors each sketching
    * their shard of 100 TB — then register-wise-max-merged per group and
    * estimated. The union of shard sketches carries the identical register
    * state as one pass over the whole group (HLL merge is exact on the
    * sketch, approximate only vs the true count), so pre-aggregated sketch
    * columns can live in a rollup table and still answer distinct-count
    * queries over any group combination.
    *
    * CHECKED CONTRACT (the estimate itself has no DuckDB equivalent): the
    * query emits, per group, the exact distinct count plus two in-plan
    * verdicts — the merged estimate is SPLIT-INDEPENDENT (re-sharding by a
    * different key and shard count merges to the identical estimate: the
    * union's register state is a pure function of the value set), and it
    * lands within 3·rsd of the exact count (rsd ≈ 1.04/√2¹² ≈ 1.63% at
    * lgConfigK=12). The oracle computes the exact count and asserts both
    * verdicts are literally TRUE, so the hash match certifies sketch
    * semantics, not just row shape. (Merged ≠ single-pass estimate in
    * general: a one-pass DataSketches sketch carries a HIP estimator that
    * union legitimately discards — equality holds only in sparse mode, so
    * it is NOT the claim; split-independence is.) */
  def qHllUnion(s: SparkSession, sf: String): DataFrame = {
    val li = t(s, sf, "lineitem")
    def merged(shardKey: org.apache.spark.sql.Column, nShards: Int, out: String) =
      li.withColumn("shard", pmod(shardKey, lit(nShards)))
        .groupBy("l_returnflag", "shard")
        .agg(expr("hll_sketch_agg(l_partkey, 12)").as("sk"))
        .groupBy("l_returnflag")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))")
          .cast("long").as(out))
    val a = merged(col("l_orderkey"), 16, "est_a")
    val b = merged(col("l_suppkey"), 7, "est_b")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    a.join(b, Seq("l_returnflag")).join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_parts"),
        (col("est_a") === col("est_b")).as("merge_consistent"),
        (abs(col("est_a") - col("exact_parts")).cast("double") <=
          lit(3 * 1.04 / math.sqrt(1 << 12)) * col("exact_parts")).as("within_3rsd"))
      .orderBy("l_returnflag")
  }
}
