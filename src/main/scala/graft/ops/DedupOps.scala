package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Near-duplicate detection over documents — the MinHash+LSH pipeline a
  * training-data dedup stage needs at 100 TB: shingle → minhash signature →
  * band buckets → bucket-join candidates → exact Jaccard verify. Every stage
  * is a shuffle on a bounded key (band, bucket); there is no all-pairs stage.
  * The verify step computes Jaccard from the two docs' distinct-shingle
  * arrays with `array_intersect` — linear in the number of candidate pairs,
  * no extra explode/join round-trips.
  */
object DedupOps {

  /** doc_id + distinct word-3-shingle array (normalized lowercase), via the
    * compiled `WordShingles` kernel. */
  def withShingles(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    docs.select(col("doc_id"),
      GraftColumnBridge.column(graft.functions.WordShingles(
        GraftColumnBridge.expression(col("text")), 3)).as("sh"))
  }

  /** MinHash signatures via the compiled `MinHashSig` kernel: one
    * projection, no explode/groupBy shuffle — each doc's k-entry signature
    * is computed in a single pass over its shingle array. */
  def minhashSignatures(shingled: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    shingled.select(col("doc_id"),
      GraftColumnBridge.column(graft.functions.MinHashSig(
        GraftColumnBridge.expression(col("sh")), k)).as("sig"))
  }

  /** LSH candidate pairs: band the k-entry signature into `bands` groups;
    * docs sharing any band bucket are candidates (join on (band, bucket)). */
  def minhashCandidates(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    val rowsPerBand = k / bands
    val bandKeys = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => element_at(col("sig"), i + 1)): _*).as("bucket"))
    }
    val exploded = sigs.select(col("doc_id"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    // Pairs are generated bucket-locally (groupBy + in-bucket combinations)
    // rather than by self-joining the signature subtree — signatures are
    // computed once, and the shuffle key (band, bucket) bounds every task.
    // Degenerate-bucket guard: a bucket holding a large fraction of the
    // corpus (e.g. empty docs all sharing one constant signature) would
    // make collect_list unbounded and pair generation quadratic. Such
    // buckets carry no near-dup signal beyond "these are all identical-ish"
    // — exact dedup (hash-groupBy) is the right tool for them — so they are
    // dropped here with an explicit cap instead of OOMing an executor.
    val maxBucket = 10000
    exploded
      .groupBy("band", "bucket")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucket)
      .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2),
          greatest(size(col("ids")) - col("i") - 1, lit(0)))).as("id_b"))
      .distinct()
  }

  /** Exact Jaccard for candidate pairs from their distinct-shingle arrays.
    * The shingle sides are single kernel projections (no shuffle), so
    * re-deriving them per join side is cheaper than materializing a pruned
    * copy — measured: a checkpoint+semi-join variant added ~0.5 s of fixed
    * blocking-job latency at sf0.1 for nothing (contrast
    * `qNgramJaccardPairs`, where the verify sides would otherwise re-run a
    * whole freq-order pipeline and pruning wins 25%). */
  def jaccardForPairs(shingled: DataFrame, pairs: DataFrame): DataFrame = {
    val a = shingled.select(col("doc_id").as("id_a"), col("sh").as("sa"))
    val b = shingled.select(col("doc_id").as("id_b"), col("sh").as("sb"))
    val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
    pairs.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(inter / (size(col("sa")) + size(col("sb")) - inter), 6).as("jaccard"))
  }

  /** Reorders each doc's distinct-shingle array into the PPJoin canonical
    * order: ascending global document frequency (ties broken by shingle
    * value — a total order, as prefix-filter correctness requires). The
    * frequency table is itself distributed (groupBy shingle), never
    * collected: at 100 TB the distinct-shingle set is unbounded, so this is
    * a (shingle)-keyed join + per-doc rebuild, two bounded-key shuffles. */
  def freqOrderedShingles(docsWithSource: DataFrame): DataFrame = {
    val exploded = docsWithSource.select(col("doc_id"), col("source"),
      explode(col("sh")).as("key"))
    val freq = exploded.groupBy("key").agg(count(lit(1)).as("df"))
    exploded.join(freq, Seq("key"))
      .groupBy("doc_id", "source")
      .agg(transform(array_sort(collect_list(struct(col("df"), col("key")))),
        e => e.getField("key")).as("sh"))
  }

  /** Each doc's prefix join keys under its current `sh` order: the first
    * `n - ceil(t*n) + 1` shingles, with the doc's shingle count `n` riding
    * along for the downstream length filter. */
  def prefixKeys(shingled: DataFrame, threshold: Double): DataFrame = {
    val plen = (size(col("sh")) - ceil(size(col("sh")) * lit(threshold)) + 1)
      .cast("int")
    shingled.select(col("doc_id"), col("source"), size(col("sh")).as("n"),
      explode(slice(col("sh"), lit(1), plen)).as("key"))
  }

  /** N-gram Jaccard near-dup (EXACT, prefix-filter blocked): the
    * oracle-checkable baseline for the MinHash path, at threshold 0.4 (the
    * same bar `qMinhashNeardup` verifies at).
    *
    * Scale shape — AllPairs/PPJoin prefix filtering (Bayardo et al., WWW'07;
    * Xiao et al., WWW'08) instead of an all-pairs self-join on the
    * low-cardinality `source` block: sort each doc's distinct shingles into
    * a canonical order and explode only the first `n - ceil(t*n) + 1` of
    * them as join keys. Any pair with Jaccard ≥ t MUST share a prefix
    * shingle (if A∩B ≥ ceil(t·|A|), the first |A|-ceil(t·|A|)+1 elements of
    * A intersect B's prefix), so the blocking is LOSSLESS for ANY total
    * order — the oracle runs the plain all-pairs formulation and the hash
    * match proves no pair was dropped. The canonical order used is the
    * PPJoin standard, ascending global shingle frequency
    * (`freqOrderedShingles`), so prefixes hold each doc's RAREST shingles:
    * a globally common shingle lands in few prefixes, and the hot
    * (source, key) buckets a lexicographic order produces shrink
    * (DedupOpsSpec measures the drop). Join-key cardinality grows with the
    * corpus, never per-source quadratically. */
  /** The exact-path candidate pairs BEFORE materialization — split out so
    * PlanSpec can audit the generation plan (bucket-local aggregation +
    * in-bucket pair explode, no quadratic join operator), which the
    * checkpoint in [[qNgramJaccardPairs]] would otherwise hide behind a
    * `Scan ExistingRDD`. */
  def ngramCandidatePairs(s: SparkSession, sf: String,
      threshold: Double): DataFrame = {
    val docs = t(s, sf, "documents")
    val plain = withShingles(docs)
    // candidate pairs are generated bucket-locally (groupBy (source, key) +
    // in-bucket combinations), not by self-joining the prefix subtree: the
    // freq-ordering pass is the expensive part of the plan and a self-join
    // would compute it once PER SIDE. Work is identical to the equi-join
    // formulation (quadratic in bucket size either way — which is exactly
    // what the frequency-ordered prefixes keep small).
    val pre = prefixKeys(freqOrderedShingles(
      plain.join(docs.select("doc_id", "source"), Seq("doc_id"))), threshold)
    // AllPairs length filter, applied before the pair ever reaches the
    // verify joins: jaccard >= t forces |A∩B| >= t·|A∪B| >= t·max(|A|,|B|),
    // and |A∩B| <= min(|A|,|B|), so min·5 >= max·2 for t = 0.4 — written as
    // that exact rational because 0.4·max in binary floating point can
    // round past a boundary-valid pair. Lossless like the prefix filter
    // (the oracle's all-pairs hash match proves both).
    pre.groupBy("source", "key")
      .agg(sort_array(collect_set(struct(col("doc_id"), col("n")))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(col("source"), posexplode(col("ids")).as(Seq("i", "a")), col("ids"))
      .select(col("source"), col("a.doc_id").as("id_a"), col("a.n").as("na"),
        explode(slice(col("ids"), col("i") + lit(2),
          greatest(size(col("ids")) - col("i") - 1, lit(0)))).as("b"))
      .filter(least(col("na"), col("b.n")) * 5 >= greatest(col("na"), col("b.n")) * 2)
      .select(col("source"), col("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  def qNgramJaccardPairs(s: SparkSession, sf: String): DataFrame = {
    val threshold = 0.4
    val docs = t(s, sf, "documents")
    // materialize candidates once: they feed the pair output AND the
    // verify-side pruning below; without the checkpoint the expensive
    // freq-ordered prefix pipeline would re-run per consumer
    val cands = ngramCandidatePairs(s, sf, threshold).localCheckpoint()
    // verify sides use the PLAIN shingle arrays — array_intersect is
    // order-blind, so the canonical order only ever matters for prefixes.
    // Shingle only the docs that actually appear in a candidate pair
    // (semi-join prune BEFORE the kernel): the corpus-wide shingle pass
    // happens once (the prefix side); the verify sides touch candidates
    // only — at 100 TB that is the difference between re-shingling the
    // corpus twice and shingling the near-dup sliver
    val candIds = cands.select(col("id_a").as("doc_id"))
      .union(cands.select(col("id_b").as("doc_id"))).distinct()
    val needed = withShingles(
      docs.join(candIds, Seq("doc_id"), "left_semi")).localCheckpoint()
    val a = needed.select(col("doc_id").as("id_a"), col("sh").as("sa"))
    val b = needed.select(col("doc_id").as("id_b"), col("sh").as("sb"))
    val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
    val j = inter / (size(col("sa")) + size(col("sb")) - inter)
    cands.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .select(col("source"), col("id_a"), col("id_b"),
        round(j * 1000000, 0).cast("long").as("jaccard_e6"))
      .filter(col("jaccard_e6") >= (threshold * 1000000).toLong)
      .orderBy("id_a", "id_b")
  }

  /** Connected components over an undirected edge list — min-label
    * propagation (the standard Pregel/GraphFrames resolution): every node
    * starts labeled with its own id; each round, a node takes the minimum
    * of its label and its neighbors' labels; fixpoint in graph-diameter
    * rounds. Each round is ONE shuffle job (groupBy node of neighbor labels,
    * with the previous label carried through the same materialization so
    * convergence is a scan of the just-checkpointed blocks — no separate
    * join job); near-dup graphs are forests of small cliques, so diameter —
    * and the round count — is tiny regardless of corpus size.
    * `localCheckpoint` truncates lineage so the loop does not reanalyze a
    * growing plan, and each round's blocks are freed as soon as the next
    * round materializes (only the final labels stay persisted, backing the
    * returned frame). The driver holds one Boolean per round, never data.
    *
    * High-diameter guard: near-dup graphs are usually clique forests
    * (diameter ~2), but chain-shaped components exist — consecutive pairs
    * clear the similarity bar while distant ones don't — and linear
    * propagation needs diameter-many rounds there (observed: the 16×
    * cyclic-shift bench replicas chain into a component of diameter > 20).
    * From round `jumpAfter` on, each round adds a pointer jump (label :=
    * label of label — one extra keyed self-join), the standard
    * Shiloach-Vishkin halving, so distance-to-minimum shrinks
    * geometrically and any diameter D converges in ~jumpAfter + log2(D)
    * rounds. The jump is label-monotone (labels only decrease, and a
    * node's label is always a node of its own component), so the fixpoint
    * is unchanged — the clique-forest common case converges before
    * `jumpAfter` and pays nothing.
    *
    * Throws if the fixpoint is not reached within `maxIter`: truncated
    * labels are silently WRONG clusters. With jumping active the default
    * bound covers diameter 2^30 by round 38. */
  /** One min-label propagation round as a plain, un-checkpointed plan —
    * for plan review only (`Scratch plans`). The committed fixpoint hides
    * its shuffle shape behind `Scan ExistingRDD` checkpoint scans; this is
    * the same round body (keyed join on src, min-agg keyed on dst, left
    * join back to labels) with live lineage, so PLANS.md can show the
    * per-round exchange structure that actually repeats at scale. */
  def propagationRoundForPlan(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    val nbrMin = sym.join(labels, sym("src") === labels("node"))
      .groupBy(col("dst").as("node2")).agg(min(col("label")).as("nbr_label"))
    labels.withColumnRenamed("label", "old")
      .join(nbrMin, col("node") === col("node2"), "left")
      .select(col("node"),
        least(col("old"), coalesce(col("nbr_label"), col("old"))).as("label"))
  }

  def connectedComponents(edges: DataFrame, maxIter: Int = 40,
      jumpAfter: Int = 8): DataFrame = {
    import org.apache.spark.sql.GraftCheckpointUtils.unpersistCheckpoint
    // materialize the symmetrized edge list ONCE — the upstream edge query
    // may be expensive (e.g. the n-gram pair join), and every round reuses it
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    // every persisted block is freed on EVERY exit path except the one
    // success return (whose labels the caller owns): sym always; the live
    // labels checkpoint when the loop throws or fails to converge — without
    // this, a failure pins executor storage for the app's lifetime
    var labels: DataFrame = null
    var handedOff = false
    try {
      val nodes = sym.select(col("src").as("node")).distinct()
      labels = nodes.withColumn("label", col("node")).localCheckpoint()
      var converged = false
      var i = 0
      while (!converged && i < maxIter) {
        val nbrMin = sym.join(labels, sym("src") === labels("node"))
          .groupBy(col("dst").as("node2")).agg(min(col("label")).as("nbr_label"))
        // LAZY checkpoint: the convergence count below is the action that
        // materializes (and persists) the round — one job per round, not a
        // materialize job plus a scan job. A full count, not isEmpty, so no
        // partition is skipped and the checkpoint is complete.
        val propagated = labels.withColumnRenamed("label", "old")
          .join(nbrMin, col("node") === col("node2"), "left")
          .select(col("node"),
            least(col("old"), coalesce(col("nbr_label"), col("old"))).as("label"),
            col("old"))
        // pointer jump (rounds >= jumpAfter): resolve each node's label
        // through its label's own just-propagated label — one keyed
        // self-join per round that halves distance-to-minimum, turning
        // diameter-D convergence into ~log2(D) extra rounds. The
        // propagation result is lazily checkpointed first so BOTH sides of
        // the self-join read the same persisted blocks instead of
        // recomputing the round's subtree twice.
        var jumpBase: DataFrame = null
        val next = (if (i < jumpAfter) propagated
          else {
            jumpBase = propagated.localCheckpoint(eager = false)
            val byNode = jumpBase
              .select(col("node").as("jn"), col("label").as("jl"))
            jumpBase.join(byNode, col("label") === col("jn"), "left")
              .select(col("node"),
                least(col("label"), coalesce(col("jl"), col("label"))).as("label"),
                col("old"))
          }).localCheckpoint(eager = false)
        try converged = next.filter(col("label") =!= col("old")).count() == 0
        catch { // count is what materializes next — free its partial blocks
          case t: Throwable =>
            unpersistCheckpoint(next)
            if (jumpBase != null) unpersistCheckpoint(jumpBase)
            throw t
        }
        unpersistCheckpoint(labels) // superseded round's blocks are freed now
        if (jumpBase != null) unpersistCheckpoint(jumpBase) // next is materialized
        labels = next.select("node", "label")
        i += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"connectedComponents did not converge within $maxIter rounds — a " +
            "component's diameter exceeds the bound; raise maxIter for " +
            "chain-shaped graphs (labels would otherwise be silently wrong)")
      handedOff = true
      labels
    } finally {
      unpersistCheckpoint(sym)
      if (!handedOff && labels != null) unpersistCheckpoint(labels)
    }
  }

  /** Dedup clusters over the exact n-gram-Jaccard pair graph: connected
    * components, reported per cluster (representative = min doc_id — the
    * one a keep-one-per-cluster pass would retain). Oracle = DuckDB
    * recursive-CTE transitive closure, so the fixpoint itself is
    * hash-verified. Runs jobs during construction (iterative), like the
    * ingest roundtrips. */
  def qDedupClusters(s: SparkSession, sf: String): DataFrame = {
    val pairs = qNgramJaccardPairs(s, sf).select(
      col("id_a").as("src"), col("id_b").as("dst"))
    val labels = connectedComponents(pairs)
    // materialize the TINY cluster summary eagerly so the full label set —
    // the only thing still pinning executor storage after the fixpoint —
    // can be freed here instead of living for the app's lifetime (the
    // bench repeats this query; without the handoff each run would leave
    // one full label RDD behind)
    val clusters = labels
      .groupBy(col("label").as("cluster_rep"))
      .agg(count(lit(1)).as("n_members"), max(col("node")).as("max_member"))
      .filter(col("n_members") >= 2)
      .orderBy("cluster_rep")
      .localCheckpoint()
    org.apache.spark.sql.GraftCheckpointUtils.unpersistCheckpoint(labels)
    clusters
  }

  /** V13 scale path: MinHash+LSH near-dup pairs with exact Jaccard verify.
    * No oracle (hash-dependent candidate set); invariants in OpsSpec. */
  def qMinhashNeardup(s: SparkSession, sf: String): DataFrame = {
    val shingled = withShingles(t(s, sf, "documents"))
    val sigs = minhashSignatures(shingled, k = 32)
    val cands = minhashCandidates(sigs, k = 32, bands = 8)
    jaccardForPairs(shingled, cands)
      .filter(col("jaccard") >= 0.4)
      .orderBy("id_a", "id_b")
  }

  /** X26: semantic dedup (SemDeDup-style, Abbas et al. 2023) — keep ONE
    * representative per cluster of near-identical EMBEDDINGS, the
    * curation pass that removes semantic (not just lexical) duplicates
    * before training. Composes two independently-verified stages: the
    * band-blocked exact-cosine pair graph (`VectorOps.qEmbedNeardupPairs`
    * — candidates blocked on deterministic comparison-bit bands, so the
    * DuckDB oracle reproduces the candidate set term for term) and
    * min-label connected components. The report is per collection label:
    * total vectors, vectors in ≥2-member clusters, cluster count, and the
    * survivor count after keep-min-per-cluster. Every stage is a keyed
    * shuffle (band keys, then component labels, then the label-sized
    * report agg) — never vector×vector — so the shape holds at 100 TB. */
  def qSemanticDedup(s: SparkSession, sf: String): DataFrame = {
    val pairs = VectorOps.qEmbedNeardupPairs(s, sf)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val comp = connectedComponents(pairs) // (node, label) = (vec_id, component rep)
    val e = Tables.t(s, sf, "embeddings").select(col("vec_id"), col("label").as("coll"))
    val dupStats = e
      .join(comp.select(col("node").as("vec_id"), col("label").as("comp")), Seq("vec_id"))
      .groupBy("coll")
      .agg(count(lit(1)).as("n_clustered"), countDistinct(col("comp")).as("n_clusters"))
    val report = e.groupBy("coll").agg(count(lit(1)).as("n_vecs"))
      .join(dupStats, Seq("coll"), "left")
      .select(col("coll").as("label"), col("n_vecs"),
        coalesce(col("n_clustered"), lit(0L)).as("n_in_dup_clusters"),
        coalesce(col("n_clusters"), lit(0L)).as("n_clusters"),
        (col("n_vecs") - coalesce(col("n_clustered") - col("n_clusters"), lit(0L)))
          .as("n_kept"))
      .orderBy("label")
      .localCheckpoint() // free the component labels (see qDedupClusters)
    org.apache.spark.sql.GraftCheckpointUtils.unpersistCheckpoint(comp)
    report
  }
}
