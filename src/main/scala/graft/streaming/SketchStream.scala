package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming sketch maintenance — the incremental face of
  * `graft.ops.SketchOps`. A 100 TB/day ingest wants its frequent-token
  * profile maintained as data arrives, not recomputed nightly: the
  * Misra–Gries counter state lives per hash-shard in
  * `flatMapGroupsWithState`, every micro-batch folds its tokens into the
  * counters, and the current candidate set is re-emitted under a
  * monotonically increasing version so downstream consumers (and the spec)
  * can always identify the latest snapshot.
  *
  * Guarantee carried across the stream: tokens hash-shard
  * deterministically, so a token's occurrences all hit one shard's
  * counters; Misra–Gries with capacity k then guarantees any token whose
  * TOTAL stream frequency exceeds (that shard's token count)/k survives in
  * the candidate set REGARDLESS of how the stream was micro-batched —
  * exactly the superset property the batch two-pass formulation
  * (`SketchOps.heavyHittersMG`) relies on, proven over random batch splits
  * in StreamingSpec. State is bounded by shards × k counters, independent
  * of stream length; the exact recount of candidates stays a cheap keyed
  * batch join whenever a precise report is needed.
  */
object SketchStream {

  /** X66 streaming face: the Count-Min counter table maintained as a plain
    * STREAMING AGGREGATION in Complete mode — legitimate without a
    * watermark precisely because CM state is bounded by construction (d·w
    * counters, corpus-independent): the rare stateful query whose
    * unbounded-lifetime state is finite. Counters are integer sums, so the
    * streamed snapshot equals the batch sketch EXACTLY under any
    * micro-batching (StreamingSpec proves bit-equality across uneven
    * splits). The batch kernel runs unchanged on the stream — one
    * definition serves both; point queries keep using
    * `SketchOps.cmEstimate` against the latest snapshot. */
  def cmSketchStream(tokens: DataFrame): DataFrame =
    graft.ops.SketchOps.cmSketch(tokens)

  /** Per-shard MG state: bounded counters + an emission version. */
  case class MgState(counters: Map[String, Long], version: Long)

  /** Maintain MG candidates over a streaming `token` column. Emits
    * (shard, version, token) for the full candidate set of each shard on
    * every batch (Update mode) — take max(version) per shard for the
    * current snapshot. */
  def mgCandidatesStream(tokens: DataFrame, k: Int, shards: Int = 8)
      : Dataset[(Int, Long, String)] = {
    import tokens.sparkSession.implicits._
    val sharded = tokens.select(
      pmod(xxhash64(col("token")), lit(shards)).cast("int").as("shard"),
      col("token").cast("string").as("token")).as[(Int, String)]
    sharded.groupByKey(_._1)
      .flatMapGroupsWithState[MgState, (Int, Long, String)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard, rows, state) =>
          val prev = state.getOption.getOrElse(MgState(Map.empty, 0L))
          val counters =
            scala.collection.mutable.HashMap[String, Long](prev.counters.toSeq: _*)
          rows.foreach { case (_, t) =>
            counters.get(t) match {
              case Some(c) => counters.update(t, c + 1)
              case None if counters.size < k => counters.update(t, 1L)
              case None =>
                val dead = new scala.collection.mutable.ArrayBuffer[String]()
                counters.foreach { case (tok, c) =>
                  if (c == 1L) dead += tok else counters.update(tok, c - 1)
                }
                dead.foreach(counters.remove)
            }
          }
          val v = prev.version + 1
          state.update(MgState(counters.toMap, v))
          counters.keysIterator.map(t => (shard, v, t)).toSeq.iterator
      }
  }
}
