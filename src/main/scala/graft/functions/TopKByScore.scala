package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k-by-score aggregator (SURVEY §4b): keeps a bounded k-list per
  * group instead of sorting the whole group the way a
  * `row_number().over(Window...)` plan does. Per-task work drops from
  * O(n log n) to O(n log k) and the partial-aggregation buffer is k rows,
  * so the shuffle carries k rows per (group × map task) instead of the
  * whole group. Ordering is total (score desc, then id asc) so results are
  * deterministic and tie-stable — identical to the window formulation.
  *
  * Reference semantics: per-collection top-k retrieval
  * (`chroma_retrieval_util.py:145-242`).
  */
case class ScoredRow(id: Long, score: Double)
case class LabeledScore(label: Int, id: Long, score: Double)

class TopKByScore(k: Int) extends Aggregator[LabeledScore, List[ScoredRow], Seq[ScoredRow]] {

  private def better(a: ScoredRow, b: ScoredRow): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Buffer: descending-ordered list, length ≤ k (k is small by contract). */
  override def zero: List[ScoredRow] = Nil

  override def reduce(buf: List[ScoredRow], row: LabeledScore): List[ScoredRow] =
    insert(buf, ScoredRow(row.id, row.score))

  override def merge(a: List[ScoredRow], b: List[ScoredRow]): List[ScoredRow] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[ScoredRow]): Seq[ScoredRow] = buf

  private def insert(buf: List[ScoredRow], row: ScoredRow): List[ScoredRow] = {
    if (buf.sizeIs >= k && !better(row, buf.last)) buf
    else {
      val (pre, post) = buf.span(better(_, row))
      (pre ::: row :: post).take(k)
    }
  }

  override def bufferEncoder: Encoder[List[ScoredRow]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredRow]] = ExpressionEncoder()
}
