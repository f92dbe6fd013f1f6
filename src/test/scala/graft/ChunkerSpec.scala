package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps.chunkGreedy

/** Greedy chunker parity with the reference `chunk_dataframe_dynamic`
  * (`chroma_ingestion_util.py:97-143`): flush when current_size + row_size
  * would exceed the budget and the chunk is non-empty; sizes count row text
  * only (no separators); oversized single rows still form their own chunk. */
class ChunkerSpec extends AnyFunSuite {

  test("hand-computed packing matches reference semantics") {
    val rows = Seq(1L -> "aaaa", 2L -> "bbbb", 3L -> "cccc") // 4 chars each
    // budget 8: rows 1,2 fit (8); row 3 would make 12 > 8 -> flush
    assert(chunkGreedy(rows, 8) ==
      Seq((Seq(1L, 2L), "aaaa\nbbbb"), (Seq(3L), "cccc")))
  }

  test("a row longer than the budget gets its own chunk") {
    val rows = Seq(1L -> "xx", 2L -> "y" * 50, 3L -> "zz")
    val chunks = chunkGreedy(rows, 10)
    assert(chunks.map(_._1) == Seq(Seq(1L), Seq(2L), Seq(3L)))
  }

  test("concatenating chunk rows reproduces the input exactly in order") {
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val rows = (1 to rnd.nextInt(40) + 1).map(i =>
        i.toLong -> ("r" * (rnd.nextInt(30) + 1)))
      val chunks = chunkGreedy(rows, 25)
      assert(chunks.flatMap(_._1) == rows.map(_._1))
      assert(chunks.flatMap(_._2.split("\n", -1).toSeq) == rows.map(_._2))
      // invariant: no chunk over budget except single-oversized-row chunks
      chunks.foreach { case (ids, text) =>
        val size = text.split("\n", -1).map(_.length).sum
        assert(size <= 25 || ids.size == 1, s"overfull chunk $ids size=$size")
      }
    }
  }
}
