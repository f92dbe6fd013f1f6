package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.ops.CleanColumns
import graft.ops.TextOps.chunkGreedy
import graft.functions.{LabeledScore, ScoredRow, TopKByScore, WordShingles}
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck property suites for the pure kernels (no SparkSession). */
object CleanColumnsProps extends Properties("CleanColumns") {

  private val nameGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', '-', '$', '(', ')', '_', '\n', '\t')))
      .map(_.mkString)

  property("outputs unique") = forAll(Gen.listOf(nameGen)) { names =>
    val cleaned = CleanColumns.cleanColumnNames(names)
    cleaned.distinct.size == cleaned.size
  }

  property("outputs match [a-z0-9_]*") = forAll(nameGen) { n =>
    CleanColumns.cleanName(n).matches("[a-z0-9_]*")
  }

  property("idempotent") = forAll(nameGen) { n =>
    val once = CleanColumns.cleanName(n)
    CleanColumns.cleanName(once) == once
  }

  property("length preserved for already-clean snake_case") =
    forAll(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)) { n =>
      CleanColumns.cleanName(n) == n
    }
}

object ChunkerProps extends Properties("ChunkGreedy") {

  private val rowsGen: Gen[List[(Long, String)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 1000L),
      Gen.choose(1, 40).flatMap(n => Gen.stringOfN(n, Gen.alphaChar))))

  property("covers every row exactly once, in order") = forAll(rowsGen) { rows =>
    val chunks = chunkGreedy(rows, 50)
    chunks.flatMap(_._1) == rows.map(_._1)
  }

  property("no chunk over budget unless it is a single row") = forAll(rowsGen) { rows =>
    chunkGreedy(rows, 50).forall { case (ids, text) =>
      val size = text.split("\n", -1).map(_.length).sum
      size <= 50 || ids.size == 1
    }
  }

  property("chunk count is minimal-greedy: adding first row of next chunk overflows") =
    forAll(rowsGen) { rows =>
      val chunks = chunkGreedy(rows, 50)
      chunks.zip(chunks.drop(1)).forall { case ((_, t1), (ids2, t2)) =>
        val s1 = t1.split("\n", -1).map(_.length).sum
        val first2 = t2.split("\n", -1).head.length
        s1 + first2 > 50 || ids2.isEmpty
      }
    }
}

object TopKProps extends Properties("TopKByScore") {

  private val agg = new TopKByScore(4)
  private val rowGen = Gen.zip(Gen.choose(0L, 50L), Gen.choose(0, 20).map(_ / 4.0))
    .map { case (id, s) => LabeledScore(0, id, s) }

  property("buffer sorted desc, bounded by k, equals brute-force top-k") =
    forAll(Gen.listOf(rowGen)) { rows =>
      val buf = rows.foldLeft(agg.zero)(agg.reduce)
      // the aggregator keeps duplicate (id, score) rows — compare against
      // the sorted prefix of the multiset
      val want = rows.map(r => ScoredRow(r.id, r.score))
        .sortBy(r => (-r.score, r.id)).take(4)
      buf.size <= 4 && buf == want
    }

  property("merge is order-insensitive") = forAll(Gen.listOf(rowGen), Gen.listOf(rowGen)) {
    (a, b) =>
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = b.foldLeft(agg.zero)(agg.reduce)
      agg.merge(ba, bb) == agg.merge(bb, ba)
  }
}

object WinnowProps extends Properties("Winnow") {
  import graft.functions.Winnow

  private def fps(s: String, k: Int = 8, w: Int = 4): Seq[Long] = {
    val arr = Winnow.compute(UTF8String.fromString(s), k, w)
    (0 until arr.numElements()).map(arr.getLong)
  }

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf("spark", "table", "join", "scan", "merge", "row"))
      .map(_.mkString(" "))

  property("deterministic and whitespace/case normalized") = forAll(textGen) { s =>
    fps(s) == fps("  " + s.toUpperCase.replace(" ", "   ") + " ")
  }

  property("identical docs share all fingerprints; guarantee holds for long matches") =
    forAll(textGen.suchThat(_.length > 30)) { s =>
      val a = fps(s).toSet
      // append a suffix: the long shared prefix must still share >= 1 fingerprint
      val b = fps(s + " zzz unique tail").toSet
      (a & b).nonEmpty
    }

  property("output size is sublinear: at most #kgrams, at least 1") = forAll(textGen) { s =>
    val n = fps(s).size
    n >= 1 && n <= math.max(1, s.length)
  }
}

object ShingleProps extends Properties("WordShingles") {

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf("spark", "Table", "JOIN", "a", "b", "c"))
      .map(_.mkString(" "))

  private def kernel(s: String, n: Int): Seq[String] = {
    val arr = WordShingles.compute(UTF8String.fromString(s), n)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  property("shingle count = distinct windows, min 1") = forAll(textGen) { s =>
    val toks = s.toLowerCase.trim.split("\\s+")
    val out = kernel(s, 3)
    if (toks.length >= 3)
      out.size == toks.sliding(3).map(_.mkString(" ")).toSeq.distinct.size
    else out.size == 1
  }

  property("every shingle has exactly n tokens (when enough input)") = forAll(textGen) { s =>
    val toks = s.toLowerCase.trim.split("\\s+")
    toks.length < 3 || kernel(s, 3).forall(_.split(" ").length == 3)
  }

  property("case-insensitive") = forAll(textGen) { s =>
    kernel(s, 3) == kernel(s.toUpperCase, 3)
  }
}
