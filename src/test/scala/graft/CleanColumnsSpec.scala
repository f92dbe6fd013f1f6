package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CleanColumns._

/** Column-cleaning semantics must match the reference's `clean_column_names`
  * (`duckdb_util.py:29-61`) observable behavior. */
class CleanColumnsSpec extends AnyFunSuite {

  test("reference examples clean as expected") {
    assert(cleanName(" Relative humidity.") == "relative_humidity")
    assert(cleanName("Order Key") == "order_key")
    assert(cleanName("Total-Price($)") == "total_price")
    assert(cleanName("STATUS") == "status")
    assert(cleanName(" status ") == "status")
    assert(cleanName("a\nb\rc") == "a_b_c")
    assert(cleanName("__x__") == "x")
    assert(cleanName("col.A") == "col_a")
  }

  test("duplicates get _1, _2 suffixes in first-seen order") {
    assert(cleanColumnNames(Seq("Col A", "Col.A", "col_a")) ==
      Seq("col_a", "col_a_1", "col_a_2"))
    assert(cleanColumnNames(Seq("STATUS", " status ", "Status")) ==
      Seq("status", "status_1", "status_2"))
  }

  test("cleaning is idempotent on already-clean names") {
    val names = Seq("l_orderkey", "o_totalprice", "c_custkey", "x_1")
    assert(cleanColumnNames(names) == names)
    names.foreach(n => assert(cleanName(cleanName(n)) == cleanName(n)))
  }

  test("unicode word characters survive like Python's \\w (reference parity)") {
    // Python re \w is unicode by default; the (?U) flag mirrors that
    assert(cleanName("Café Größe") == "café_größe")
    assert(cleanName("数量 (units)") == "数量_units")
    assert(cleanName("prix-€") == "prix")
  }

  test("property: outputs are always unique and regex-clean") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ 09._-$%()\n\r\t"
    (1 to 200).foreach { _ =>
      val names = (1 to rnd.nextInt(8) + 1).map(_ =>
        (1 to rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val cleaned = cleanColumnNames(names)
      assert(cleaned.distinct.size == cleaned.size, s"dupes in $cleaned from $names")
      cleaned.foreach(c => assert(c.matches("[a-z0-9_]*"), s"bad char in '$c'"))
    }
  }
}
