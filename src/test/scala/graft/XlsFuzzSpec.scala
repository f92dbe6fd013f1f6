package graft

import graft.sources.XlsSource

/** Deterministic corruption fuzz for the OLE2/BIFF8 reader: every mutated
  * workbook must either parse (the flipped byte landed somewhere inert) or
  * fail with a real diagnostic — never a raw index/negative-size error
  * escaping from unchecked arithmetic on attacker-controlled offsets. */
class XlsFuzzSpec extends SparkTestBase {

  test("random single-byte corruptions never escape as raw index errors") {
    val base = XlsFixtures.cfb(XlsFixtures.buildWorkbook())
    val rnd = new scala.util.Random(42)
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "xls_fuzz")
    (1 to 300).foreach { i =>
      val bytes = base.clone()
      // corrupt 1-4 bytes anywhere past the magic (the magic check is
      // already covered by XlsSpec)
      (0 until rnd.nextInt(4) + 1).foreach { _ =>
        bytes(rnd.nextInt(bytes.length - 8) + 8) = rnd.nextInt(256).toByte
      }
      val p = dir.resolve(s"fuzz_$i.xls")
      java.nio.file.Files.write(p, bytes)
      try { XlsSource.readXls(spark, p.toString); () }
      catch {
        case e: IndexOutOfBoundsException =>
          fail(s"mutation $i escaped as raw $e\n  at " +
            e.getStackTrace.take(6).mkString("\n  at "))
        case e: NegativeArraySizeException =>
          fail(s"mutation $i escaped as raw $e\n  at " +
            e.getStackTrace.take(6).mkString("\n  at "))
        case _: RuntimeException => () // diagnosed failure — fine
      }
    }
  }
}
