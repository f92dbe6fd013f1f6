package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-shingles of a normalized (lowercased, \s+-tokenized)
  * string, as one compiled kernel instead of a chain of interpreted
  * higher-order functions (split → sequence → transform → element_at ×3 →
  * concat_ws → array_distinct), which profiled ~10× slower. Documents
  * shorter than n tokens yield a single whole-text shingle.
  *
  * Feeds the MinHash+LSH dedup pipeline (`graft.ops.DedupOps`), the Spark
  * analog of the reference's chunk/embedding ingestion normalization
  * (`chroma_ingestion_util.py:97-143` serializes rows; shingling is the
  * dedup-specific extension from the north star).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  /** Compiled kernel shared by eval and codegen. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.toLowerCase.trim.split("\\s+")
    val out =
      if (toks.length >= n) {
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i + n <= toks.length) {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          seen.add(sb.toString)
          i += 1
        }
        val arr = new Array[Any](seen.size)
        val it = seen.iterator()
        var k = 0
        while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
        arr
      } else {
        Array[Any](UTF8String.fromString(toks.mkString(" ")))
      }
    new GenericArrayData(out)
  }
}
