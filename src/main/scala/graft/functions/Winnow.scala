package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * Rabin-Karp rolling hash over all k-grams of the normalized text, then
  * the minimum hash of each w-hash window (rightmost tie), deduplicated.
  * The guarantee: any match of length ≥ w+k-1 between two documents shares
  * at least one selected fingerprint — so fingerprint overlap is a
  * sound local-similarity candidate signal, with output size ~2/(w+1) of
  * the k-gram count. Compiled kernel (eval + codegen call the same static
  * hot loop), same pattern as `WordShingles`.
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

object Winnow {
  private final val Base = 1000003L

  /** Rolling k-gram hashes + winnowing window minima over the
    * whitespace-normalized lowercase text. */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val text = s.toString.toLowerCase.replaceAll("\\s+", " ").trim
    val n = text.length
    if (n < k) return new GenericArrayData(Array[Any](hashOf(text)))

    // Rabin-Karp: h(i+1) = (h(i) - text(i)*Base^(k-1)) * Base + text(i+k)
    val nh = n - k + 1
    val hashes = new Array[Long](nh)
    var pow = 1L
    var j = 1
    while (j < k) { pow *= Base; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + text.charAt(i); i += 1 }
    hashes(0) = mix(h)
    i = 1
    while (i < nh) {
      h = (h - text.charAt(i - 1) * pow) * Base + text.charAt(i + k - 1)
      hashes(i) = mix(h)
      i += 1
    }

    // winnow: min of each w-window, rightmost on ties; record when it moves
    val out = new java.util.LinkedHashSet[Long]()
    if (nh <= w) {
      out.add(minRightmost(hashes, 0, nh))
    } else {
      i = 0
      while (i + w <= nh) {
        out.add(minRightmost(hashes, i, i + w))
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericArrayData(arr)
  }

  private def minRightmost(hs: Array[Long], from: Int, until: Int): Long = {
    var best = hs(from)
    var i = from + 1
    while (i < until) { if (hs(i) <= best) best = hs(i); i += 1 }
    best
  }

  /** Finalizer so near-identical windows don't produce clustered hashes. */
  private def mix(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  private def hashOf(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * Base + s.charAt(i); i += 1 }
    mix(h)
  }
}
