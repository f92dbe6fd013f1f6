package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k-entry MinHash signature of a shingle set in one compiled pass: each
  * shingle is polynomial-hashed ONCE, then the k "permutations" are cheap
  * avalanche mixes of that base with per-seed constants (the standard
  * one-hash-k-transforms construction) — k× cheaper than k independent
  * string hashes, and signature computation needs no explode/groupBy
  * shuffle at all: it is a projection. Collision behavior: P[sig_i(A) =
  * sig_i(B)] ≈ J(A, B), which is all LSH banding needs.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      val base = polyHash(s)
      var j = 0
      while (j < k) {
        val h = mix(base ^ (j * 0x9e3779b97f4a7c15L + 0x165667b19e3779f9L))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](k)
    i = 0
    while (i < k) { out(i) = mins(i); i += 1 }
    new GenericArrayData(out)
  }

  private def polyHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ bytes(i)) * 0x100000001b3L; i += 1 }
    h
  }

  private def mix(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }
}
