package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sketch expressions over pre-hashed token arrays (`array<bigint>`).
  *
  * Why custom Expressions (builder-brief preference (b)): the higher-order-
  * function formulations — a 64-iteration `aggregate` over the token hashes
  * for SimHash, a 16×`transform`+`array_min` for MinHash — evaluate one
  * boxed lambda step per element per iteration (~4,000 interpreted steps
  * per document). These evaluate the same recurrences in one tight JVM
  * loop. CodegenFallback is deliberate: the loop itself is the win; the
  * per-row call overhead is noise (measured 5 s → <1 s on 5k docs).
  *
  * Both consume hashes, not strings — tokenize + hash once upstream
  * (`transform(tokens, t -> xxhash64(t))`), then derive every sketch from
  * the longs.
  */
private[functions] trait HashArrayExpr extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> of pre-hashed tokens, got $other")
  }
}

/** 64-bit SimHash: bit i = sign of Σ over hashes of (bit i ? +1 : -1). */
case class SimHash64Expr(child: Expression) extends HashArrayExpr {
  override def prettyName: String = "graft_simhash64"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < 64) {
        counts(i) += (((h >>> i) & 1L).toInt << 1) - 1 // +1 if bit set else -1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) out |= 1L << i
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(child = c)
}

/** Distinct sliding-window minima over a hash array — the winnowing
  * selection step (Schleimer et al. 2003) as ONE O(n) pass with a
  * monotonic deque, replacing the HOF formulation's O(n·w) per-window
  * `array_min(slice(...))` re-scan. Output: the DISTINCT selected minima
  * in first-selection order (the fingerprint SET, which is what winnowing
  * stores — density ≈ 2/(w+1)). */
case class WindowMinExpr(child: Expression, w: Int) extends HashArrayExpr {
  override def prettyName: String = "graft_window_min"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    // monotonic deque of indices: values increase front→back
    val dq = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val seen = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      val v = hs.getLong(i)
      while (tail > head && hs.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = hs.getLong(dq(head))
        if (seen.add(m)) out += m
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): WindowMinExpr = copy(child = c)
}

/** k MinHash signature: sig[k] = min over hashes of xxhash64(h, seed=k). */
case class MinHashSigExpr(child: Expression, k: Int) extends HashArrayExpr {
  override def prettyName: String = "graft_minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sig = new Array[Long](k)
    var s = 0
    while (s < k) {
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = XXH64.hashLong(hs.getLong(j), s)
        if (v < min) min = v
        j += 1
      }
      sig(s) = min
      s += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
}
