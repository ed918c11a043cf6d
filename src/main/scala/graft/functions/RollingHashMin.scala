package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: minimum 64-bit Karp–Rabin rolling hash over
  * all `window`-byte substrings of a string — a deterministic document
  * fingerprint (winnowing-style; robust to small edits outside the minimal
  * window). Documents shorter than `window` hash their full contents.
  *
  * Implemented as a custom `Expression` WITH `doGenCode` (not a Scala UDF):
  * the O(len) byte loop stays inside whole-stage codegen, no boxing, no
  * serialization of row values in the hot path.
  */
case class RollingHashMin(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    java.lang.Long.valueOf(RollingHashMin.minRollingHash(bytes, window))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHashMin.minRollingHash($c.getBytes(), $window)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHashMin {
  final val Base = 1000003L

  /** Polynomial rolling hash, min over all `w`-grams; mixed with a finalizer
    * so nearby windows don't produce nearby fingerprints. */
  def minRollingHash(bytes: Array[Byte], w: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val win = math.min(w, n)
    // precompute Base^(win-1)
    var pow = 1L
    var i = 1
    while (i < win) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < win) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    var best = mix(h)
    i = win
    while (i < n) {
      h = (h - (bytes(i - win) & 0xffL) * pow) * Base + (bytes(i) & 0xffL)
      val m = mix(h)
      if (m < best) best = m
      i += 1
    }
    best
  }

  private def mix(z0: Long): Long = {
    var z = (z0 ^ (z0 >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  /** Column API (classic bridge: Column ↔ Catalyst Expression). */
  def apply(c: Column, window: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(RollingHashMin(GraftBridge.expression(c), window))
  }
}
