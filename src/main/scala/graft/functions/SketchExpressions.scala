package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native sketch kernels (MinHash signature, SimHash, winnowing).
  *
  * Why native expressions and not `transform`/`aggregate` lambdas:
  * Spark's higher-order functions re-evaluate their argument expression
  * on every lambda iteration, so a 64-permutation MinHash written as
  * `transform(seq(0,63), i -> array_min(transform(hashes, ...)))`
  * recomputes the tokenize→shingle→hash chain 64× per row (measured
  * 24 s for 500 docs at sf0.01). These expressions evaluate the child
  * exactly once per row and run a tight JVM loop; `doGenCode` emits a
  * static call so they stay inside whole-stage codegen.
  *
  * The permutation family is splitmix64 (public-domain mixer) — a
  * deterministic, seedable 64-bit bijection; sketches are engine
  * -internal (never oracle-hashed), so the exact family is free.
  */
object Sketch {

  /** splitmix64 finalizer — bijective 64-bit mixer. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** k-permutation MinHash of a hash array. */
  def minHash(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = mix(h ^ mix(j.toLong))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash from per-token hashes. */
  def simHash(hashes: ArrayData): Long = {
    val sums = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (sums(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Winnowing: distinct minima of every sliding window of `w`
    * consecutive hashes (MOSS scheme); whole-array min if shorter.
    */
  def winnow(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    if (n < w) {
      var m = Long.MaxValue
      var i = 0
      while (i < n) { val v = hashes.getLong(i); if (v < m) m = v; i += 1 }
      out.add(m)
    } else {
      // O(n) sliding min via monotonic deque of indices
      val deque = new java.util.ArrayDeque[Int]()
      var i = 0
      while (i < n) {
        while (!deque.isEmpty && hashes.getLong(deque.peekLast()) >= hashes.getLong(i))
          deque.pollLast()
        deque.addLast(i)
        if (deque.peekFirst() <= i - w) deque.pollFirst()
        if (i >= w - 1) out.add(hashes.getLong(deque.peekFirst()))
        i += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  def min_hash(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashExpr(ColumnBridge.expression(hashes), k))
  def sim_hash(hashes: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(hashes)))
  def winnow_min(hashes: Column, w: Int): Column =
    ColumnBridge.column(WinnowExpr(ColumnBridge.expression(hashes), w))
}

case class MinHashExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "min_hash"
  override def nullSafeEval(in: Any): Any =
    Sketch.minHash(in.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketch.minHash($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashExpr = copy(child = c)
}

case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sim_hash"
  override def nullSafeEval(in: Any): Any =
    Sketch.simHash(in.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketch.simHash($c)")
  override protected def withNewChildInternal(c: Expression): SimHashExpr = copy(child = c)
}

case class WinnowExpr(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_min"
  override def nullSafeEval(in: Any): Any =
    Sketch.winnow(in.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketch.winnow($c, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowExpr = copy(child = c)
}
