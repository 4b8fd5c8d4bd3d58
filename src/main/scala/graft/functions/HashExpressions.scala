package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels shared by eval and generated code. Public because
  * whole-stage-codegen emits calls to them by fully-qualified name. */
object HashKernels {

  /** FNV-1a 64-bit over UTF-8 bytes — cheap, dependency-free, stable. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash of a token array: per-bit majority vote of token
    * hashes. Near-identical docs differ in few bits (compare via
    * bit_count(a ^ b) ≤ t). */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Winnowing fingerprint (Schleimer et al., SIGMOD '03): minimum
    * Karp-Rabin rolling hash over all k-char windows — a single stable
    * 64-bit document fingerprint robust to small edits at the ends. */
  def minRollingHash(text: UTF8String, k: Int): Long = {
    val bytes = text.getBytes
    if (bytes.length < k) return fnv1a64(text)
    val B = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    var min = mix(h)
    i = k
    while (i < bytes.length) {
      h = (h - (bytes(i - k) & 0xffL) * pow) * B + (bytes(i) & 0xffL)
      val m = mix(h)
      if (m < min) min = m
      i += 1
    }
    min
  }

  /** Finalizer so raw polynomial hashes compare uniformly. */
  def mix(x: Long): Long = {
    var h = x
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
    h ^= (h >>> 33)
    h
  }
}

/** `simhash(array<string>) -> long` as a native Catalyst expression with
  * whole-stage codegen (SURVEY.md engine layer: custom scalar where Spark
  * has no built-in; an Expression with doGenCode stays inside the codegen
  * span, unlike a Scala UDF which breaks it).
  */
case class SimHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash needs array<string>, got $other")
    }
  }
  override def nullSafeEval(input: Any): Any =
    HashKernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** `min_rolling_hash(string, k) -> long` — winnowing-style document
  * fingerprint as a codegen'd expression. `k` is a compile-time window. */
case class MinRollingHash(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashKernels.minRollingHash(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minRollingHash($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinRollingHash =
    copy(child = newChild)
}

/** Column-API entry points + SQL registration. Spark 4 routes Column↔
  * Expression through a private bridge; see graftshim.ColumnBridge. */
object GraftFunctions {
  import org.apache.spark.sql.graftshim.ColumnBridge

  def simhash(c: Column): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(c)))
  def min_rolling_hash(c: Column, k: Int): Column =
    ColumnBridge.column(MinRollingHash(ColumnBridge.expression(c), k))

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash", exprs => SimHash(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "min_rolling_hash",
      exprs => MinRollingHash(exprs.head, 8), "scala_udf")
  }
}
