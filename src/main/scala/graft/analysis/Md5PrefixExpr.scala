package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `conv(substring(md5(c), 1, hexLen), 16, 10)` as ONE digest-to-long
  * step (r19, guide §4): the composed chain materializes the 32-char hex
  * string, substrings it, then string-parses the prefix back into a
  * number — per gram occurrence per sketch row. The first `hexLen` hex
  * characters of an md5 are exactly the first `hexLen` nibbles of the
  * digest, so the value is read directly from the digest bytes. Values
  * are IDENTICAL to the composed form (Md5PrefixSpec differential over
  * random unicode strings and both consumer widths), which is what keeps
  * the DuckDB oracles' `('0x' || substr(md5(x), 1, n))::BIGINT` replays
  * bit-exact. `hexLen` ≤ 15 keeps the value inside a positive Long
  * (60 bits) — the CMS grid uses 8, the HLL hash 15.
  */
final class Md5PrefixHolder(val hexLen: Int) extends Serializable {
  require(hexLen >= 1 && hexLen <= 15, s"hexLen out of [1,15]: $hexLen")

  def prefix(s: UTF8String): Long = {
    // JVM-shared per-thread digest (ADVICE r19: an instance-owned
    // ThreadLocal retained one MessageDigest per touched thread per plan
    // instantiation); digest() resets the instance, so no reset() call
    val d = Md5PrefixHolder.md5.get().digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < hexLen) {
      val b = d(i >> 1)
      val nib = if ((i & 1) == 0) (b >> 4) & 0xf else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

object Md5PrefixHolder {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

case class Md5PrefixExpr(child: Expression, holder: Md5PrefixHolder)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires string, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    holder.prefix(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("md5Prefix", holder,
      "graft.analysis.Md5PrefixHolder")
    defineCodeGen(ctx, ev, c => s"$h.prefix($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Md5Prefix {
  /** Column API: first `hexLen` hex chars of md5(c) as an unsigned long. */
  def apply(c: Column, hexLen: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      Md5PrefixExpr(org.apache.spark.sql.GraftBridge.expression(c),
        new Md5PrefixHolder(hexLen)))
}
