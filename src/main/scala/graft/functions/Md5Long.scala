package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Digest-direct md5-prefix hashing: `md5PrefixLong(c, off, n)` returns
  * the BIGINT whose big-endian bytes are digest bytes `[off, off+n)` of
  * `md5(c)` — numerically identical to
  * `conv(substring(md5(c), 2*off+1, 2*n), 16, 10)` (hex chars are the
  * digest bytes two-per-byte), which is how the DuckDB oracle derives the
  * same value ([[PortableSql.hexToLong]]).
  *
  * Why not the built-in chain: `md5` → 32-char hex UTF8String allocation,
  * `substring` → another allocation, `conv` → radix string parse — per
  * ROW, and the md5 builtin fetches a fresh MessageDigest per call. On
  * the shingle pipelines this runs once per shingle occurrence (millions
  * of rows per GB); this expression reuses a thread-local digest, hashes
  * the raw bytes, and assembles the long with shifts — no intermediate
  * strings. Stays inside whole-stage codegen via [[Md5PrefixLong.doGenCode]].
  */
object Md5Long {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Last (input, digest) per thread: the minhash projection extracts TWO
    * halves of the same digest as two sibling expressions, which codegen
    * cannot common-subexpression (they share only the child). The memo
    * makes the second extraction a byte-compare instead of a re-digest.
    * Pure-function memoization — safe under any evaluation order.
    */
  private val lastDigest = new ThreadLocal[Array[Array[Byte]]] {
    override def initialValue(): Array[Array[Byte]] = new Array[Array[Byte]](2)
  }

  private def digest(bytes: Array[Byte]): Array[Byte] = {
    val memo = lastDigest.get()
    if (memo(0) != null && java.util.Arrays.equals(memo(0), bytes)) return memo(1)
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    // store a PRIVATE copy: callers may hand in reused/zero-copy buffers
    // (UTF8String.getBytes returns its backing array when exactly sized),
    // and a later mutation of a stored reference would make the memo
    // return a stale digest for matching NEW content. The copy costs far
    // less than the digest it saves on a hit.
    memo(0) = bytes.clone()
    memo(1) = dig
    dig
  }

  /** Long from md5-digest bytes [off, off+n) of `bytes`, big-endian. */
  def hashBytes(bytes: Array[Byte], off: Int, n: Int): Long = {
    val dig = digest(bytes)
    var v = 0L
    var i = off
    val end = off + n
    while (i < end) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v
  }

  /** Same over a UTF8String's UTF-8 bytes (== `md5(c.cast("binary"))` on
    * a string column).
    */
  def hashUtf8(s: UTF8String, off: Int, n: Int): Long =
    hashBytes(s.getBytes, off, n)

  /** Column builder. `off`/`nBytes` address md5-digest BYTES; the result
    * fits a signed long for nBytes <= 7.
    */
  def md5PrefixLong(c: Column, off: Int, nBytes: Int): Column =
    GraftSqlBridge.column(Md5PrefixLong(GraftSqlBridge.expression(c), off, nBytes))
}

/** `md5_prefix_long(child, off, nBytes)`: see [[Md5Long]]. Null-intolerant
  * unary expression over string or binary input.
  */
case class Md5PrefixLong(child: Expression, off: Int, nBytes: Int)
    extends UnaryExpression {

  require(off >= 0 && nBytes >= 1 && off + nBytes <= 16,
    s"md5 digest has 16 bytes; got off=$off nBytes=$nBytes")
  require(nBytes <= 7, s"nBytes=$nBytes would overflow a signed long (max 7)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix_long needs string or binary input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => Md5Long.hashUtf8(v.asInstanceOf[UTF8String], off, nBytes)
    case _ => Md5Long.hashBytes(v.asInstanceOf[Array[Byte]], off, nBytes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = child.dataType match {
      case StringType => "hashUtf8"
      case _ => "hashBytes"
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Long.$helper($c, $off, $nBytes);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}
