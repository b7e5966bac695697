package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Counts CJK characters (U+4E00..U+9FFF — the reference's Chinese-char
  * predicate range, dudepparse.py:255) directly over UTF-8 bytes: no
  * regex engine, no java.lang.String materialization, whole-stage
  * codegen'd. Replaces `length(regexp_replace(s, "[^一-鿿]", ""))` in hot
  * paths; semantics verified equal in ZhFunctionsSpec. */
object ZhCharCountImpl {
  /** U+4E00..U+9FFF are exactly the 3-byte UTF-8 sequences
    * E4 B8 80 .. E9 BF BF; count them with a byte walk. */
  def count(s: UTF8String): Int = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0
    var cnt = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xff
      if (b < 0x80) i += 1
      else if (b < 0xe0) i += 2
      else if (b < 0xf0) {
        if (i + 2 < n) {
          val b1 = org.apache.spark.unsafe.Platform.getByte(base, off + i + 1) & 0xff
          val cp = ((b & 0x0f) << 12) |
            ((b1 & 0x3f) << 6) |
            (org.apache.spark.unsafe.Platform.getByte(base, off + i + 2) & 0x3f)
          if (cp >= 0x4e00 && cp <= 0x9fff) cnt += 1
        }
        i += 3
      } else i += 4
    }
    cnt
  }
}

/** native PortableHash.md5Long48: MD5 digest → first 6 bytes as a long,
  * skipping the hex-string → substring → conv chain (3 string
  * materializations per hashed value) the composed form pays. The digest
  * instance is thread-cached. Identical values by construction: the
  * first 12 hex chars ARE the first 6 digest bytes. */
object Md5Long48Impl {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def hash(s: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }
}

case class Md5Long48(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "md5_long48"

  override protected def nullSafeEval(input: Any): Any =
    Md5Long48Impl.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long48Impl.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long48 =
    copy(child = newChild)
}

case class ZhCharCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "zh_char_count"

  override protected def nullSafeEval(input: Any): Any =
    ZhCharCountImpl.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZhCharCountImpl.count($c)")

  override protected def withNewChildInternal(newChild: Expression): ZhCharCount =
    copy(child = newChild)
}

object ZhFunctions {
  /** register the native expressions in a session's function registry
    * (idempotent); afterwards reachable via `call_function` and SQL. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zh_char_count", exprs => ZhCharCount(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_long48", exprs => Md5Long48(exprs.head), "built-in")
  }

  /** Column API: requires `register(spark)` once per session. */
  def zh_char_count(c: Column): Column =
    org.apache.spark.sql.functions.call_function("zh_char_count", c)
}

/** SparkSessionExtensions hook — the spark-submit-friendly registration
  * path: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`) makes
  * the engine's native functions available in EVERY session of the
  * application without code calling `ZhFunctions.register`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      FunctionIdentifier("zh_char_count"),
      new ExpressionInfo(classOf[ZhCharCount].getName, "zh_char_count"),
      (exprs: Seq[Expression]) => ZhCharCount(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("md5_long48"),
      new ExpressionInfo(classOf[Md5Long48].getName, "md5_long48"),
      (exprs: Seq[Expression]) => Md5Long48(exprs.head)))
  }
}
