package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}
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

/** Native fixed-point cosine / dot over two numeric arrays — the ANN and
  * embedding-dedup hot path (guide §4: higher-order functions like
  * `aggregate(zip_with(...))` are interpreted per ELEMENT with lambda
  * dispatch and boxing, never codegen'd; a custom expression runs one
  * tight JVM loop per row). Values are IDENTICAL to the Catalyst HOF
  * formulation `floor(10000 · Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²))`: the same
  * left-to-right double folds, the same null semantics (length mismatch
  * or a null element nulls the result, exactly as zip_with's padding /
  * null product did) — equivalence property-tested in ZhFunctionsSpec. */
object CosX10000Impl {
  def cos(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null // zip_with pads the shorter side with null
    var dot = 0.0d; var na = 0.0d; var nb = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null // null product nulls the fold
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Long.valueOf(
      math.floor(10000.0d * dot / (math.sqrt(na) * math.sqrt(nb))).toLong)
  }

  def fdot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }
}

/** shared shape of the two array-pair expressions: float/double element
  * introspection + nullable result plumbing for eval and codegen. */
trait ArrayPairExpression extends BinaryExpression {
  override def nullable: Boolean = true
  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"$prettyName expects array<float|double> arguments, got $t")
  }
  @transient protected lazy val leftFloat: Boolean = elemIsFloat(left)
  @transient protected lazy val rightFloat: Boolean = elemIsFloat(right)
}

case class CosX10000(left: Expression, right: Expression) extends ArrayPairExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "cos_x10000"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosX10000Impl.cos(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("cosr")
      s"""java.lang.Long $r = graft.functions.CosX10000Impl.cos($a, $b, $leftFloat, $rightFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosX10000 =
    copy(left = newLeft, right = newRight)
}

case class FDot(left: Expression, right: Expression) extends ArrayPairExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "fdot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosX10000Impl.fdot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotr")
      s"""java.lang.Double $r = graft.functions.CosX10000Impl.fdot($a, $b, $leftFloat, $rightFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): FDot =
    copy(left = newLeft, right = newRight)
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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cos_x10000", exprs => CosX10000(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fdot", exprs => FDot(exprs(0), exprs(1)), "built-in")
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
    ext.injectFunction((
      FunctionIdentifier("cos_x10000"),
      new ExpressionInfo(classOf[CosX10000].getName, "cos_x10000"),
      (exprs: Seq[Expression]) => CosX10000(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("fdot"),
      new ExpressionInfo(classOf[FDot].getName, "fdot"),
      (exprs: Seq[Expression]) => FDot(exprs(0), exprs(1))))
  }
}
