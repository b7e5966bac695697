package graft

import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** PortableHash has three faces — the Catalyst column expressions, the
  * JVM twin (typed mapPartitions paths), and the duck* SQL emitters the
  * oracle runs. The first two are asserted equal here on a battery of
  * adversarial strings (CJK, supplementary plane, empties, long); the
  * SQL face is covered end-to-end by the driver-oracle comparison
  * (tools/check_oracles.py, 33/37 green). */
class PortableHashSpec extends SparkSpecBase {
  import spark.implicits._

  private val battery: Seq[String] = {
    val rnd = (0 until 200).map { i =>
      var h = i.toLong * 2654435761L
      def next(n: Int) = { h = h * 6364136223846793005L + 1442695040888963407L; math.floorMod(h >> 16, n).toInt }
      // sample whole CODE POINTS (a lone surrogate is not a valid string
      // and cannot round-trip UTF-8)
      val pool: Vector[String] = "abcXYZ019中文字句。！·〇 \t".map(_.toString).toVector :+
        new String(Character.toChars(0x20000))
      (0 until next(40)).map(_ => pool(next(pool.length))).mkString
    }
    Seq("", "a", "中", "中文句子", "the quick brown fox", "𠀀𠀁",
        "x" * 1000, "。" * 17) ++ rnd
  }

  test("md5Long48: JVM twin equals the Catalyst expression on adversarial strings") {
    val df = battery.toDF("s")
    val got = df.select(col("s"), PortableHash.md5Long48(col("s")).as("h")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (s <- battery)
      assert(got(s) == PortableHash.md5Long48Jvm(s), s"md5Long48 drift on '${s.take(20)}'")
  }

  test("native md5_long48 expression equals the composed Catalyst form (and is codegen'd)") {
    val df = battery.toDF("s")
    val rows = df.select(
        PortableHash.md5Long48(col("s")).as("native"),
        PortableHash.md5Long48Composed(col("s")).as("composed"))
      .collect()
    for (r <- rows)
      assert(r.getLong(0) == r.getLong(1), s"native/composed drift: ${r.toSeq}")
    // stays inside whole-stage codegen (no CodegenFallback regression)
    val gen = df.select(PortableHash.md5Long48(col("s"))).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(gen.contains("WholeStageCodegen"), gen.take(400))
  }

  test("familyHashLong stays within 48 bits and families are distinct") {
    val df = battery.filter(_.nonEmpty).toDF("s")
    val cols = (0 until 8).map(i => PortableHash.familyHashLong(i, col("s")).as(s"h$i"))
    val rows = df.select(cols: _*).collect()
    for (r <- rows; i <- 0 until 8) {
      val h = r.getLong(i)
      assert(h >= 0 && h <= PortableHash.Mask48, s"h$i out of range: $h")
    }
    // different family members disagree on at least some inputs
    val disagreements = rows.count(r => r.getLong(0) != r.getLong(1))
    assert(disagreements > rows.length / 2)
  }

  test("affine multipliers are odd and bounded (exact-arithmetic contract)") {
    for (i <- 0 until 64) {
      val a = PortableHash.affineA(i)
      assert(a % 2 == 1 && a > 0 && a < 16384, s"affineA($i) = $a")
    }
  }

  test("planeSign matches the documented md5 first-nibble parity") {
    for (p <- 0 until 4; d <- 0 until 8) {
      val s = PortableHash.planeSign(p, d)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$p,$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expected = if ("13579bdf".contains(hex.head)) 1.0 else -1.0
      assert(s == expected, s"planeSign($p,$d)")
    }
  }
}
