package graft.synth

import graft.model.DepParse

/** Adversarial differential-test fixtures: deterministic pseudo-random
  * dependency trees (seeded xorshift, no wall clock) with the full
  * DDParser label set, construction-trigger words (把/被/是/的/…),
  * stopwords, digits and latin tokens mixed in. These exercise rule
  * interactions and degenerate paths (multiple roots, negative-index
  * fallbacks, COO chains, ATT/VOB cascades) that the curated templates
  * cannot reach. The fixtures are dumped to JSON and replayed through the
  * reference implementation — only this Scala side needs determinism.
  */
object RandomTrees {

  private val deprels = Vector("SBV", "VOB", "POB", "ADV", "CMP", "ATT", "COO",
                               "DBL", "DOB", "VV", "F", "IC", "MT", "HED")
  private val words = Vector(
    // construction triggers
    "把", "将", "被", "的", "是", "了", "地", "在", "与", "为", "从", "关于", "对", "不", "没有",
    "未能", "失败", "成为", "也是", "就是", "达",
    "能", "会", "要", "应该", "必须", "将要", "昨天", "明天", "曾经", "过",
    // regular content words
    "张三", "李四", "默克尔", "北京大学", "机场", "法国", "贡献", "报道", "原因", "力量",
    "设备", "总理", "校长", "赶往", "做出", "建设", "引进", "回答", "研究", "讨论",
    // filter bait
    "他", "他们", "这些", "之", "123", "3.14", "abc", "x1", "。", "，", "、")
  private val tagSets = Vector(
    Seq("NN"), Seq("NR"), Seq("VV"), Seq("AD"), Seq("FW"), Seq("NT"), Seq("PN"),
    Seq("JJ"), Seq("P"), Seq("NN", "VV"), Seq("NR", "NN"), Seq.empty)

  private final class Rng(seed0: Long) {
    private var s: Long = seed0 * 0x9e3779b97f4a7c15L + 0xbf58476d1ce4e5b9L
    def next(): Long = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s & Long.MaxValue
    }
    def nextInt(n: Int): Int = (next() % n).toInt
  }

  /** generate the i-th random fixture: (parse, posTags). */
  def generate(i: Long): Templates.Fixture = {
    val rng = new Rng(i + 1)
    val n = 2 + rng.nextInt(10)
    val ws = Vector.fill(n)(words(rng.nextInt(words.length)))
    // random acyclic tree: permute nodes, each node's parent is an
    // earlier node in the permutation; first is the root (head 0).
    val perm = new scala.util.Random(rng.next()).shuffle((0 until n).toVector)
    val heads = new Array[Int](n)
    val drels = new Array[String](n)
    heads(perm(0)) = 0
    drels(perm(0)) = if (rng.nextInt(4) == 0) deprels(rng.nextInt(deprels.length)) else "HED"
    for (pi <- 1 until n) {
      val node = perm(pi)
      val parent = perm(rng.nextInt(pi))
      heads(node) = parent + 1
      drels(node) = deprels(rng.nextInt(deprels.length))
    }
    // occasionally add a second root (reference tolerates via .index(0))
    if (n > 3 && rng.nextInt(10) == 0) {
      val extra = perm(n - 1)
      if (extra != perm(0)) { heads(extra) = 0; drels(extra) = "IC" }
    }
    val parse = DepParse(ws, heads.toVector, drels.toVector)
    val tags: Seq[(String, Seq[String])] =
      ws.distinct.flatMap { w =>
        val ts = tagSets(rng.nextInt(tagSets.length))
        if (ts.isEmpty) None else Some(w -> ts)
      }
    Templates.Fixture(s"r-$i", ws.mkString, parse, tags, -1)
  }
}
