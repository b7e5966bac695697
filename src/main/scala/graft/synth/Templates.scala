package graft.synth

import graft.model.DepParse

/** Deterministic golden-sentence generator.
  *
  * Every sentence is an instantiation of a parse-tree template derived from
  * the reference's inline worked examples (the de-facto spec corpus —
  * /root/reference/dudepparse.py:459-1436 comments) with vocabulary slots
  * substituted by pure index arithmetic: NO RNG, so the Python oracle
  * harness and the Spark synthetic corpus generate byte-identical inputs
  * from the same index.
  *
  * The parse is fixture data by design: the reference itself consumes
  * precomputed parses in its `--ready_ddp 1` mode
  * (dudepparse.py:1891-1899), and no NLP model exists in this sandbox.
  * Invariant kept: concat(words) == sentence (asserted by the reference at
  * dudepparse.py:1901-1906).
  */
object Templates {

  final case class Fixture(
      id: String,
      sentence: String,
      parse: DepParse,
      tagsSpec: Seq[(String, Seq[String])],
      templateId: Int) {
    /** computed lazily — the throughput path (sentence generation) never
      * needs the tag map; consumers that do (oracle dump, specs) pay once. */
    lazy val posTags: Map[String, Seq[String]] = Templates.posTagsFor(sentence, tagsSpec)
  }

  // vocabulary pools (slot kind → tag set)
  private[graft] val persons = Vector("张三", "李四", "王五", "赵六", "孙七", "周八", "默克尔", "郝平", "吴教授", "陈医生")
  private[graft] val orgs = Vector("北京大学", "清华大学", "研究所", "委员会", "保险公司", "中央银行")
  private[graft] val places = Vector("机场", "图书馆", "巴黎", "法国", "美国", "德国", "车站", "医院", "广场", "学校")
  private[graft] val nouns = Vector("贡献", "报道", "原因", "力量", "问题", "奖章", "设备", "语言", "玉米", "苹果", "事故", "总理", "校长", "发热", "家园", "木头")
  private[graft] val verbs = Vector("赶往", "做出", "发出", "喜欢", "建设", "引进", "回答", "授予", "访问", "参观", "研究", "讨论", "宣布", "提供", "调查")
  private[graft] val advs = Vector("急匆匆", "认真", "悄悄", "迅速", "努力")
  private[graft] val preps = Vector("与", "为", "在", "从", "关于", "对", "通过", "随着")
  private[graft] val negs = Vector("不", "没有", "未能", "无法")
  // arguments that exercise the stopword / digit / latin filters,
  // including the reference's subj-retested-in-obj-branch quirk
  private[graft] val oddArgs = Vector("他", "123", "abc", "3.14", "这些")

  private final class Slots(k: Long) {
    private var h: Long = k
    def pick[T](pool: Vector[T]): T = {
      val v = pool((h % pool.size).toInt)
      h = h / pool.size
      v
    }
    def flag(mod: Int): Boolean = { val f = (h % mod) == 0; h = h / mod; f }
  }

  private def dp(words: Seq[String], heads: Seq[Int], deprels: Seq[String]): DepParse =
    DepParse(words.toIndexedSeq, heads.toIndexedSeq, deprels.toIndexedSeq)

  private val nTag = Seq("NN")
  private val rTag = Seq("NR")

  /** A fraction of sentences get degraded (non-nominal) tags to exercise
    * the POS-acceptability gates negatively. Derived from the SENTENCE
    * text (stable char-code hash), so the pipeline's deterministic tagger
    * can reproduce it without knowing the generation index. */
  def degraded(sentence: String): Boolean =
    sentence.map(_.toInt.toLong).sum % 7 == 0

  /** slot-kind tags with degrade applied; duplicate words merge tag lists
    * (the reference builds word→set-of-tags, main_ner.py:36-40).
    * Single-pass build — this runs once per sentence in the hot path. */
  def posTagsFor(sentence: String, tags: Seq[(String, Seq[String])]): Map[String, Seq[String]] = {
    val deg = degraded(sentence)
    var out = Map.empty[String, Seq[String]]
    val it = tags.iterator
    while (it.hasNext) {
      val (w, ts0) = it.next()
      val ts = if (deg) ts0.map(t => if (t == "NN" || t == "NR") "JJ" else t) else ts0
      out.get(w) match {
        case None => out = out.updated(w, ts)
        case Some(prev) =>
          val add = ts.filterNot(prev.contains)
          if (add.nonEmpty) out = out.updated(w, prev ++ add)
      }
    }
    out
  }

  /** Number of templates. */
  val templateCount = 22

  /** Generate the k-th fixture sentence. Index arithmetic only. */
  def generate(k: Long): Fixture = {
    val t = (k % templateCount).toInt
    val s = new Slots(k / templateCount)

    def fx(words: Seq[String], heads: Seq[Int], deprels: Seq[String],
           tags: Seq[(String, Seq[String])]): Fixture =
      Fixture(s"t$t-$k", words.mkString, dp(words, heads, deprels), tags, t)

    t match {
      case 0 => // g01: S ADV-MT V O (dudepparse.py:459-460 verbatim shape)
        val (p, a, v, o) = (s.pick(persons), s.pick(advs), s.pick(verbs), s.pick(places))
        fx(Seq(p, a, "地", v, o, "。"), Seq(4, 4, 2, 0, 4, 4),
           Seq("SBV", "ADV", "MT", "HED", "VOB", "MT"),
           Seq(p -> rTag, a -> Seq("AD"), v -> Seq("VV"), o -> nTag))
      case 1 => // g02: POB conjunction pivot (dudepparse.py:477)
        val (s1, n1) = (s.pick(places), s.pick(places))
        fx(Seq(s1, "与", n1, "接壤", "。"), Seq(4, 4, 2, 0, 4), Seq("SBV", "ADV", "POB", "HED", "MT"),
           Seq(s1 -> nTag, n1 -> nTag, "接壤" -> Seq("VV")))
      case 2 => // g03: POB class 2 (dudepparse.py:482-483)
        val (p, pr, n, v, o) = (s.pick(persons), s.pick(preps), s.pick(nouns), s.pick(verbs), s.pick(nouns))
        fx(Seq(p, pr, n, v, "了", o, "。"), Seq(4, 4, 2, 0, 4, 4, 4),
           Seq("SBV", "ADV", "POB", "HED", "MT", "VOB", "MT"),
           Seq(p -> rTag, n -> nTag, v -> Seq("VV"), o -> nTag))
      case 3 => // g04: MT-prep quirk (dudepparse.py:640-641)
        val (p, pl) = (s.pick(persons), s.pick(places))
        fx(Seq(p, "在", pl, "玩", "。"), Seq(4, 3, 4, 0, 4),
           Seq("SBV", "MT", "ADV", "HED", "MT"),
           Seq(p -> rTag, pl -> nTag, "玩" -> Seq("VV")))
      case 4 => // g07 ATT_OBJ (dudepparse.py:960-964)
        val (sub, n1, n2) = (s.pick(nouns), s.pick(nouns), s.pick(nouns))
        fx(Seq(sub, "成为", n1, "的", n2, "。"), Seq(2, 0, 5, 3, 2, 2),
           Seq("SBV", "HED", "ATT", "MT", "VOB", "MT"),
           Seq(sub -> nTag, n1 -> nTag, n2 -> nTag))
      case 5 => // g11 ATT_SUB (dudepparse.py:1337-1343)
        val (sub, v2, n1, n2) = (s.pick(persons), s.pick(verbs), s.pick(nouns), s.pick(nouns))
        fx(Seq(sub, "成为", v2, n1, "的", n2, "。"), Seq(2, 0, 6, 3, 3, 2, 2),
           Seq("SBV", "HED", "ATT", "VOB", "MT", "VOB", "MT"),
           Seq(sub -> rTag, v2 -> Seq("VV"), n1 -> nTag, n2 -> nTag))
      case 6 => // g09 COP_SBJ (dudepparse.py:1144-1145)
        val (o1, n2, p3) = (s.pick(orgs), s.pick(nouns), s.pick(persons))
        fx(Seq(o1, "的", n2, "是", p3, "。"), Seq(3, 1, 4, 0, 4, 4),
           Seq("ATT", "MT", "SBV", "HED", "VOB", "MT"),
           Seq(o1 -> rTag, n2 -> nTag, p3 -> rTag, "是" -> Seq("VC")))
      case 7 => // g10 COP_ADJ MT variant (dudepparse.py:1211)
        val (sub, pl, v) = (s.pick(nouns), s.pick(places), s.pick(verbs))
        fx(Seq(sub, "是", "从", pl, v, "的", "。"), Seq(2, 0, 4, 5, 6, 2, 2),
           Seq("SBV", "HED", "MT", "ADV", "ATT", "VOB", "MT"),
           Seq(sub -> nTag, pl -> nTag, v -> Seq("VV")))
      case 8 => // g10 COP_ADJ bare-ADV variant (dudepparse.py:1212)
        val (sub, m, v) = (s.pick(nouns), s.pick(nouns), s.pick(verbs))
        fx(Seq(sub, "是", m, v, "的", "。"), Seq(2, 0, 4, 5, 2, 2),
           Seq("SBV", "HED", "ADV", "ATT", "VOB", "MT"),
           Seq(sub -> nTag, m -> nTag, v -> Seq("VV")))
      case 9 => // g10 COP_ADJ ADV-POB variant (dudepparse.py:1213)
        val (sub, m, v) = (s.pick(nouns), s.pick(nouns), s.pick(verbs))
        fx(Seq(sub, "是", "用", m, v, "的", "。"), Seq(2, 0, 5, 3, 6, 2, 2),
           Seq("SBV", "HED", "ADV", "POB", "ATT", "VOB", "MT"),
           Seq(sub -> nTag, m -> nTag, v -> Seq("VV")))
      case 10 => // g10 COP_ADJ SBV variant (dudepparse.py:1214)
        val (sub, p, v) = (s.pick(nouns), s.pick(persons), s.pick(verbs))
        fx(Seq(sub, "是", p, v, "的", "。"), Seq(2, 0, 4, 5, 2, 2),
           Seq("SBV", "HED", "SBV", "ATT", "VOB", "MT"),
           Seq(sub -> nTag, p -> rTag, v -> Seq("VV")))
      case 11 => // g12 ATT_ATT (dudepparse.py:1398)
        val (n1, n2, p3) = (s.pick(places), s.pick(nouns), s.pick(persons))
        fx(Seq(n1, n2, p3, "。"), Seq(2, 3, 0, 3), Seq("ATT", "ATT", "HED", "MT"),
           Seq(n1 -> rTag, n2 -> nTag, p3 -> rTag))
      case 12 => // g13 VOB_VOB + bare-bei (dudepparse.py:1436)
        val (p, o) = (s.pick(persons), s.pick(persons))
        fx(Seq(p, "被", "控", "试图", "杀死", o, "。"), Seq(3, 3, 0, 3, 4, 5, 3),
           Seq("SBV", "POB", "HED", "VOB", "VOB", "VOB", "MT"),
           Seq(p -> rTag, o -> rTag, "控" -> Seq("VV"), "试图" -> Seq("VV"), "杀死" -> Seq("VV")))
      case 13 => // DBL pivotal construction (extract.py:277-304)
        val (p, p2, v, o) = (s.pick(persons), s.pick(persons), s.pick(verbs), s.pick(nouns))
        fx(Seq(p, "让", p2, v, o, "。"), Seq(2, 0, 2, 2, 4, 2),
           Seq("SBV", "HED", "DBL", "DBL", "VOB", "MT"),
           Seq(p -> rTag, p2 -> rTag, v -> Seq("VV"), o -> nTag))
      case 14 => // 把 disposal (extract.py:183-202)
        val (p, o, v) = (s.pick(persons), s.pick(nouns), s.pick(verbs))
        fx(Seq(p, "把", o, v, "了", "。"), Seq(4, 4, 2, 0, 4, 4),
           Seq("SBV", "POB", "VOB", "HED", "MT", "MT"),
           Seq(p -> rTag, o -> nTag, v -> Seq("VV")))
      case 15 => // 被 passive with agent (extract.py:219-226)
        val (o, p, v) = (s.pick(nouns), s.pick(persons), s.pick(verbs))
        fx(Seq(o, "被", p, v, "了", "。"), Seq(4, 4, 2, 0, 4, 4),
           Seq("SBV", "POB", "VOB", "HED", "MT", "MT"),
           Seq(o -> nTag, p -> rTag, v -> Seq("VV")))
      case 16 => // negation (dudepparse.py:1550-1594); odd arg pool
        val subPool = if (s.flag(3)) oddArgs else persons
        val (p, ng, v, o) = (s.pick(subPool), s.pick(negs), s.pick(verbs), s.pick(persons))
        fx(Seq(p, ng, v, o, "。"), Seq(3, 3, 0, 3, 3), Seq("SBV", "ADV", "HED", "VOB", "MT"),
           Seq(p -> rTag, ng -> Seq("AD"), v -> Seq("VV"), o -> rTag))
      case 17 => // serial-verb VV (extract.py:306-319)
        val (p, pl, v2) = (s.pick(persons), s.pick(places), s.pick(verbs))
        fx(Seq(p, "去", pl, v2, "。"), Seq(2, 0, 2, 2, 2), Seq("SBV", "HED", "VOB", "VV", "MT"),
           Seq(p -> rTag, pl -> nTag, v2 -> Seq("VV")))
      case 18 => // COO merge under HED + POB amendment (dudepparse.py:740)
        val (p, pl) = (s.pick(persons), s.pick(places))
        fx(Seq(p, "奔跑", "、", "跳跃", "在", pl, "。"), Seq(2, 0, 4, 2, 4, 5, 2),
           Seq("SBV", "HED", "MT", "COO", "ADV", "POB", "MT"),
           Seq(p -> rTag, pl -> nTag, "奔跑" -> Seq("VV"), "跳跃" -> Seq("VV")))
      case 19 => // g08 ATT_POB (dudepparse.py:1044)
        val (p, v, n, o) = (s.pick(persons), s.pick(verbs), s.pick(nouns), s.pick(nouns))
        fx(Seq(p, v, "关于", "那次", n, "的", o, "。"), Seq(2, 0, 7, 5, 3, 3, 2, 2),
           Seq("SBV", "HED", "ATT", "ATT", "POB", "MT", "VOB", "MT"),
           Seq(p -> rTag, v -> Seq("VV"), n -> nTag, o -> nTag))
      case 20 => // V_CMP fusion (dudepparse.py:858-913)
        val (p, pl) = (s.pick(persons), s.pick(places))
        fx(Seq(p, "走", "到", pl, "。"), Seq(2, 0, 2, 3, 2), Seq("SBV", "HED", "CMP", "VOB", "MT"),
           Seq(p -> rTag, pl -> nTag, "走" -> Seq("VV"), "到" -> Seq("VV")))
      case _ => // 21: double-object DOB (extract.py:359-384)
        val (o1, p, n) = (s.pick(orgs), s.pick(persons), s.pick(nouns))
        fx(Seq(o1, "授予", p, n, "。"), Seq(2, 0, 2, 2, 2), Seq("SBV", "HED", "DOB", "DOB", "MT"),
           Seq(o1 -> rTag, p -> rTag, n -> nTag, "授予" -> Seq("VV")))
    }
  }
}
