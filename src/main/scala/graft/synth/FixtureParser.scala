package graft.synth

import graft.model.DepParse

/** Deterministic "dependency parser" for the synthetic corpus: recovers
  * the (parse, pos_tags) fixture for a sentence from its surface string
  * alone, by longest-match tokenization over the template vocabulary and
  * template-pattern matching.
  *
  * This is the engine's stand-in for DDParser/CoreNLP inference (which do
  * not exist in this sandbox): a pure function invoked per-partition, with
  * only static state — exactly the shape a real per-partition batched
  * model call would have (reference runs DDParser in-process per slice,
  * dudepparse.py:1851,1899, or skips it via --ready_ddp). Consistency with
  * Templates.generate is enforced by FixtureParserSpec over a large index
  * sweep.
  */
object FixtureParser {
  import Templates._

  private sealed trait Pat
  private final case class Lit(w: String) extends Pat
  private final case class Pool(words: Set[String]) extends Pat

  private val personsS = persons.toSet
  private val orgsS = orgs.toSet
  private val placesS = places.toSet
  private val nounsS = nouns.toSet
  private val verbsS = verbs.toSet
  private val advsS = advs.toSet
  private val prepsS = preps.toSet
  private val negsS = negs.toSet
  private val oddS = oddArgs.toSet

  /** one row per template: (pattern, heads, deprels, per-position tag). */
  private final case class Tmpl(pats: Vector[Pat], heads: Vector[Int],
                                deprels: Vector[String], tags: Vector[Option[String]])

  private def L(w: String) = Lit(w)
  private val templates: Vector[Tmpl] = Vector(
    Tmpl(Vector(Pool(personsS), Pool(advsS), L("地"), Pool(verbsS), Pool(placesS), L("。")),
         Vector(4, 4, 2, 0, 4, 4), Vector("SBV", "ADV", "MT", "HED", "VOB", "MT"),
         Vector(Some("NR"), Some("AD"), None, Some("VV"), Some("NN"), None)),
    Tmpl(Vector(Pool(placesS), L("与"), Pool(placesS), L("接壤"), L("。")),
         Vector(4, 4, 2, 0, 4), Vector("SBV", "ADV", "POB", "HED", "MT"),
         Vector(Some("NN"), None, Some("NN"), Some("VV"), None)),
    Tmpl(Vector(Pool(personsS), Pool(prepsS), Pool(nounsS), Pool(verbsS), L("了"), Pool(nounsS), L("。")),
         Vector(4, 4, 2, 0, 4, 4, 4), Vector("SBV", "ADV", "POB", "HED", "MT", "VOB", "MT"),
         Vector(Some("NR"), None, Some("NN"), Some("VV"), None, Some("NN"), None)),
    Tmpl(Vector(Pool(personsS), L("在"), Pool(placesS), L("玩"), L("。")),
         Vector(4, 3, 4, 0, 4), Vector("SBV", "MT", "ADV", "HED", "MT"),
         Vector(Some("NR"), None, Some("NN"), Some("VV"), None)),
    Tmpl(Vector(Pool(nounsS), L("成为"), Pool(nounsS), L("的"), Pool(nounsS), L("。")),
         Vector(2, 0, 5, 3, 2, 2), Vector("SBV", "HED", "ATT", "MT", "VOB", "MT"),
         Vector(Some("NN"), None, Some("NN"), None, Some("NN"), None)),
    Tmpl(Vector(Pool(personsS), L("成为"), Pool(verbsS), Pool(nounsS), L("的"), Pool(nounsS), L("。")),
         Vector(2, 0, 6, 3, 3, 2, 2), Vector("SBV", "HED", "ATT", "VOB", "MT", "VOB", "MT"),
         Vector(Some("NR"), None, Some("VV"), Some("NN"), None, Some("NN"), None)),
    Tmpl(Vector(Pool(orgsS), L("的"), Pool(nounsS), L("是"), Pool(personsS), L("。")),
         Vector(3, 1, 4, 0, 4, 4), Vector("ATT", "MT", "SBV", "HED", "VOB", "MT"),
         Vector(Some("NR"), None, Some("NN"), Some("VC"), Some("NR"), None)),
    Tmpl(Vector(Pool(nounsS), L("是"), L("从"), Pool(placesS), Pool(verbsS), L("的"), L("。")),
         Vector(2, 0, 4, 5, 6, 2, 2), Vector("SBV", "HED", "MT", "ADV", "ATT", "VOB", "MT"),
         Vector(Some("NN"), None, None, Some("NN"), Some("VV"), None, None)),
    Tmpl(Vector(Pool(nounsS), L("是"), Pool(nounsS), Pool(verbsS), L("的"), L("。")),
         Vector(2, 0, 4, 5, 2, 2), Vector("SBV", "HED", "ADV", "ATT", "VOB", "MT"),
         Vector(Some("NN"), None, Some("NN"), Some("VV"), None, None)),
    Tmpl(Vector(Pool(nounsS), L("是"), L("用"), Pool(nounsS), Pool(verbsS), L("的"), L("。")),
         Vector(2, 0, 5, 3, 6, 2, 2), Vector("SBV", "HED", "ADV", "POB", "ATT", "VOB", "MT"),
         Vector(Some("NN"), None, None, Some("NN"), Some("VV"), None, None)),
    Tmpl(Vector(Pool(nounsS), L("是"), Pool(personsS), Pool(verbsS), L("的"), L("。")),
         Vector(2, 0, 4, 5, 2, 2), Vector("SBV", "HED", "SBV", "ATT", "VOB", "MT"),
         Vector(Some("NN"), None, Some("NR"), Some("VV"), None, None)),
    Tmpl(Vector(Pool(placesS), Pool(nounsS), Pool(personsS), L("。")),
         Vector(2, 3, 0, 3), Vector("ATT", "ATT", "HED", "MT"),
         Vector(Some("NR"), Some("NN"), Some("NR"), None)),
    Tmpl(Vector(Pool(personsS), L("被"), L("控"), L("试图"), L("杀死"), Pool(personsS), L("。")),
         Vector(3, 3, 0, 3, 4, 5, 3), Vector("SBV", "POB", "HED", "VOB", "VOB", "VOB", "MT"),
         Vector(Some("NR"), None, Some("VV"), Some("VV"), Some("VV"), Some("NR"), None)),
    Tmpl(Vector(Pool(personsS), L("让"), Pool(personsS), Pool(verbsS), Pool(nounsS), L("。")),
         Vector(2, 0, 2, 2, 4, 2), Vector("SBV", "HED", "DBL", "DBL", "VOB", "MT"),
         Vector(Some("NR"), None, Some("NR"), Some("VV"), Some("NN"), None)),
    Tmpl(Vector(Pool(personsS), L("把"), Pool(nounsS), Pool(verbsS), L("了"), L("。")),
         Vector(4, 4, 2, 0, 4, 4), Vector("SBV", "POB", "VOB", "HED", "MT", "MT"),
         Vector(Some("NR"), None, Some("NN"), Some("VV"), None, None)),
    Tmpl(Vector(Pool(nounsS), L("被"), Pool(personsS), Pool(verbsS), L("了"), L("。")),
         Vector(4, 4, 2, 0, 4, 4), Vector("SBV", "POB", "VOB", "HED", "MT", "MT"),
         Vector(Some("NN"), None, Some("NR"), Some("VV"), None, None)),
    Tmpl(Vector(Pool(personsS ++ oddS), Pool(negsS), Pool(verbsS), Pool(personsS), L("。")),
         Vector(3, 3, 0, 3, 3), Vector("SBV", "ADV", "HED", "VOB", "MT"),
         Vector(Some("NR"), Some("AD"), Some("VV"), Some("NR"), None)),
    Tmpl(Vector(Pool(personsS), L("去"), Pool(placesS), Pool(verbsS), L("。")),
         Vector(2, 0, 2, 2, 2), Vector("SBV", "HED", "VOB", "VV", "MT"),
         Vector(Some("NR"), None, Some("NN"), Some("VV"), None)),
    Tmpl(Vector(Pool(personsS), L("奔跑"), L("、"), L("跳跃"), L("在"), Pool(placesS), L("。")),
         Vector(2, 0, 4, 2, 4, 5, 2), Vector("SBV", "HED", "MT", "COO", "ADV", "POB", "MT"),
         Vector(Some("NR"), Some("VV"), None, Some("VV"), None, Some("NN"), None)),
    Tmpl(Vector(Pool(personsS), Pool(verbsS), L("关于"), L("那次"), Pool(nounsS), L("的"), Pool(nounsS), L("。")),
         Vector(2, 0, 7, 5, 3, 3, 2, 2), Vector("SBV", "HED", "ATT", "ATT", "POB", "MT", "VOB", "MT"),
         Vector(Some("NR"), Some("VV"), None, None, Some("NN"), None, Some("NN"), None)),
    Tmpl(Vector(Pool(personsS), L("走"), L("到"), Pool(placesS), L("。")),
         Vector(2, 0, 2, 3, 2), Vector("SBV", "HED", "CMP", "VOB", "MT"),
         Vector(Some("NR"), Some("VV"), Some("VV"), Some("NN"), None)),
    Tmpl(Vector(Pool(orgsS), L("授予"), Pool(personsS), Pool(nounsS), L("。")),
         Vector(2, 0, 2, 2, 2), Vector("SBV", "HED", "DOB", "DOB", "MT"),
         Vector(Some("NR"), Some("VV"), Some("NR"), Some("NN"), None)))

  /** every known surface word (for longest-match tokenization). */
  private val vocab: Set[String] =
    personsS ++ orgsS ++ placesS ++ nounsS ++ verbsS ++ advsS ++ prepsS ++ negsS ++ oddS ++
      templates.flatMap(_.pats.collect { case Lit(w) => w })

  /** character trie over the vocabulary — longest-match walks allocate
    * nothing until a token is emitted (interned from the trie). */
  private final class TrieNode {
    var word: String = null
    var children: java.util.HashMap[Char, TrieNode] = null
    def child(c: Char): TrieNode = if (children == null) null else children.get(c)
    def addChild(c: Char): TrieNode = {
      if (children == null) children = new java.util.HashMap[Char, TrieNode](4)
      var n = children.get(c)
      if (n == null) { n = new TrieNode; children.put(c, n) }
      n
    }
  }
  private val trieRoot: TrieNode = {
    val root = new TrieNode
    for (w <- vocab) {
      var n = root
      for (c <- w) n = n.addChild(c)
      n.word = w
    }
    root
  }

  /** longest-match tokenization; None if any position fails to match. */
  def tokenize(sentence: String): Option[Vector[String]] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val len = sentence.length
    while (i < len) {
      var node = trieRoot
      var j = i
      var best: String = null
      while (node != null && j < len) {
        node = node.child(sentence.charAt(j))
        j += 1
        if (node != null && node.word != null) best = node.word
      }
      if (best == null) return None
      out += best
      i += best.length
    }
    Some(out.result())
  }

  /** analyze one sentence → (parse, posTags); None for unknown shapes. */
  def analyze(sentence: String): Option[(DepParse, Map[String, Seq[String]])] = {
    tokenize(sentence).flatMap { toks =>
      templates.find { t =>
        t.pats.length == toks.length && t.pats.indices.forall { i =>
          t.pats(i) match {
            case Lit(w) => toks(i) == w
            case Pool(ws) => ws.contains(toks(i))
          }
        }
      }.map { t =>
        val parse = DepParse(toks, t.heads, t.deprels)
        val tagPairs = toks.indices.flatMap(i => t.tags(i).map(tag => toks(i) -> Seq(tag)))
        (parse, Templates.posTagsFor(sentence, tagPairs))
      }
    }
  }
}
