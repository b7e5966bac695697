package graft.amend

import graft.model.{DepParse, Rel}
import graft.extract.{DepTree, Extractor}
import scala.collection.mutable
import scala.collection.mutable.ListBuffer

/** Amendment-rule engine: the 11 linguistic amendment rules plus negation
  * marking, filtering and coarsification.
  *
  * Semantics re-derived from the reference's `build_amendment_relations`
  * (/root/reference/dudepparse.py:404-1486) and the helpers around it.
  * Everything here is a pure per-sentence function (the reference loops
  * over sentences with no cross-sentence state), which is what lets the
  * Spark pipeline run it inside one typed flatMap with zero shuffles.
  *
  * Observable quirks of the reference that are deliberately replicated
  * (they change output and are therefore part of the spec, SURVEY.md §2.8):
  *  - the stopword filter re-tests the SUBJECT's Chinese-ness in the object
  *    branch (dudepparse.py:310);
  *  - the fine MT rule's ADV_V-match flag is written to the wrong variable
  *    (dudepparse.py:663) so the "discard when not found" path never fires
  *    (its gate flag is False anyway) — we therefore compute no flag;
  *  - COP_SBJ's `'·X·' in f_rel_1` guard tests the tuple, not the predicate
  *    (dudepparse.py:1168), i.e. it is always false — no guard here;
  *  - the working set grows without pruning (merge_orig_amend =
  *    merge_orig_amend_noprune, dudepparse.py:400) while the FINAL fine /
  *    coarse lists do prune residues (dudepparse.py:1474-1484);
  *  - predicate chunking uses Python `str.split('·')` which keeps empty
  *    chunks, and `'' in s` is always true — an empty chunk therefore
  *    always reverts a coarsified argument (dudepparse.py:1675-1699).
  *
  * Deviation (pinned nondeterminism): the reference samples relation lists
  * down with `random.sample` above 2000/3000 thresholds
  * (dudepparse.py:16-38, :215-231); we truncate deterministically to the
  * first k. The thresholds are combinatorial-blowup guards that never
  * trigger on sane sentences.
  */
object Amender {

  val pivotAdvList: Set[String] = Set(
    "与", "和", "跟", "同", // conjunction
    "在", "于", "自", "自从", "从", "当", "由", "趁", "趁着", "随着", "到", // time
    "按照", "通过", "按", "比", "拿", "以", "凭", "凭借", // method
    "为", "为了", "由于", "因为", // reason
    "对", "对于", "关于", "除了", "除", "让", "给", "使得", "使",
    "朝", "向", "沿", "沿着", "顺", "顺着") // for POB

  val copPredSet: Set[String] = Set(
    "是", "也是", "就是", "而是", "正是", "才是", "都是", "仍是", "既是", "又是", "却是", "只是",
    "算是", "竟是", "便是", "无疑是", "乃是", "并且是", "达", "高达")

  val acceptablePostagList: Set[String] = Set("FW", "NN", "NR", "NT", "PN", "VV")
  val nounPostagList: Set[String] = Set("FW", "NN", "NR", "NT", "PN")
  val modifNounList: Set[String] = Set("FW", "NN", "NR")
  val punctuationList: Set[String] = Set(
    "。", "？", "！", "，", "、", "；", "：", "\"", "（", "）", "《", "》", "【", "】", "……",
    "“", "”", "「", "」", "～")

  val stopWordList: Set[String] = Set(
    "有", "没有", "还有", "还", "是", "你", "我", "他", "她", "它", "他们", "她们", "它们", "带",
    "的", "任", "这", "那", "这些", "那些", "哪", "哪些", "这个", "那个", "这里", "那里", "里",
    "可能", "之", "个", "能", "内", "外", "等", "下", "上")

  val negAdvList: Set[String] = Set("不", "未能", "不会", "不能", "没有", "无法", "难以")
  val negCmpList: Set[String] = Set("失败")
  /** check_nct's copular set lacks 达/高达 (dudepparse.py:1556-1557) —
    * unused because CONVERT_COPULAR is False, kept for documentation. */

  /** True iff the string contains no Chinese character; None/empty → false
    * (dudepparse.py:252-260, re.search('[一-鿿]')). Direct char
    * scan — the reference's regex has no feature beyond the range, and a
    * Matcher allocation per call was the filter's hot spot. */
  def noChineseChar(s: String): Boolean = {
    if (s == null || s.isEmpty) return false
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch >= '一' && ch <= '鿿') return false
      i += 1
    }
    true
  }

  private def allDigits(s: String): Boolean =
    s != null && s.nonEmpty && s.forall(c => (c >= '0' && c <= '9') || c == '.')

  /** word has ≥1 acceptable tag in this sentence (dudepparse.py:177-186). */
  def examinePostags(word: String, posTags: Option[Map[String, Seq[String]]],
                     acceptable: Set[String]): Boolean =
    posTags.exists(_.get(word).exists(_.exists(acceptable.contains)))

  /** does any dependency child of `headIdx` read 被 (dudepparse.py:88-93). */
  private def beiInChildren(r: DepParse, headIdx: Int): Boolean = {
    val headFrom1 = headIdx + 1
    r.heads.indices.exists(i => r.heads(i) == headFrom1 && r.words(i) == "被")
  }

  /** is `ante` on the head path from `desc` to root, inclusive of desc
    * (dudepparse.py:1538-1547). */
  def traceAntecedent(descIdx: Int, anteIdx: Int, r: DepParse): Boolean = {
    val anteFrom1 = anteIdx + 1
    var childIdx = descIdx
    var parentFrom1 = descIdx + 1
    while (parentFrom1 != 0) {
      if (anteFrom1 == parentFrom1) return true
      parentFrom1 = r.heads(childIdx)
      childIdx = parentFrom1 - 1
    }
    false
  }

  /** Python-style negative-index word access. */
  private def pyWord(r: DepParse, i: Int): String = if (i < 0) r.words(r.length + i) else r.words(i)
  private def pyDeprel(r: DepParse, i: Int): String = if (i < 0) r.deprels(r.length + i) else r.deprels(i)
  private def pyHead(r: DepParse, i: Int): Int = if (i < 0) r.heads(r.length + i) else r.heads(i)

  /** Predicate chunking with Python str.split semantics (keeps empty
    * chunks; see quirk note in the class doc). */
  private def predChunks(pred: String): Array[String] = pred.split("·", -1)

  /** filter to one tag with a deterministic cap (reference
    * filter_rel_list, dudepparse.py:16-38; cap pinned deterministic =
    * first-k matches). Hot path: called several times per rule per
    * sentence — a direct indexed scan, no zipWithIndex/collect wrappers
    * (those were the top allocation sites in profiles). */
  def filterRelList(rels: scala.collection.IndexedSeq[Rel], tag: String,
                    threshold: Int = 2000): scala.collection.IndexedSeq[(Int, Rel)] = {
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Rel)](8)
    var i = 0
    val n = rels.length
    while (i < n && out.length < threshold) {
      val r = rels(i)
      if (r.tag == tag) out += ((i, r))
      i += 1
    }
    out
  }

  /** unboxed Option[Int] equality — `opt.contains(v)` dispatches through
    * BoxesRunTime.equalsNumObject per call (a measured hot frame). */
  @inline def ieq(opt: Option[Int], v: Int): Boolean =
    opt.isDefined && opt.get == v

  final case class AmendResult(
      amendFine: Vector[Rel],
      amendCoarse: Vector[Rel],
      prunedFine: Vector[Rel],
      prunedCoarse: Vector[Rel],
      possibleFine: Vector[Rel],
      vcmpCounts: Map[String, Int],
      amendCounts: Map[String, Int])

  /** Run all amendment rules over one sentence (reference
    * build_amendment_relations inner loop, dudepparse.py:458-1484).
    * `f`/`c` are the reformatted + nary-translated + token-normalized fine
    * and coarse relations; discard-residue semantics are fixed to the
    * reference's live configuration (discard_residue=True, progressive). */
  def amendSentence(r: DepParse, f: Vector[Rel], c: Vector[Rel],
                    posTags: Option[Map[String, Seq[String]]],
                    ignorePostag: Boolean = false): AmendResult = {
    val aF = new scala.collection.mutable.ArrayBuffer[Rel](8)
    val aC = new scala.collection.mutable.ArrayBuffer[Rel](8)
    val possibleF = ListBuffer.empty[Rel]
    val fResidue = mutable.Set.empty[Int]
    val cResidue = mutable.Set.empty[Int]
    val vcmp = mutable.Map.empty[String, Int].withDefaultValue(0)
    val counts = mutable.Map.empty[String, Int].withDefaultValue(0)
    val posGate = posTags.isDefined || ignorePostag

    // working sets j_f/j_c = originals + all amendments so far. Grown
    // incrementally instead of re-concatenated per rule: rules append to
    // aF/aC only, so the buffers are stable snapshots inside each rule
    // block and are synced between blocks (the reference's progressive
    // merge points, dudepparse.py:636-637 etc.).
    val jfBuf = new scala.collection.mutable.ArrayBuffer[Rel](f.length + 8)
    val jcBuf = new scala.collection.mutable.ArrayBuffer[Rel](c.length + 8)
    jfBuf ++= f; jcBuf ++= c
    var jfSynced = 0
    var jcSynced = 0
    def jF: scala.collection.IndexedSeq[Rel] = {
      while (jfSynced < aF.length) { jfBuf += aF(jfSynced); jfSynced += 1 }
      jfBuf
    }
    def jC: scala.collection.IndexedSeq[Rel] = {
      while (jcSynced < aC.length) { jcBuf += aC(jcSynced); jcSynced += 1 }
      jcBuf
    }

    // ---- POB (dudepparse.py:486-634) --------------------------------
    locally {
      val jf = jF; val jc = jC
      for (lblIdx <- r.deprels.indices if r.deprels(lblIdx) == "POB") {
        val objToken = r.words(lblIdx)
        val advIdx = r.heads(lblIdx) - 1
        val advToken = pyWord(r, advIdx)
        val objTokenIsNominal = ignorePostag || examinePostags(objToken, posTags, acceptablePostagList)
        if (pivotAdvList.contains(advToken) &&
            advIdx >= 0 && (r.deprels(advIdx) == "ADV" || r.deprels(advIdx) == "CMP")) {
          val verbIdx = r.heads(advIdx) - 1
          if (verbIdx >= 0) {
            // fine
            jf.zipWithIndex.foreach { case (fRel, fRelIdx) =>
              if (fRel.tag == "SVO") {
                if (ieq(fRel.idxs(1), verbIdx) && fRel.names(2).isEmpty) {
                  val nw = Rel(Vector(fRel.names(0), Some(advToken + "·X·" + fRel.pred), Some(objToken)),
                               fRel.tag, Vector(fRel.idxs(0), fRel.idxs(1), Some(lblIdx)))
                  aF += nw; fResidue += fRelIdx; counts("pob") += 1
                } else if (ieq(fRel.idxs(1), verbIdx) && objTokenIsNominal) {
                  val nw1 = Rel(Vector(fRel.names(0),
                                       Some(advToken + "·X·" + fRel.pred + "·" + fRel.names(2).getOrElse("None")),
                                       Some(objToken)),
                                fRel.tag, Vector(fRel.idxs(0), fRel.idxs(1), Some(lblIdx)))
                  val nw2 = Rel(Vector(fRel.names(0), Some(advToken + "·X·" + fRel.pred), Some(objToken)),
                                fRel.tag, Vector(fRel.idxs(0), fRel.idxs(1), Some(lblIdx)))
                  aF += nw1; aF += nw2; counts("pob") += 2
                }
              }
            }
            // coarse
            jc.zipWithIndex.foreach { case (cRel, cRelIdx) =>
              if (cRel.tag == "SVO") {
                if (ieq(cRel.idxs(1), verbIdx) && cRel.names(2).isEmpty) {
                  val coarseObj = jc.reverseIterator.collectFirst {
                    case ref if ref.tag == "ADV_V" && ref.names(1).contains(r.words(verbIdx)) &&
                      ref.names(0).exists(_.contains(objToken)) => ref.names(0).get
                  }.getOrElse(objToken)
                  if (!cRel.pred.contains(advToken)) { // subsumed in coarse pred → skip
                    val nw = Rel(Vector(cRel.names(0), Some(advToken + "·X·" + cRel.pred), Some(coarseObj)),
                                 cRel.tag, Vector(cRel.idxs(0), cRel.idxs(1), Some(lblIdx)))
                    aC += nw; cResidue += cRelIdx; counts("pob") += 1
                  }
                } else if (ieq(cRel.idxs(1), verbIdx) && objTokenIsNominal) {
                  val coarseObj = jc.reverseIterator.collectFirst {
                    case ref if ref.tag == "ADV_V" && ref.names(1).contains(r.words(verbIdx)) &&
                      ref.names(0).exists(_.contains(objToken)) => ref.names(0).get
                  }.getOrElse(objToken)
                  val nw1 = Rel(Vector(cRel.names(0),
                                       Some(advToken + "·X·" + cRel.pred + "·" + cRel.names(2).getOrElse("None")),
                                       Some(coarseObj)),
                                cRel.tag, Vector(cRel.idxs(0), cRel.idxs(1), Some(lblIdx)))
                  val nw2 = Rel(Vector(cRel.names(0), Some(advToken + "·X·" + cRel.pred), Some(coarseObj)),
                                cRel.tag, Vector(cRel.idxs(0), cRel.idxs(1), Some(lblIdx)))
                  aC += nw1; aC += nw2; counts("pob") += 2
                }
              }
            }
          }
        }
      }
    }

    // ---- MT (prep-as-MT DDParser quirk, dudepparse.py:643-729) -------
    locally {
      val jf = jF; val jc = jC
      for (lblIdx <- r.deprels.indices) {
        val prepToken = r.words(lblIdx)
        if (r.deprels(lblIdx) == "MT" && pivotAdvList.contains(prepToken)) {
          val lblHeadFrom0 = r.heads(lblIdx) - 1
          val lblHeadToken = pyWord(r, lblHeadFrom0)
          val lblGrandparentFrom0 = pyHead(r, lblHeadFrom0) - 1
          val lblGrandparentToken = pyWord(r, lblGrandparentFrom0)

          jf.foreach { fRel =>
            if (fRel.tag == "SVO" && ieq(fRel.idxs(1), lblGrandparentFrom0)) {
              if (!fRel.pred.contains("·X·")) {
                val nw = Rel(Vector(fRel.names(0), Some(prepToken + "·X·" + fRel.pred), Some(lblHeadToken)),
                             fRel.tag, Vector(fRel.idxs(0), fRel.idxs(1), Some(lblHeadFrom0)))
                aF += nw
                if (fRel.names(2).nonEmpty && !ieq(fRel.idxs(2), lblHeadFrom0)) {
                  aF += Rel(Vector(fRel.names(0),
                                   Some(prepToken + "·X·" + fRel.pred + "·" + fRel.names(2).get),
                                   Some(lblHeadToken)),
                            fRel.tag, Vector(fRel.idxs(0), fRel.idxs(1), Some(lblHeadFrom0)))
                }
                counts("mt") += 1
                // Prep_nary: keep the prep-object pair as a separate relation
                aF += Rel(Vector(Some(lblHeadToken), Some(prepToken + "·X·" + fRel.pred + "·【介宾】"), fRel.names(2)),
                          fRel.tag, Vector(Some(lblHeadFrom0), fRel.idxs(1), fRel.idxs(2)))
                counts("mt") += 1
              }
            }
          }
          jc.foreach { cRel =>
            if (cRel.tag == "SVO" && ieq(cRel.idxs(1), lblGrandparentFrom0)) {
              val coarseObj = jc.reverseIterator.collectFirst {
                case ref if ref.tag == "ADV_V" && ref.names(1).contains(lblGrandparentToken) &&
                  ref.names(0).exists(_.contains(lblHeadToken)) => ref.names(0).get
              }.getOrElse(lblHeadToken)
              if (!cRel.pred.contains("·X·")) {
                aC += Rel(Vector(cRel.names(0), Some(prepToken + "·X·" + cRel.pred), Some(coarseObj)),
                          cRel.tag, Vector(cRel.idxs(0), cRel.idxs(1), Some(lblHeadFrom0)))
                counts("mt") += 1
                aC += Rel(Vector(Some(coarseObj), Some(prepToken + "·X·" + cRel.pred + "·【介宾】"), cRel.names(2)),
                          cRel.tag, Vector(Some(lblHeadFrom0), cRel.idxs(1), cRel.idxs(2)))
                counts("mt") += 1
              }
            }
          }
        }
      }
    }

    // ---- VV / COO merge (dudepparse.py:741-856) ----------------------
    locally {
      val jf = jF; val jc = jC
      val jfSvos = filterRelList(jf, "SVO")
      val jcSvos = filterRelList(jc, "SVO")

      def eligible(rel: Rel): Boolean = {
        val predIdx = rel.idxs(1).get
        val dep = pyDeprel(r, predIdx)
        if (dep != "VV" && dep != "COO") false
        else if (dep == "COO") {
          val hedVb = pyHead(r, predIdx) - 1
          val d = pyDeprel(r, hedVb)
          d == "HED" || d == "IC"
        } else true
      }

      def resolvePred(p1: String, p2: String, coarsePick: Boolean): String =
        if (p1 == p2) (if (coarsePick) p2 else p1)
        else if (p1.contains("·")) p1
        else if (p2.contains("·")) p2
        else p2

      for ((idx1, rel1) <- jfSvos if eligible(rel1); (idx2, rel2) <- jfSvos if idx1 != idx2) {
        val beiInPredChildren = beiInChildren(r, rel2.idxs(1).get)
        if (rel1.idxs(1) == rel2.idxs(1)) {
          val predName = resolvePred(rel1.pred, rel2.pred, coarsePick = false)
          if (rel2.names(0).isEmpty && rel1.names(0).nonEmpty) {
            aF += Rel(Vector(rel1.names(0), Some(predName), rel2.names(2)), "SVO",
                      Vector(rel1.idxs(0), rel1.idxs(1), rel2.idxs(2)))
            fResidue += idx2; counts("vv") += 1
          } else if (rel2.names(2).isEmpty && beiInPredChildren) {
            aF += Rel(Vector(rel2.names(0), Some(predName), rel1.names(0)), "SVO",
                      Vector(rel2.idxs(0), rel1.idxs(1), rel1.idxs(0)))
            fResidue += idx2; counts("vv") += 1
          }
        }
      }
      for ((idx1, rel1) <- jcSvos if eligible(rel1); (idx2, rel2) <- jcSvos if idx1 != idx2) {
        val beiInPredChildren = beiInChildren(r, rel2.idxs(1).get)
        if (rel1.idxs(1) == rel2.idxs(1)) {
          val predName = resolvePred(rel1.pred, rel2.pred, coarsePick = true)
          if (rel2.names(0).isEmpty && rel1.names(0).nonEmpty) {
            aC += Rel(Vector(rel1.names(0), Some(predName), rel2.names(2)), "SVO",
                      Vector(rel1.idxs(0), rel1.idxs(1), rel2.idxs(2)))
            cResidue += idx2; counts("vv") += 1
          } else if (rel2.names(2).isEmpty && beiInPredChildren) {
            aC += Rel(Vector(rel2.names(0), Some(predName), rel1.names(0)), "SVO",
                      Vector(rel2.idxs(0), rel1.idxs(1), rel1.idxs(0)))
            cResidue += idx2; counts("vv") += 1
          }
        }
      }
    }

    // ---- V_CMP fusion (dudepparse.py:867-958) ------------------------
    locally {
      val jf = jF; val jc = jC
      val jfSvos = filterRelList(jf, "SVO")
      val jcSvos = filterRelList(jc, "SVO")
      val jfVcmps = filterRelList(jf, "V_CMP")
      val jcVcmps = filterRelList(jc, "V_CMP")

      for ((idx1, rel1) <- jfSvos if rel1.names(0).isEmpty) {
        // first matching V_CMP only (reference breaks after it)
        jfVcmps.find { case (_, rel2) =>
          rel2.names(1) == rel1.names(1) && rel2.idxs(1) == rel1.idxs(1)
        }.foreach { case (_, rel2) =>
          val complementToken = rel2.names(1).getOrElse("")
          for ((idx3, rel3) <- jfSvos
               if rel3.idxs(1) == rel2.idxs(0) && rel3.names(2).isEmpty) {
            aF += Rel(Vector(rel3.names(0), Some(rel2.names(0).getOrElse("") + "·" + rel2.names(1).getOrElse("")), rel1.names(2)),
                      "SVO", Vector(rel3.idxs(0), rel2.idxs(0), rel1.idxs(2)))
            fResidue += idx1; fResidue += idx3; counts("vcmp") += 1
            vcmp(complementToken) += 1
          }
        }
      }
      for ((idx1, rel1) <- jcSvos if rel1.names(0).isEmpty) {
        jcVcmps.find { case (_, rel2) => rel2.idxs(1) == rel1.idxs(1) }.foreach { case (_, rel2) =>
          val complementToken = rel2.names(1).getOrElse("")
          for ((idx3, rel3) <- jcSvos
               if rel3.idxs(1) == rel2.idxs(0) && rel3.names(2).isEmpty) {
            aC += Rel(Vector(rel3.names(0), Some(rel2.names(0).getOrElse("") + "·" + rel2.names(1).getOrElse("")), rel1.names(2)),
                      "SVO", Vector(rel3.idxs(0), rel2.idxs(0), rel1.idxs(2)))
            cResidue += idx1; cResidue += idx3; counts("vcmp") += 1
            vcmp(complementToken) += 1
          }
        }
      }
    }

    // ---- ATT_OBJ (dudepparse.py:966-1038) ----------------------------
    if (posGate) {
      val jf = jF; val jc = jC
      val jfAttns = filterRelList(jf, "ATT_N")
      val jcAttns = filterRelList(jc, "ATT_N")

      for (rel1 <- jf if rel1.tag == "SVO"; (_, rel2) <- jfAttns) {
        val attWord = rel2.names(0).getOrElse("")
        val attHead = rel2.names(1).getOrElse("")
        if (attHead != "的") {
          val attIsNominal = ignorePostag || examinePostags(attWord, posTags, acceptablePostagList)
          if (rel1.idxs(2).nonEmpty && rel1.idxs(2) == rel2.idxs(1) && attIsNominal) {
            val newPred =
              if (rel1.pred.contains("·X·")) rel1.pred.replace("·X·", s"·X·的·${rel2.names(1).getOrElse("")}·")
              else rel1.pred + "·X·的·" + rel2.names(1).getOrElse("")
            aF += Rel(Vector(rel1.names(0), Some(newPred), rel2.names(0)), rel1.tag,
                      Vector(rel1.idxs(0), rel1.idxs(1), rel2.idxs(0)))
            counts("attobj") += 1
          }
        }
      }
      for (rel1 <- jc if rel1.tag == "SVO"; (_, rel2) <- jcAttns) {
        if (!rel2.names(0).contains("不")) {
          val attWord = rel2.names(0).getOrElse("")
          val attHead = rel2.names(1).getOrElse("")
          if (attHead != "的") {
            val attIsNominal = ignorePostag || examinePostags(attWord, posTags, acceptablePostagList)
            if (rel1.names(2).nonEmpty && rel1.names(2) == rel2.names(1) && attIsNominal) {
              val newPred =
                if (rel1.pred.contains("·X·")) rel1.pred.replace("·X·", s"·X·的·${rel2.names(1).getOrElse("")}")
                else rel1.pred + "·X·的·" + rel2.names(1).getOrElse("")
              val nw = Rel(Vector(rel1.names(0), Some(newPred), rel2.names(0)), rel1.tag,
                           Vector(rel1.idxs(0), rel1.idxs(1), rel2.idxs(0)))
              // drop if the new object is contained in the predicate
              if (!nw.names(2).exists(o => nw.pred.contains(o))) {
                aC += nw; counts("attobj") += 1
              }
            }
          }
        }
      }
    }

    // ---- ATT_POB (dudepparse.py:1045-1138) ---------------------------
    if (posGate) {
      val jf = jF; val jc = jC
      val jfSvos = filterRelList(jf, "SVO")
      val jcSvos = filterRelList(jc, "SVO")
      val jfAttns = filterRelList(jf, "ATT_N")
      val jcAttns = filterRelList(jc, "ATT_N")

      for ((_, rel1) <- jfSvos; (_, rel2) <- jfAttns) {
        if (rel1.idxs(2).nonEmpty && rel1.idxs(2) == rel2.idxs(1)) {
          var attWord = rel2.names(0).getOrElse("")
          val attIdxFrom1 = rel2.idxs(0).get + 1
          if (r.words.indices.exists(i => r.deprels(i) == "POB" && r.heads(i) == attIdxFrom1 && r.words(i) == "被"))
            attWord = "被" + attWord
          for (tokIdx <- r.words.indices
               if r.deprels(tokIdx) == "POB" && r.heads(tokIdx) == attIdxFrom1 && r.words(tokIdx) != "被") {
            val objToken = r.words(tokIdx)
            val oldObj = rel1.names(2).getOrElse("None")
            val newPred =
              if (rel1.pred.contains("·X·")) rel1.pred.replace("·X·", "·" + attWord + "·X·的·" + oldObj + "·")
              else rel1.pred + "·" + attWord + "·X·的·" + oldObj
            aF += Rel(Vector(rel1.names(0), Some(newPred), Some(objToken)), rel1.tag,
                      Vector(rel1.idxs(0), rel1.idxs(1), Some(tokIdx)))
            counts("attpob") += 1
          }
        }
      }
      for ((_, rel1) <- jcSvos; (_, rel2) <- jcAttns) {
        if (rel1.idxs(2).nonEmpty && rel1.idxs(2) == rel2.idxs(1)) {
          val attWord = rel2.names(0).getOrElse("")
          val attIdxFrom1 = rel2.idxs(0).get + 1
          for (tokIdx <- r.words.indices
               if r.deprels(tokIdx) == "POB" && r.heads(tokIdx) == attIdxFrom1 && r.words(tokIdx) != "被") {
            val objToken = r.words(tokIdx)
            val oldObj = rel1.names(2).getOrElse("None")
            val newPred =
              if (rel1.pred.contains("·X·")) rel1.pred.replace("·X·", "·" + attWord + "·X·的·" + oldObj + "·")
              else rel1.pred + "·" + attWord + "·X·的·" + oldObj
            val nw = Rel(Vector(rel1.names(0), Some(newPred), Some(objToken)), rel1.tag,
                         Vector(rel1.idxs(0), rel1.idxs(1), Some(tokIdx)))
            if (!nw.pred.contains(objToken)) {
              aC += nw; counts("attpob") += 1
            }
          }
        }
      }
    }

    // ---- COP_SBJ (dudepparse.py:1146-1205) ---------------------------
    if (posGate) {
      val jf = jF; val jc = jC
      val jfAttns = filterRelList(jf, "ATT_N")
      val jcAttns = filterRelList(jc, "ATT_N")

      for (rel1 <- jf if rel1.tag == "SVO" && copPredSet.contains(pyWord(r, rel1.idxs(1).get));
           (_, rel2) <- jfAttns) {
        val attWord = rel2.names(0).getOrElse("")
        val attIsNominal = ignorePostag || examinePostags(attWord, posTags, nounPostagList)
        if (rel1.idxs(0).nonEmpty && rel1.idxs(0) == rel2.idxs(1) && attIsNominal) {
          aF += Rel(Vector(rel2.names(0), Some(rel1.names(0).getOrElse("") + "·" + rel1.pred), rel1.names(2)),
                    rel1.tag, Vector(rel2.idxs(0), rel1.idxs(1), rel1.idxs(2)))
          counts("copsbj") += 1
        }
      }
      for (rel1 <- jc if rel1.tag == "SVO" && copPredSet.contains(pyWord(r, rel1.idxs(1).get));
           (_, rel2) <- jcAttns) {
        val attWord = rel2.names(0).getOrElse("")
        val attIsNominal = ignorePostag || examinePostags(attWord, posTags, nounPostagList)
        if (rel1.idxs(0).nonEmpty && rel1.idxs(0) == rel2.idxs(1) && attIsNominal &&
            rel1.names(0).contains(pyWord(r, rel1.idxs(0).get))) {
          aC += Rel(Vector(rel2.names(0), Some(rel1.names(0).getOrElse("") + "·" + rel1.pred), rel1.names(2)),
                    rel1.tag, Vector(rel2.idxs(0), rel1.idxs(1), rel1.idxs(2)))
          counts("copsbj") += 1
        }
      }
    }

    // ---- COP_ADJ (是…的 clefts, fine only; dudepparse.py:1215-1331) ----
    locally {
      val jf = jF
      jf.zipWithIndex.foreach { case (fRel, fRelIdx) =>
        if (fRel.tag == "SVO" && fRel.names(2).contains("的") &&
            copPredSet.contains(pyWord(r, fRel.idxs(1).get)) &&
            !fRel.pred.contains("·X·")) {
          val deIdxFrom1 = fRel.idxs(2).get + 1
          val deInVobvob = r.words.indices.exists(i => r.heads(i) == deIdxFrom1 && r.deprels(i) == "VOB")
          if (!deInVobvob) {
            for (attIdx <- r.words.indices
                 if r.heads(attIdx) == deIdxFrom1 && r.deprels(attIdx) == "ATT") {
              var attTok = r.words(attIdx)
              val attIdxFrom1 = attIdx + 1
              if (r.words.indices.exists(i => r.heads(i) == attIdxFrom1 && r.deprels(i) == "POB" && r.words(i) == "被"))
                attTok = "被" + attTok
              for (cmpIdx <- r.words.indices
                   if r.heads(cmpIdx) == attIdxFrom1 && r.deprels(cmpIdx) == "CMP" && cmpIdx + 1 > attIdxFrom1)
                attTok = attTok + r.words(cmpIdx)

              for (advIdx <- r.words.indices if r.heads(advIdx) == attIdxFrom1) {
                if (r.deprels(advIdx) == "ADV") {
                  val advTok = r.words(advIdx)
                  val advIdxFrom1 = advIdx + 1
                  var advChildFound = false
                  for (prepIdx <- r.words.indices if r.heads(prepIdx) == advIdxFrom1) {
                    if (r.deprels(prepIdx) == "MT") {
                      val mtToken = r.words(prepIdx)
                      if (!punctuationList.contains(mtToken) &&
                          prepIdx + 1 < advIdxFrom1 && advIdxFrom1 < attIdxFrom1 && attIdxFrom1 < deIdxFrom1) {
                        aF += Rel(Vector(fRel.names(0), Some(fRel.pred + "·" + mtToken + "·X·" + attTok + "·的"), Some(advTok)),
                                  fRel.tag, Vector(fRel.idxs(0), fRel.idxs(1), Some(advIdx)))
                        fResidue += fRelIdx; counts("copadj") += 1; advChildFound = true
                      }
                    } else if (r.deprels(prepIdx) == "POB") {
                      val pobTok = r.words(prepIdx)
                      if (pobTok != "被" &&
                          advIdxFrom1 < prepIdx + 1 && prepIdx + 1 < attIdxFrom1 && attIdxFrom1 < deIdxFrom1) {
                        aF += Rel(Vector(fRel.names(0), Some(fRel.pred + "·" + advTok + "·X·" + attTok + "·的"), Some(pobTok)),
                                  fRel.tag, Vector(fRel.idxs(0), fRel.idxs(1), Some(prepIdx)))
                        fResidue += fRelIdx; counts("copadj") += 1; advChildFound = true
                      }
                    }
                  }
                  if (!advChildFound && examinePostags(advTok, posTags, nounPostagList) &&
                      advIdxFrom1 < attIdxFrom1 && attIdxFrom1 < deIdxFrom1) {
                    aF += Rel(Vector(fRel.names(0), Some(fRel.pred + "·X·" + attTok + "·的"), Some(advTok)),
                              fRel.tag, Vector(fRel.idxs(0), fRel.idxs(1), Some(advIdx)))
                    fResidue += fRelIdx; counts("copadj") += 1
                  }
                } else if (r.deprels(advIdx) == "SBV") {
                  val sbvTok = r.words(advIdx)
                  if (attIdxFrom1 <= deIdxFrom1) {
                    aF += Rel(Vector(fRel.names(0), Some(fRel.pred + "·X·" + attTok + "·的"), Some(sbvTok)),
                              fRel.tag, Vector(fRel.idxs(0), fRel.idxs(1), Some(advIdx)))
                    fResidue += fRelIdx; counts("copadj") += 1
                  }
                }
              }
            }
          }
        }
      }
    }

    // ---- ATT_SUB (nested-clause chains, fine only;
    //      dudepparse.py:1345-1391) ------------------------------------
    locally {
      val jf = jF
      val jfAttns = filterRelList(jf, "ATT_N")
      for (rel1 <- jf if rel1.tag == "SVO" && !(rel1.names(0).nonEmpty && rel1.names(2).nonEmpty)) {
        val argSeqNames = ListBuffer[String](rel1.pred)
        val argSeqIdxs = ListBuffer[Int](rel1.idxs(1).get)
        var hit = false
        while (!hit) {
          hit = true
          for ((_, relNext) <- jfAttns
               if ieq(relNext.idxs(0), argSeqIdxs.last)) {
            argSeqNames += relNext.names(1).getOrElse("")
            argSeqIdxs += relNext.idxs(1).get
            hit = false
          }
        }
        for (i <- 1 until argSeqNames.length) {
          val predName = argSeqNames.take(i).mkString("·")
          val predIdx = argSeqIdxs.head
          val argName = argSeqNames(i)
          val argIdx = argSeqIdxs(i)
          if (rel1.names(0).isEmpty) {
            aF += Rel(Vector(Some(argName), Some(predName), rel1.names(2)), rel1.tag,
                      Vector(Some(argIdx), Some(predIdx), rel1.idxs(2)))
          } else {
            aF += Rel(Vector(rel1.names(0), Some(predName), Some(argName)), rel1.tag,
                      Vector(rel1.idxs(0), Some(predIdx), Some(argIdx)))
          }
          counts("attsub") += 1
        }
      }
    }

    // ---- ATT_ATT possible rels (contiguous ATT ATT N;
    //      dudepparse.py:1398-1430) ------------------------------------
    locally {
      for (tok1Idx <- r.words.indices if r.deprels(tok1Idx) == "ATT") {
        val tok1Name = r.words(tok1Idx)
        val tok1IsNominal = ignorePostag || examinePostags(tok1Name, posTags, modifNounList)
        val tok2Idx = r.heads(tok1Idx) - 1
        if (tok2Idx - tok1Idx == 1 && tok1IsNominal && pyDeprel(r, tok2Idx) == "ATT") {
          val tok2Name = r.words(tok2Idx)
          val tok2IsNominal = ignorePostag || examinePostags(tok2Name, posTags, modifNounList)
          if (tok2IsNominal) {
            val tok3Idx = r.heads(tok2Idx) - 1
            if (tok3Idx - tok2Idx == 1 &&
                Set("SBV", "VOB", "POB", "HED", "COO", "IC", "DOB").contains(pyDeprel(r, tok3Idx))) {
              val tok3Name = r.words(tok3Idx)
              val tok3IsNominal = ignorePostag || examinePostags(tok3Name, posTags, modifNounList)
              if (tok3IsNominal &&
                  !(tok3Name.length == 1 || noChineseChar(tok3Name) || tok3Name == "自己")) {
                possibleF += Rel(Vector(Some(tok3Name), Some("是·X·的·" + tok2Name), Some(tok1Name)), "SVO",
                                 Vector(Some(tok3Idx), Some(tok2Idx), Some(tok1Idx)))
                counts("attatt") += 1
              }
            }
          }
        }
      }
    }

    // ---- VOB_VOB chains (dudepparse.py:1437-1461) --------------------
    locally {
      val jf = jF
      for (fRel <- jf if fRel.tag == "SVO" && fRel.names(2).nonEmpty && fRel.idxs(2).nonEmpty) {
        val chainNames = ListBuffer[String](fRel.names(2).get)
        val chainIdxs = ListBuffer[Int](fRel.idxs(2).get)
        var hit = false
        while (!hit) {
          hit = true
          val objIdxFrom1 = chainIdxs.last + 1
          for (tokIdx <- r.words.indices
               if r.heads(tokIdx) == objIdxFrom1 && r.deprels(tokIdx) == "VOB") {
            chainNames += r.words(tokIdx)
            chainIdxs += tokIdx
            hit = false
          }
        }
        for (nidx <- 1 until chainNames.length) {
          val newPred =
            if (fRel.pred.contains("·X·"))
              fRel.pred.replace("·X·", "·" + chainNames.take(nidx).mkString("·") + "·X·")
            else fRel.pred + "·" + chainNames.take(nidx).mkString("·")
          aF += Rel(Vector(fRel.names(0), Some(newPred), Some(chainNames(nidx))), fRel.tag,
                    Vector(fRel.idxs(0), fRel.idxs(1), Some(chainIdxs(nidx))))
          counts("vobvob") += 1
        }
      }
    }

    // ---- final pruning of residues (dudepparse.py:1470-1484) ---------
    val pF = f.zipWithIndex.collect { case (rel, i) if !fResidue.contains(i) => rel }
    val pC = c.zipWithIndex.collect { case (rel, i) if !cResidue.contains(i) => rel }

    AmendResult(aF.toVector, aC.toVector, pF, pC, possibleF.toVector,
                vcmp.toMap, counts.toMap)
  }
}
