package graft.extract

import graft.model.{Arg, DepParse, RawRel}
import scala.collection.mutable.ListBuffer

/** Base pattern extraction over one dependency parse.
  *
  * Semantics re-derived from the reference's `FineGrainedInfo` /
  * `CoarseGrainedInfo` (/root/reference/extract.py:71-757). `coarse = true`
  * projects argument surfaces to full subtree spans via `processSubTerm`
  * (extract.py:706-731): inorder traversal skipping COO subtrees, with one
  * leading and one trailing MT token trimmed.
  *
  * Pure function: no Spark dependency; invoked from a typed
  * `Dataset.mapPartitions` in the pipeline.
  */
final class Extractor(val tree: DepTree, val coarse: Boolean) {
  import tree.{nodes, Node}

  private val ba = Set("把", "将")
  private val bei = Set("被")
  private val baOrBei = ba ++ bei

  private def arg(node: Node): Arg = Arg(node.id, node.word)
  private def argTerm(node: Node): Arg =
    if (coarse) Arg(node.id, processSubTerm(node)) else Arg(node.id, node.word)

  /** Extract all raw relations of the sentence, mirroring the reference's
    * parse() loop order (extract.py:76-97 / :393-414). */
  def parse(): List[RawRel] = {
    val out = ListBuffer.empty[RawRel]
    var bbFlag = false
    for (node <- nodes) {
      val bb = processBa(node) ++ processBei(node)
      bbFlag = bb.nonEmpty || bbFlag
      out ++= processSvo(node, bbFlag)
      out ++= processPob(node, bbFlag)
      out ++= processAdv(node)
      out ++= processAtt(node)
      out ++= processCmp(node)
      out ++= processDbl(node)
      out ++= processVv(node)
      out ++= processF(node)
      out ++= processIc(node)
      out ++= processHed(node)
      out ++= processDob(node)
      out ++= bb
    }
    if (out.isEmpty) processPhrase() else out.toList
  }

  /** Inorder traversal of a subtree, skipping COO children
    * (extract.py:720-731). Appends node ids into `buf`. */
  private def inorderInto(node: Node, buf: ListBuffer[Int]): Unit = {
    for (i <- node.lefts if nodes(i).deprel != "COO") inorderInto(nodes(i), buf)
    buf += node.id
    for (i <- node.rights if nodes(i).deprel != "COO") inorderInto(nodes(i), buf)
  }

  // processSubTerm is pure per node and called repeatedly (coarse
  // argument projection + coarsify re-projection) — memoized per tree.
  private val subTermCache = new Array[String](tree.n)

  /** Full subtree surface span with single leading/trailing MT trimmed
    * (extract.py:706-718). */
  def processSubTerm(node: Node): String = {
    val cached = subTermCache(node.id)
    if (cached != null) return cached
    val buf = ListBuffer.empty[Int]
    inorderInto(node, buf)
    var toks = buf.toList
    if (nodes(toks.head).deprel == "MT" && toks.length > 1) toks = toks.tail
    if (nodes(toks.last).deprel == "MT" && toks.length > 1) toks = toks.init
    val res =
      if (toks.length == 1) nodes(toks.head).word
      else {
        val sb = new java.lang.StringBuilder
        toks.foreach(i => sb.append(nodes(i).word))
        sb.toString
      }
    subTermCache(node.id) = res
    res
  }

  /** COO fan-out of a node (extract.py:251-258 fine / :569-581 coarse). */
  def processCoo(node: Node): List[Arg] = {
    if (!coarse) {
      node.children.collect { case cid if nodes(cid).deprel == "COO" => arg(nodes(cid)) }
    } else {
      // coarse: substitute the conjunct into the head's span when the
      // conjunct has no subtree of its own (extract.py:569-581)
      val term = processSubTerm(node)
      node.children.flatMap { cid =>
        val cnode = nodes(cid)
        if (cnode.deprel == "COO") {
          val cword = processSubTerm(cnode)
          if (cword == cnode.word) Some(Arg(cnode.id, term.replace(node.word, cword)))
          else Some(Arg(cnode.id, cword))
        } else None
      }
    }
  }

  /** SVO extraction (extract.py:99-139 fine / :416-454 coarse). */
  def processSvo(node: Node, flag: Boolean): List[RawRel] = {
    var vs = List(arg(node))
    var ss = List.empty[Arg]
    var os = List.empty[Arg]

    val it = node.children.iterator
    var break = false
    while (it.hasNext && !break) {
      val cnode = nodes(it.next())
      if (flag && cnode.deprel == "POB" && baOrBei.contains(cnode.word)) {
        ss = Nil; break = true
      } else if (cnode.deprel == "DBL") {
        return Nil
      } else if (cnode.deprel == "SBV") {
        ss = ss ++ (argTerm(cnode) :: processCoo(cnode))
      } else if (cnode.deprel == "VOB") {
        os = os ++ (argTerm(cnode) :: processCoo(cnode))
      } else if (cnode.deprel == "COO" && cnode.word != node.word) {
        vs = vs :+ arg(cnode)
      } else if (cnode.deprel == "DOB") {
        return Nil
      }
    }

    // ATT-parent-VOB fallback object (extract.py:124-125)
    if (vs.length == 1 && ss.nonEmpty && os.isEmpty && node.deprel == "ATT" &&
        tree.pyAt(node.parent).deprel == "VOB") {
      val p = tree.pyAt(node.parent)
      os = os :+ arg(p)
    }

    if (ss.nonEmpty && os.nonEmpty)
      for (s <- ss; o <- os; v <- vs) yield RawRel(List(Some(s), Some(v), Some(o)), "SVO")
    else
      ss.flatMap(s => vs.map(v => RawRel(List(Some(s), Some(v), None), "SVO"))) ++
        os.flatMap(o => vs.map(v => RawRel(List(None, Some(v), Some(o)), "SVO")))
  }

  /** ATT pairs (extract.py:141-160 fine / :456-473 coarse). */
  def processAtt(node: Node): List[RawRel] = {
    if (!coarse) {
      var atts = List.empty[Arg]
      var ns = List(arg(node))
      for (cid <- node.children) {
        val cnode = nodes(cid)
        if (cnode.deprel == "ATT") {
          atts = atts ++ (arg(cnode) :: processCoo(cnode))
        } else if (cnode.deprel == "COO" && processAtt(cnode).isEmpty) {
          ns = ns :+ arg(cnode)
        }
      }
      for (att <- atts; n <- ns) yield RawRel(List(Some(att), Some(n)), "ATT_N")
    } else {
      val out = ListBuffer.empty[RawRel]
      var ns = List.empty[(Arg, Arg)]
      for (cid <- node.children) {
        val cnode = nodes(cid)
        if (cnode.deprel == "ATT" && node.deprel != "COO") {
          ns = ns :+ ((Arg(cnode.id, processSubTerm(cnode)), arg(node)))
          for (cooWord <- processCoo(cnode))
            out += RawRel(List(Some(cooWord), Some(arg(node))), "ATT_N")
        }
      }
      if (ns.nonEmpty) ns = ns ++ processAttCoo(node)
      for ((a, b) <- ns) out += RawRel(List(Some(a), Some(b)), "ATT_N")
      out.toList
    }
  }

  /** coarse-only: ATT context for COO conjunct heads (extract.py:682-694). */
  private def processAttCoo(node: Node): List[(Arg, Arg)] = {
    val nAtt = processLeftAtt(node)
    node.children.flatMap { cid =>
      val cnode = nodes(cid)
      if (cnode.deprel == "COO") {
        val leftCooAtt = processLeftAtt(cnode)
        if (leftCooAtt.isEmpty) Some((Arg(-1, nAtt), arg(cnode)))
        else Some((Arg(-1, leftCooAtt), arg(cnode)))
      } else None
    }
  }

  /** coarse-only: concatenated left-ATT span (extract.py:696-704). */
  private def processLeftAtt(node: Node): String =
    node.lefts.collect { case cid if nodes(cid).deprel == "ATT" => processSubTerm(nodes(cid)) }.mkString

  /** ADV pairs, excluding ADVs that dominate a POB
    * (extract.py:162-181 fine / :475-494 coarse). */
  def processAdv(node: Node): List[RawRel] = {
    var advs = List.empty[Arg]
    var vs = List(arg(node))
    for (cid <- node.children) {
      val cnode = nodes(cid)
      if (cnode.deprel == "ADV" &&
          (cnode.rights.isEmpty || nodes(cnode.rights.head).deprel != "POB")) {
        advs = advs ++ (argTerm(cnode) :: processCoo(cnode))
      } else if (cnode.deprel == "COO" && processAdv(cnode).isEmpty) {
        vs = vs :+ arg(cnode)
      }
    }
    for (adv <- advs; v <- vs) yield RawRel(List(Some(adv), Some(v)), "ADV_V")
  }

  /** 把/将 disposal construction (extract.py:183-202 / :496-517). */
  def processBa(node: Node): List[RawRel] = {
    if (node.deprel == "POB" && ba.contains(node.word) && node.rights.length == 1) {
      val pnode = tree.pyAt(node.parent)
      val baObj = argTerm(nodes(node.rights.head))
      if (pnode.rights.nonEmpty && nodes(pnode.rights.head).deprel == "VOB") {
        val vob = argTerm(nodes(pnode.rights.head))
        pnode.children.map(nodes(_)).find(_.deprel == "SBV") match {
          case Some(sbv) =>
            List(RawRel(List(Some(argTerm(sbv)), Some(arg(pnode)), Some(vob), Some(baObj)), "DOB"))
          case None =>
            List(RawRel(List(None, Some(arg(pnode)), Some(vob), Some(baObj)), "DOB"))
        }
      } else {
        pnode.children.map(nodes(_)).find(_.deprel == "SBV") match {
          case Some(sbv) =>
            List(RawRel(List(Some(argTerm(sbv)), Some(arg(pnode)), Some(baObj)), "SVO"))
          case None =>
            List(RawRel(List(None, Some(arg(pnode)), Some(baObj)), "SVO"))
        }
      }
    } else Nil
  }

  /** 被 passive construction, three sub-cases (extract.py:204-238 / :519-556). */
  def processBei(node: Node): List[RawRel] = {
    val pnode = tree.pyAt(node.parent)
    if (node.deprel == "POB" && bei.contains(node.word) && pnode.rights.nonEmpty &&
        nodes(pnode.rights.head).deprel == "VOB") {
      val subject = node.rights.headOption.map(i => argTerm(nodes(i)))
      val vob = argTerm(nodes(pnode.rights.head))
      val sbvs = pnode.lefts.map(nodes(_)).filter(_.deprel == "SBV")
      if (sbvs.nonEmpty)
        sbvs.map(s => RawRel(List(subject, Some(arg(pnode)), Some(vob), Some(argTerm(s))), "DOB"))
      else
        List(RawRel(List(subject, Some(arg(pnode)), Some(vob), None), "DOB"))
    } else if (node.deprel == "POB" && bei.contains(node.word) && node.rights.length == 1) {
      val subject = argTerm(nodes(node.rights.head))
      val sbvs = pnode.lefts.map(nodes(_)).filter(_.deprel == "SBV")
      if (sbvs.nonEmpty)
        sbvs.map(s => RawRel(List(Some(subject), Some(arg(pnode)), Some(argTerm(s))), "SVO"))
      else
        List(RawRel(List(Some(subject), Some(arg(pnode)), None), "SVO"))
    } else if (node.deprel == "POB" && bei.contains(node.word)) {
      val fromSbv = pnode.lefts.map(nodes(_)).filter(_.deprel == "SBV")
        .map(c => RawRel(List(None, Some(arg(pnode)), Some(argTerm(c))), "SVO"))
      val fromVob = pnode.rights.map(nodes(_)).filter(_.deprel == "VOB")
        .map(c => RawRel(List(None, Some(arg(pnode)), Some(argTerm(c))), "SVO"))
      fromSbv ++ fromVob
    } else Nil
  }

  /** bare POB → (pob-obj, grandparent) pair (extract.py:240-249 / :558-567). */
  def processPob(node: Node, bbFlag: Boolean): List[RawRel] = {
    if (bbFlag || node.deprel != "POB") return Nil
    val parent = tree.pyAt(node.parent)
    if (parent.parent != -1) {
      val gp = nodes(parent.parent)
      List(RawRel(List(Some(arg(node)), Some(arg(gp))), "ADV_V"))
    } else {
      List(RawRel(List(Some(arg(node))), "Phrase"))
    }
  }

  /** verb + complement pair (extract.py:268-275 / :591-598). */
  def processCmp(node: Node): List[RawRel] =
    node.children.map(nodes(_)).filter(_.deprel == "CMP")
      .map(c => RawRel(List(Some(arg(node)), Some(arg(c))), "V_CMP"))

  /** pivotal (兼语) DBL construction (extract.py:277-304 / :600-627). */
  def processDbl(node: Node): List[RawRel] = {
    var ss = List.empty[Arg]
    val v = arg(node)
    var o: Option[Arg] = None
    var ds = List.empty[Arg]
    for (cid <- node.children) {
      val cnode = nodes(cid)
      if (cnode.deprel == "SBV") ss = ss ++ (argTerm(cnode) :: processCoo(cnode))
      if (cnode.deprel == "DBL") {
        if (o.isEmpty) o = Some(arg(cnode))
        else ds = ds ++ (argTerm(cnode) :: processCoo(cnode))
      }
    }
    val head =
      if (ss.nonEmpty && o.nonEmpty)
        ss.map(s => RawRel(List(Some(s), Some(v), o), "SVO"))
      else if (o.nonEmpty) List(RawRel(List(None, Some(v), o), "SVO"))
      else Nil
    head ++ ds.map(d => RawRel(List(o, Some(d), None), "SVO"))
  }

  /** serial-verb VV (extract.py:306-319 / :629-642). */
  def processVv(node: Node): List[RawRel] = {
    val out = ListBuffer.empty[RawRel]
    var sbvWord: Option[Arg] = None
    for (cid <- node.children) {
      val cnode = nodes(cid)
      if (cnode.deprel == "SBV") sbvWord = Some(arg(cnode))
      else if (cnode.deprel == "VV") {
        sbvWord match {
          case Some(s) => out += RawRel(List(Some(s), Some(arg(cnode)), None), "SVO")
          case None => out += RawRel(List(Some(arg(cnode))), "Phrase")
        }
      }
    }
    out.toList
  }

  /** F-label (direction/loc suffix) with MT fusion (extract.py:321-331).
    * The reference's coarse variant nests the MT word in a singleton list
    * (extract.py:651) — an artifact that never reaches output (F rels are
    * dropped before serialization), flattened here. */
  def processF(node: Node): List[RawRel] = {
    if (node.deprel != "F") return Nil
    val parentId = node.parent
    if (parentId - 1 >= 0 && nodes(parentId - 1).deprel == "MT" &&
        nodes(parentId - 1).parent == parentId) {
      List(RawRel(List(Some(arg(nodes(parentId - 1))), Some(arg(nodes(parentId))), Some(arg(node))), "F"))
    } else {
      List(RawRel(List(Some(arg(tree.pyAt(parentId))), Some(arg(node))), "F"))
    }
  }

  /** IC clause → Phrase (extract.py:333-346). */
  def processIc(node: Node): List[RawRel] = {
    if (node.deprel != "IC") return Nil
    val out = ListBuffer.empty[RawRel]
    var flag = true
    for (cid <- node.children) {
      val cnode = nodes(cid)
      if (!Set("MT", "COO", "IC").contains(cnode.deprel)) flag = false
      if (cnode.deprel == "COO") out += RawRel(List(Some(arg(cnode))), "Phrase")
    }
    if (flag) out += RawRel(List(Some(arg(node))), "Phrase")
    out.toList
  }

  /** degenerate HED-only sentence → Phrase (extract.py:348-357). */
  def processHed(node: Node): List[RawRel] = {
    if (node.deprel != "HED") return Nil
    val bad = node.children.exists(cid => !Set("MT", "IC").contains(nodes(cid).deprel))
    if (bad) Nil else List(RawRel(List(Some(arg(node))), "Phrase"))
  }

  /** double-object DOB verbs → 4-ary DOB (extract.py:359-384 / :733-757). */
  def processDob(node: Node): List[RawRel] = {
    var vs = List(arg(node))
    var ss = List.empty[Arg]
    var os = List.empty[Arg]
    for (cid <- node.children) {
      val cnode = nodes(cid)
      if (cnode.deprel == "SBV") ss = ss ++ (argTerm(cnode) :: processCoo(cnode))
      else if (cnode.deprel == "COO" && cnode.word != node.word) vs = vs :+ arg(cnode)
      else if (cnode.deprel == "DOB") os = os :+ argTerm(cnode)
    }
    if (os.length != 2) Nil
    else if (ss.nonEmpty)
      for (s <- ss; v <- vs) yield RawRel(List(Some(s), Some(v), Some(os(0)), Some(os(1))), "DOB")
    else
      vs.map(v => RawRel(List(None, Some(v), Some(os(0)), Some(os(1))), "DOB"))
  }

  /** fallback when nothing was extracted (extract.py:260-266 / :583-589). */
  def processPhrase(): List[RawRel] =
    RawRel(List(Some(arg(nodes(0)))), "Phrase") ::
      processCoo(nodes(0)).map(w => RawRel(List(Some(w)), "Phrase"))
}

object Extractor {
  def fine(parse: DepParse): List[RawRel] = new Extractor(new DepTree(parse), coarse = false).parse()
  def coarseOf(tree: DepTree): Extractor = new Extractor(tree, coarse = true)
  def coarse(parse: DepParse): List[RawRel] = coarseOf(new DepTree(parse)).parse()
}
