package graft.extract

import graft.model.DepParse

/** Dependency tree over a DDParser-style parse.
  *
  * Semantics re-derived from the reference's `Node`/`Tree`
  * (/root/reference/extract.py:25-68): 0-based `parent` (head-1, root has
  * parent -1), children split into sorted `lefts`/`rights` id lists, root =
  * first node whose head is 0.
  *
  * `pyAt` reproduces Python's negative-index list access, which the
  * reference relies on implicitly in a handful of degenerate-tree paths
  * (e.g. extract.py:207 computes `nodes[node.parent]` before checking the
  * deprel, so a root node resolves to the LAST node via `nodes[-1]`). These
  * paths never fire on well-formed parses but are part of the observable
  * spec.
  */
final class DepTree(val parse: DepParse) {
  val n: Int = parse.length

  final class Node(val id: Int, val word: String, val parent: Int, val deprel: String) {
    var lefts: List[Int] = Nil // sorted ascending
    var rights: List[Int] = Nil // sorted ascending
    def children: List[Int] = lefts ++ rights
  }

  val nodes: IndexedSeq[Node] = {
    val ns = (0 until n).map(i => new Node(i, parse.words(i), parse.heads(i) - 1, parse.deprels(i)))
    for (node <- ns; if node.parent != -1) {
      val p = ns(node.parent)
      if (node.id > p.id) p.rights = (p.rights :+ node.id).sorted
      else p.lefts = (p.lefts :+ node.id).sorted
    }
    ns
  }

  val root: Node = nodes(parse.heads.indexOf(0))

  /** Python-style list access: negative indices wrap from the end. */
  def pyAt(i: Int): Node = if (i < 0) nodes(n + i) else nodes(i)

  def pyWord(i: Int): String = if (i < 0) parse.words(n + i) else parse.words(i)
  def pyHead(i: Int): Int = if (i < 0) parse.heads(n + i) else parse.heads(i)
  def pyDeprel(i: Int): String = if (i < 0) parse.deprels(n + i) else parse.deprels(i)
}
