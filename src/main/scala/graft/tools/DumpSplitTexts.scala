package graft.tools

import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.ObjectMapper
import graft.synth.SynthDocs

/** Deterministic text battery for the sentence-splitter differential test
  * (replayed through the reference's split_str). */
object DumpSplitTexts {
  def texts: Vector[String] = {
    val docTexts = (0L until 200L).map { d =>
      SynthDocs.genDoc(d).spans.filter(_.kind == "text").map(_.text).mkString("\n")
    }.toVector
    val zhLong = "中文内容很长没有任何弱边界符号可以用来切分这个超级长的句子" * 30 // > 430 zh chars, no weak boundary
    val zhWeak = "中文内容很长，有逗号作为弱边界，" * 40 // > 430 zh chars with weak boundaries
    val edge = Vector(
      "abc def。123!",
      "短句。",
      "太短。",
      "这是第一句话呀。这是第二句话呀！这是第三句话呀？这样；这是第四句话呀……第五句话呀;这是结尾的话",
      "前面的话语：\"引用的内容呀。\"后面的话语。",
      "句子之后带引号的情况呀。\"接着又是一句话呀。",
      zhLong, zhWeak,
      "空  格 与\t制表符。还有#井号::双冒号的句子呀。",
      "纯粹换行\n分割的两个句子呀\n第三个句子也在这里呀")
    // admission-boundary lengths: exactly 430/431 zh chars, 499/500 total
    val zh430 = "这是汉字内容" * 71 + "汉字汉字" // 426+4 = 430 zh chars
    val zh431 = zh430 + "字"
    val len499 = "中" * 430 + "x" * 69 // 430 zh + latin padding → len 499
    val len500 = len499 + "y"
    // delimiter soups + empties between delimiters
    val soups = Vector(
      "。。。只有句号之间的内容呀。。。",
      "！？；轮流出现的句子呀！结尾句子呀？最后的句子呀；",
      "……省略号开头的句子呀……结尾也是省略号的句子呀……",
      "中间有：\"引用嵌套。引用里另一句呀！\"引用之后的句子呀。",
      "半角分号;分割的句子呀;再一个句子呀",
      "。"  // delimiter only
    )
    // pseudo-random delimiter placement over a fixed word pool
    val rndTexts = (0 until 100).map { i =>
      var h = i.toLong * 2654435761L
      def next(n: Int) = { h = h * 6364136223846793005L + 1442695040888963407L; math.floorMod(h >> 16, n).toInt }
      val words = Vector("今天", "天气", "非常", "晴朗", "大家", "出门", "散步", "公园", "abc", "123", " ")
      val delims = Vector("。", "！", "？", "；", "……", ";", "\n", "，", "")
      (0 until (5 + next(30))).map(_ => words(next(words.length)) + delims(next(delims.length))).mkString
    }
    docTexts ++ edge ++ Vector(zh430, zh431, len499, len500) ++ soups ++ rndTexts
  }

  /** multi-chunk batteries with NON-TRIVIAL initial mappings (duplicate and
    * non-contiguous chunk ids) for the mapping-threaded split_str variant —
    * the newsspike re-split path (preprocess_corpus.py:342-355). */
  def mappedBatteries: Vector[(Vector[String], Vector[Int])] = {
    val t = texts
    (0 until 60).toVector.map { i =>
      val chunks = Vector(t(i % t.length), t((i * 7 + 3) % t.length), t((i * 13 + 11) % t.length))
      val mapping = Vector(i % 4, i % 4, (i * 3) % 7 + 2) // duplicates + gaps
      (chunks, mapping)
    }
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/split_texts.json"
    val mapper = new ObjectMapper()
    val arr = mapper.createArrayNode()
    texts.foreach(arr.add)
    Files.write(Paths.get(out), mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(arr))
    println(s"wrote ${texts.length} texts to $out")
    if (args.length > 1) {
      val marr = mapper.createArrayNode()
      mappedBatteries.foreach { case (chunks, mapping) =>
        val node = mapper.createObjectNode()
        val c = mapper.createArrayNode(); chunks.foreach(c.add)
        val m = mapper.createArrayNode(); mapping.foreach(m.add)
        node.replace("chunks", c); node.replace("mapping", m)
        marr.add(node)
      }
      Files.write(Paths.get(args(1)), mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(marr))
      println(s"wrote ${mappedBatteries.length} mapped batteries to ${args(1)}")
    }
  }
}
