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
    docTexts ++ edge
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/split_texts.json"
    val mapper = new ObjectMapper()
    val arr = mapper.createArrayNode()
    texts.foreach(arr.add)
    Files.write(Paths.get(out), mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(arr))
    println(s"wrote ${texts.length} texts to $out")
  }
}
