package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** Kuromoji dictionary BUILDERS — the Tools/ side of the reference's
  * Japanese module (reference:
  * /root/reference/src/Lucene.Net.Analysis.Kuromoji/Tools/
  * DictionaryBuilder.cs, TokenInfoDictionaryBuilder.cs:150-230,
  * ConnectionCostsBuilder.cs, Util/CSVUtil.cs:35-100 and
  * Dict/UserDictionary.cs:59-110): parse MeCab-format dictionary SOURCE
  * text (the IPADIC/UniDic CSV distributions a user brings along — the
  * same algorithms-over-user-data stance as [[Kuromoji]] itself) into
  * the engine's lexicon rows. The reference compiles these into
  * FST+binary tables; here the [[Kuromoji]] tokenizer consumes the rows
  * directly, so "build" = parse + reshape.
  */
object KuromojiDict {
  import Kuromoji.{JaEntry, JaUserEntry}

  /** CSVUtil.Parse (:35-75): comma split outside quotes, quote chars
    * toggle state and stay in the value until UnQuoteUnEscape strips the
    * outer quotes and collapses "" → " for quoted values; a line with an
    * UNBALANCED quote count parses to nothing (the reference returns an
    * empty array). */
  def csvParse(line: String): Array[String] = {
    var insideQuote = false
    var quoteCount = 0
    val out = ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') { insideQuote = !insideQuote; quoteCount += 1 }
      if (c == ',' && !insideQuote) {
        out += unQuoteUnEscape(sb.toString)
        sb.setLength(0)
      } else sb.append(c)
      i += 1
    }
    out += sb.toString
    if (quoteCount % 2 != 0) Array.empty else out.toArray
  }

  // the reference's QUOTE_REPLACE_PATTERN ^"(.+)"$ strip + "" → "
  private def unQuoteUnEscape(v: String): String = {
    var r = v
    if (r.indexOf('"') >= 0) {
      if (r.length > 1 && r.charAt(0) == '"' && r.charAt(r.length - 1) == '"')
        r = r.substring(1, r.length - 1)
      if (r.contains("\"\"")) r = r.replace("\"\"", "\"")
    }
    r
  }

  private def joinPos(parts: Seq[String]): String =
    parts.filter(p => p.nonEmpty && p != "*").mkString("-")

  /** One IPADIC CSV line → lexicon row. Layout (13 cols):
    * surface,leftId,rightId,cost,POS1..POS4,conjType,conjForm,baseForm,
    * reading,pronunciation — POS joins the non-'*' levels with '-' (the
    * reference's POS hierarchy rendering), baseForm '*' means "same as
    * surface" and is stored empty (BaseFormFilter no-ops). */
  def parseIpadicLine(line: String): Option[JaEntry] = {
    val v = csvParse(line)
    if (v.length < 13) None
    else Some(JaEntry(v(0), v(1).trim.toInt, v(2).trim.toInt, v(3).trim.toInt,
      partOfSpeech = joinPos(v.slice(4, 8).toSeq),
      baseForm = if (v(10) == "*" || v(10) == v(0)) "" else v(10),
      reading = if (v(11) == "*") "" else v(11)))
  }

  /** UniDic layout (21 cols) → the reference's FormatEntry mapping
    * (TokenInfoDictionaryBuilder.cs:199-227): POS from cols 4-7, baseForm
    * empty (col 10 in the remapped row is col 11 = the conjugation form
    * slot), reading from col 13 falling back to the surface when empty. */
  def parseUnidicLine(line: String): Option[JaEntry] = {
    val v = csvParse(line)
    if (v.length < 14) None
    else Some(JaEntry(v(0), v(1).trim.toInt, v(2).trim.toInt, v(3).trim.toInt,
      partOfSpeech = joinPos(v.slice(4, 8).toSeq),
      baseForm = "",
      reading = if (v(13).isEmpty) v(0) else v(13)))
  }

  /** Parse a whole dictionary source (one CSV entry per line). With
    * `normalizeEntries` (DictionaryBuilder's normalize flag,
    * TokenInfoDictionaryBuilder.cs:150-170) every non-NFKC line ALSO
    * yields its NFKC-normalized twin, so full/half-width variants match. */
  def parseMecab(lines: IterableOnce[String], unidic: Boolean = false,
                 normalizeEntries: Boolean = false): Seq[JaEntry] = {
    val parse: String => Option[JaEntry] =
      if (unidic) parseUnidicLine else parseIpadicLine
    val out = ArrayBuffer.empty[JaEntry]
    lines.iterator.filter(_.trim.nonEmpty).foreach { line =>
      parse(line).foreach { e =>
        out += e
        if (normalizeEntries &&
            !java.text.Normalizer.isNormalized(e.surface, java.text.Normalizer.Form.NFKC)) {
          val norm = java.text.Normalizer.normalize(e.surface, java.text.Normalizer.Form.NFKC)
          out += e.copy(surface = norm)
        }
      }
    }
    out.toSeq
  }

  /** matrix.def (ConnectionCostsBuilder.cs:38-60): first line
    * `<forwardSize> <backwardSize>`, then `rightId leftId cost` rows →
    * the (rightId, leftId) → cost map [[Kuromoji]] takes. */
  def parseMatrixDef(text: String): Map[(Int, Int), Int] = {
    val it = text.linesIterator.filter(_.trim.nonEmpty)
    if (!it.hasNext) return Map.empty
    it.next() // the size header
    it.map { l =>
      val p = l.trim.split("\\s+")
      require(p.length == 3, s"bad matrix.def line: $l")
      (p(0).toInt, p(1).toInt) -> p(2).toInt
    }.toMap
  }

  /** User-dictionary CSV (Dict/UserDictionary.cs:62-101):
    * `text,segmentation,readings,POS` — segmentation/readings split on
    * spaces, '#' comments stripped, counts must agree (the reference
    * throws the same way). */
  def parseUserDict(lines: IterableOnce[String]): Seq[JaUserEntry] = {
    lines.iterator
      .map(l => l.replaceAll("#.*$", "").trim)
      .filter(_.nonEmpty)
      .map { line =>
        val v = csvParse(line)
        require(v.length >= 4, s"bad user dictionary line: $line")
        val segs = v(1).split("\\s+").filter(_.nonEmpty).toSeq
        val reads = v(2).split("\\s+").filter(_.nonEmpty).toSeq
        require(segs.length == reads.length,
          s"Illegal user dictionary entry ${v(0)} - the number of segmentations" +
            s" (${segs.length}) does not the match number of readings (${reads.length})")
        JaUserEntry(v(0), segs, reads, v(3))
      }.toSeq
  }
}
