package graft.analysis

/** Self-authored DEMO data packs for the data-driven analyzers — so a
  * default-constructed Japanese / Chinese / Polish / English chain works
  * end-to-end out of the box, the way the reference's shipped
  * dictionaries do (the Kuromoji Dict .dat files, the SmartCn .mem
  * files, Stempel's stemmer_20000.tbl, the KStemData sources, the
  * Hunspell .aff/.dic pair). Those files are CORPUS DERIVATIVES (IPADIC, ICTCLAS,
  * the 20k-lemma Polish table, the KStem lexicon), so they stay out of
  * this repo by policy; every table below is written BY HAND from the
  * published algorithm descriptions — a few dozen high-frequency entries
  * each, enough to demo the full pipeline (lattice search, HMM
  * segmentation, patch-trie stemming, affix stripping) on real
  * sentences. Production use swaps in a full lexicon through the SAME
  * constructor, as README documents.
  */
object DemoPacks {
  import Kuromoji.{JaEntry => E}

  // ---------------------------------------------------------- Japanese

  /** ids: 20=noun 21=particle 22=verb/aux 23=suffix. Known-word costs
    * (~2-4k) always beat the unknown classes (9-15k); connection costs
    * nudge noun→particle→verb transitions together. */
  val japaneseLexicon: Seq[Kuromoji.JaEntry] = Seq(
    E("東京", 20, 20, 3000, "名詞-固有名詞-地域", "東京", "トウキョウ"),
    E("京都", 20, 20, 3000, "名詞-固有名詞-地域", "京都", "キョウト"),
    E("日本", 20, 20, 2900, "名詞-固有名詞-地域", "日本", "ニホン"),
    E("大学", 20, 20, 3100, "名詞-一般", "大学", "ダイガク"),
    E("空港", 20, 20, 3200, "名詞-一般", "空港", "クウコウ"),
    E("国際", 20, 20, 3300, "名詞-一般", "国際", "コクサイ"),
    E("関西", 20, 20, 3200, "名詞-固有名詞-地域", "関西", "カンサイ"),
    E("関西国際空港", 20, 20, 5000, "名詞-固有名詞-組織", "関西国際空港",
      "カンサイコクサイクウコウ"),
    E("学生", 20, 20, 3100, "名詞-一般", "学生", "ガクセイ"),
    E("私", 20, 20, 3000, "名詞-代名詞-一般", "私", "ワタシ"),
    E("本", 20, 20, 3400, "名詞-一般", "本", "ホン"),
    E("は", 21, 21, 1500, "助詞-係助詞", "は", "ハ"),
    E("が", 21, 21, 1500, "助詞-格助詞-一般", "が", "ガ"),
    E("の", 21, 21, 1400, "助詞-連体化", "の", "ノ"),
    E("に", 21, 21, 1500, "助詞-格助詞-一般", "に", "ニ"),
    E("を", 21, 21, 1500, "助詞-格助詞-一般", "を", "ヲ"),
    E("で", 21, 21, 1600, "助詞-格助詞-一般", "で", "デ"),
    E("です", 22, 22, 2000, "助動詞", "です", "デス"),
    E("ます", 22, 22, 2000, "助動詞", "ます", "マス"),
    E("行き", 22, 22, 2500, "動詞-自立", "行く", "イキ"),
    E("行く", 22, 22, 2500, "動詞-自立", "行く", "イク"),
    E("読み", 22, 22, 2500, "動詞-自立", "読む", "ヨミ"),
    E("読む", 22, 22, 2500, "動詞-自立", "読む", "ヨム"))

  /** noun→particle and particle→anything transitions are cheap;
    * noun→noun slightly penalized so 東京+大学 still splits. */
  val japaneseConnCosts: Map[(Int, Int), Int] = Map(
    (20, 21) -> -500, (21, 20) -> -200, (21, 22) -> -300,
    (22, 22) -> -400, (20, 20) -> 200)

  /** A working Japanese tokenizer, default data. */
  def japanese(mode: Kuromoji.Mode = Kuromoji.Normal): Kuromoji =
    new Kuromoji(japaneseLexicon, japaneseConnCosts, mode)

  // ----------------------------------------------------------- Chinese

  /** Word frequencies roughly rank-ordered (higher = more frequent);
    * multi-char entries must out-score their per-character decomposition
    * in the HMM path search. */
  val chineseWordFreq: Map[String, Int] = Map(
    "我" -> 50000, "你" -> 40000, "他" -> 40000, "是" -> 60000,
    "的" -> 80000, "了" -> 50000, "在" -> 45000, "有" -> 42000,
    "和" -> 38000, "不" -> 41000, "人" -> 30000, "们" -> 25000,
    "我们" -> 20000, "他们" -> 15000, "中国" -> 18000, "北京" -> 12000,
    "大学" -> 10000, "学生" -> 9000, "老师" -> 8000, "学习" -> 8500,
    "中文" -> 7000, "汉语" -> 5000, "喜欢" -> 7500, "北京大学" -> 3000,
    "中" -> 9000, "国" -> 9000, "大" -> 11000, "学" -> 10000,
    "北" -> 4000, "京" -> 3500, "生" -> 6000, "文" -> 5500,
    "汉" -> 2500, "语" -> 4000, "喜" -> 2000, "欢" -> 1800,
    "老" -> 5000, "师" -> 3000, "习" -> 2200)

  val chineseBigramFreq: Map[(String, String), Int] = Map(
    ("我", "是") -> 5000, ("是", "学生") -> 1200, ("我", "喜欢") -> 1500,
    ("喜欢", "学习") -> 800, ("学习", "中文") -> 600,
    ("北京大学", "的") -> 300, ("的", "学生") -> 900)

  /** A working Chinese segmenter, default data. */
  def chinese(): SmartCn = new SmartCn(chineseWordFreq, chineseBigramFreq)

  // ------------------------------------------------------------ Polish

  /** (inflected, lemma) pairs covering the common declension endings —
    * the patch trie generalizes each ending's diff command. */
  val polishPairs: Seq[(String, String)] = Seq(
    "domy" -> "dom", "domu" -> "dom", "domów" -> "dom",
    "koty" -> "kot", "kotów" -> "kot", "kota" -> "kot",
    "książki" -> "książka", "książek" -> "książka",
    "miasta" -> "miasto", "miastach" -> "miasto",
    "ludzie" -> "człowiek", "ludzi" -> "człowiek",
    "wody" -> "woda", "wodzie" -> "woda",
    "roku" -> "rok", "lata" -> "rok",
    "dzieci" -> "dziecko", "dziećmi" -> "dziecko",
    "polski" -> "polska", "polsce" -> "polska",
    "nowego" -> "nowy", "nowej" -> "nowy", "nowych" -> "nowy")

  /** A working Polish patch-trie stemmer, default data. */
  lazy val polish: Stempel.Trie = Stempel.train(polishPairs)

  def polishStem(term: String): String = Stempel.filterTerm(polish, term)

  // ----------------------------------------------------------- English

  /** Hand-written demo affix grammar: plural/verbal suffixes + the un-
    * prefix, in the reference .aff/.dic file grammar. */
  val englishAff: String =
    """PFX U Y 1
      |PFX U 0 un .
      |SFX S Y 2
      |SFX S 0 s [^sxy]
      |SFX S y ies y
      |SFX D Y 3
      |SFX D 0 d e
      |SFX D 0 ed [^ey]
      |SFX D y ied y
      |SFX G Y 2
      |SFX G e ing e
      |SFX G 0 ing [^e]
      |""".stripMargin

  val englishDic: String =
    """10
      |merge/DGS
      |sort/DGS
      |index
      |table/S
      |query/DS
      |happy/U
      |do/U
      |lock/UDGS
      |row/S
      |plan/DGS
      |""".stripMargin

  /** A working Hunspell dictionary, default data. */
  lazy val englishHunspell: Hunspell.Dict =
    Hunspell.parse(englishAff, englishDic)

  /** A few hundred common English headwords for the KStem lexicon slot
    * (the built-in exception/conflation tables ship with the algorithm;
    * this fills the main-dictionary membership test the reference's
    * KStemData1-8 provide). */
  val englishLexicon: Seq[String] = Seq(
    "merge", "sort", "index", "table", "row", "query", "plan", "commit",
    "search", "engine", "document", "term", "score", "rank", "field",
    "filter", "group", "join", "hash", "key", "value", "data", "stream",
    "batch", "window", "column", "vector", "scan", "store", "read",
    "write", "run", "build", "test", "code", "file", "line", "word",
    "text", "count", "time", "day", "year", "use", "make", "work",
    "call", "look", "want", "give", "happy", "big", "small", "fast",
    "slow", "new", "old", "good", "long", "short", "high", "low")

  /** A working KStemmer, default data (per-thread — KStemmer instances
    * are single-threaded by contract). */
  def englishKstem(): KStemmer = new KStemmer(englishLexicon)

  // ------------------------------------------------------ Beider–Morse

  /** A working phonetic engine over the repo's hand-authored BMPM-grammar
    * rule set (the same one the gate's oracle is traced against). */
  def beiderMorse(): BeiderMorse =
    new BeiderMorse(BeiderMorse.Generic, BeiderMorse.Approx, concat = true,
      graft.ops.VerifyQueries.bmRes)
}
