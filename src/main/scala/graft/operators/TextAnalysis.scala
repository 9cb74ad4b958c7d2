package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language ID, fingerprinting. Everything except the
  * language-ID scorer is built from codegen'd SQL functions; the scorer is
  * a small deterministic UDF (per-row, no state).
  */
object TextAnalysis {

  /** Word-ish token count: runs of letters/digits (a BPE-ish pre-token
    * regex). Expressed with regexp_extract_all so DuckDB can oracle it. */
  def tokenCount(text: Column): Column =
    // null text counts 0 tokens (size(null) is -1 under ANSI-off; a -1
    // would skew every downstream average/sum silently)
    when(text.isNull, lit(0)).otherwise(size(regexp_extract_all(text, lit("\\w+"), lit(0))))

  /** Whitespace token count (non-whitespace runs — regexp form so the
    * DuckDB oracle states the identical definition). */
  def wsTokenCount(text: Column): Column =
    when(text.isNull, lit(0)).otherwise(size(regexp_extract_all(text, lit("\\S+"), lit(0))))

  /** Heuristic quality score in [0,1]:
    * length factor × word-shape factor × (1 − symbol-noise ratio).
    * The formula is deliberately SQL-only so the DuckDB oracle can
    * replicate it bit-for-bit. */
  def qualityScore(text: Column): Column = {
    val n = length(text)
    val words = tokenCount(text)
    val letters = length(regexp_replace(text, "[^\\p{L}]", ""))
    val lengthFactor = least(n.cast("double") / 200.0d, lit(1.0d))
    val letterRatio = when(n > 0, letters.cast("double") / n.cast("double")).otherwise(0.0d)
    val avgWordLen = when(words > 0, letters.cast("double") / words.cast("double")).otherwise(0.0d)
    val wordShape = when(avgWordLen.between(2.0d, 12.0d), 1.0d).otherwise(0.5d)
    round(lengthFactor * letterRatio * wordShape, 4)
  }

  // Tiny per-language stopword profiles — the classic cheap lang-ID
  // heuristic (top function words are near-disjoint across languages).
  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "you", "not"),
    "de" -> Set("der", "die", "das", "und", "ist", "ich", "nicht", "ein", "mit", "für", "auf", "sie"),
    "fr" -> Set("le", "la", "les", "et", "est", "je", "pas", "une", "pour", "que", "dans", "vous"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "no", "una", "por", "que", "para", "con"),
    "it" -> Set("il", "la", "di", "che", "e", "un", "per", "non", "sono", "con", "una", "mi"),
    "pt" -> Set("o", "a", "de", "que", "e", "não", "um", "uma", "para", "com", "os", "as")
  )

  /** Stopword-vote language ID with a CJK/Cyrillic/etc. script check
    * first. Unknown/ambiguous → "und". Deterministic, dictionary is
    * compiled into the closure (tiny — no broadcast needed). */
  val langIdFn: String => String = { text =>
    if (text == null || text.isEmpty) "und"
    else {
      var han = 0; var kana = 0; var hangul = 0; var cyr = 0; var arab = 0; var letters = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        if (Character.isLetter(c)) {
          letters += 1
          val block = Character.UnicodeScript.of(c)
          block match {
            case Character.UnicodeScript.HAN => han += 1
            case Character.UnicodeScript.HIRAGANA | Character.UnicodeScript.KATAKANA => kana += 1
            case Character.UnicodeScript.HANGUL => hangul += 1
            case Character.UnicodeScript.CYRILLIC => cyr += 1
            case Character.UnicodeScript.ARABIC => arab += 1
            case _ =>
          }
        }
        i += 1
      }
      if (letters == 0) "und"
      else if (kana * 2 > letters) "ja"
      else if (han * 2 > letters) "zh"
      else if (hangul * 2 > letters) "ko"
      else if (cyr * 2 > letters) "ru"
      else if (arab * 2 > letters) "ar"
      else {
        val tokens = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
        if (tokens.isEmpty) "und"
        else {
          var best = "und"; var bestScore = 0
          for ((lang, stops) <- profiles) {
            val score = tokens.count(stops.contains)
            if (score > bestScore) { bestScore = score; best = lang }
          }
          // demand minimal evidence: ≥2 stopword hits or ≥5% of tokens
          if (bestScore >= 2 || bestScore * 20 >= tokens.length && bestScore > 0) best else "und"
        }
      }
    }
  }

  def langId(text: Column): Column = udf(langIdFn).apply(text)

  /** Closed-form fixtures for the exact-regime lang-ID oracle
    * (`lang_id_exact`): each text is SCRIPT-PURE (the CJK/Cyrillic/Arabic
    * rows are 100 % their script, so the `count*2 > letters` majority
    * check is trivially decided) or STOPWORD-DISJOINT (the Latin rows use
    * only stopwords that appear in exactly ONE language's profile — e.g.
    * "que" (fr∩es∩pt) and "para" (es∩pt) are excluded — so the vote has
    * a unique winner with ≥ 7 hits, far past the ≥ 2 evidence bar, and
    * the Map-iteration tie rule can never engage). The last row has no
    * letters at all → "und". Classification is therefore closed-form in
    * the fixture index, which is what lets DuckDB state the answer by
    * arithmetic while the Spark side earns it through the real
    * classifier. Order is the oracle contract: index i ↔ label i. */
  private[graft] val langIdFixtures: IndexedSeq[(String, String)] = IndexedSeq(
    "en" -> "the and of to in is that it was for the and of to",
    "de" -> "der die das und ist ich nicht ein mit sie der und",
    "fr" -> "le les et est je pas pour dans vous le et est",
    "es" -> "el los las y es no por el los las y por",
    "it" -> "il di che un per non sono mi il di che per",
    "pt" -> "o de um uma os as com o de um uma as",
    "ja" -> "これはかなとカタカナのテストです",
    "zh" -> "中文文本測試漢字內容全部都是漢字",
    "ko" -> "한국어 텍스트 테스트 문장 입니다",
    "ru" -> "русский текст проверка кириллица слова",
    "ar" -> "نص عربي اختبار كلمات حروف",
    "und" -> "12345 67890 --- !!! 000")

  /** BPE-ish subword pre-tokenization count: letter runs, digit runs, and
    * single non-alphanumeric symbols — the shape of GPT-style pre-token
    * regexes, restricted to constructs RE2 and java.util.regex evaluate
    * identically so the DuckDB oracle states the same definition. The
    * chars-per-token ratio is the usual quick sanity stat for token-budget
    * estimation over a corpus. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]"), lit(0)))

  /** Gopher-style rule-based quality filter flags (Rae et al. '21 shape):
    * each rule is an independently-reported boolean so downstream can
    * re-weigh, plus the conjunction. All rules are plain SQL expressions
    * (oracle-replicable); thresholds are the conventional ones adapted to
    * word-level stats:
    *  - `ok_nwords`:   30 ≤ whitespace-word count ≤ 50000
    *  - `ok_wordlen`:  mean letters-per-word in [2, 12]
    *  - `ok_symbols`:  non-letter, non-whitespace chars < 10% of text
    *  - `ok_stopwords`: contains ≥2 distinct common function words
    * Output: (id, n_words, the four flags, passes). */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nWords = wsTokenCount(t).cast("bigint")
    val letters = length(regexp_replace(t, "[^\\p{L}]", "")).cast("double")
    val symbols = length(regexp_replace(t, "[\\p{L}\\s]", "")).cast("double")
    val meanWordLen = when(nWords > 0, letters / nWords.cast("double")).otherwise(0.0d)
    val stopHits = (0 until stopProbe.length)
      .map(i => when(t.rlike("\\b" + stopProbe(i) + "\\b"), 1).otherwise(0))
      .reduce(_ + _)
    df.select(
      col(idCol),
      nWords.as("n_words"),
      nWords.between(30, 50000).as("ok_nwords"),
      meanWordLen.between(2.0d, 12.0d).as("ok_wordlen"),
      (when(length(t) > 0, symbols / length(t).cast("double")).otherwise(0.0d) < 0.1d)
        .as("ok_symbols"),
      (stopHits >= 2).as("ok_stopwords"))
      .withColumn("passes",
        col("ok_nwords") && col("ok_wordlen") && col("ok_symbols") && col("ok_stopwords"))
  }

  /** Function words probed by the stopword rule (word-boundary regex —
    * identical semantics in java.util.regex and RE2/DuckDB). */
  val stopProbe: Seq[String] = Seq("the", "a", "and", "of", "to", "in")

  /** Unicode NFC normalization — the standard first step of text
    * curation (combining-mark sequences, compatibility variants and
    * precomposed forms must agree before any hashing/dedup/shingling,
    * or "é" ≠ "é" splits identical documents). Per-row JDK normalizer
    * (no expression form exists); null-in → null-out. */
  def nfcNormalize(text: Column): Column = udf { (s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }.apply(text)

  /** Deflate compressibility ratio (compressed/raw bytes, level 6) — the
    * redundancy signal the Gopher/RefinedWeb pipelines use next to the
    * duplicate-k-gram fraction: boilerplate and template spam compress
    * far below natural prose. Pure per-row CPU (zlib on ≤ doc-size
    * buffers), no shuffle, deterministic for a fixed zlib — but NOT
    * SQL-expressible, so its query is rows-only checked and the known-
    * answer tests live in OperatorsSpec. Null/empty → 1.0 (incompressible
    * by convention, keeps the filter monotone). */
  def compressRatio(text: Column): Column = udf { (s: String) =>
    if (s == null || s.isEmpty) 1.0d
    else {
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val d = new java.util.zip.Deflater(6)
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      d.end()
      math.round(total.toDouble / bytes.length * 10000) / 10000.0d
    }
  }.apply(text)

  /** Document fingerprint: cryptographic (md5) and rolling (FNV-1a 64). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // null-in -> null-out like md5 (String UDF params are not
    // auto-null-checked; fnv1a64(null).getBytes would NPE)
    val fnv = udf((s: String) =>
      if (s == null) null else java.lang.Long.valueOf(graft.functions.GraftFunctions.fnv1a64(s)))
    df.select(col(idCol), md5(col(textCol)).as("md5"),
      fnv(col(textCol)).as("fnv1a64"))
  }

  /** Per-document stats bundle (all SQL-expressible for oracle parity).
    * Counts are widened to bigint: SQL engines (and the DuckDB oracle)
    * type length()/len() as BIGINT, Spark as INT. */
  def textStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      length(t).cast("bigint").as("n_chars"),
      tokenCount(t).cast("bigint").as("n_tokens"),
      wsTokenCount(t).cast("bigint").as("n_ws_tokens"),
      length(regexp_replace(t, "[^\\p{L}]", "")).cast("bigint").as("n_letters"),
      qualityScore(t).as("quality"))
  }
}
