package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Full-text search: inverted-index DataFrame + tf-idf cosine ranking.
  *
  * Reference: /root/reference/bigdata/src/java/com/bigdata/search/
  * FullTextIndex.java:240 — token→(docId, weight) postings in a B+Tree with
  * cosine relevance (:892-897), minCosine/maxRank slicing, exposed through
  * the `bds:search` magic predicates (rdf/store/BDS.java:94-143). Here the
  * postings are a DataFrame and scoring is one join + aggregation.
  *
  * Weights: w(t,d) = (1 + ln tf) · ln(N / df); scores are cosine similarity
  * between the query vector and document vector, rounded to 6 decimals for
  * cross-engine determinism; rank assigned over (score desc, doc asc).
  *
  * Scale posture: the index is partitioned by term (the posting-list key);
  * a query broadcasts its handful of terms against the postings — one
  * shuffle-free scan plus a small aggregation keyed by doc.
  */
object FullText {

  /** Configurable analyzer — the reference's language-aware tokenization
    * surface (DefaultAnalyzerFactory.java: per-language Lucene analyzers)
    * as a pure Column pipeline: split pattern, case folding, stopwords,
    * minimum token length, and CJK bigram shingling (the CJKAnalyzer
    * strategy: Han runs have no word boundaries, so overlapping bigrams
    * stand in for words).
    */
  final case class Analyzer(
      splitPattern: String = "[^a-z0-9]+",
      foldCase: Boolean = true,
      stopwords: Set[String] = Set.empty,
      minTokenLen: Int = 1,
      cjkBigrams: Boolean = false,
      // minimal English plural stemmer (Lucene EnglishMinimalStemFilter):
      // strip a final 's' from tokens of length ≥4 unless they end in
      // 'ss'/'us'/'is' — cheap, no dictionary, catches the common plural
      stem: Boolean = false,
      // language-specific minimal stemming as ordered suffix rules
      // (longest-first; FIRST matching rule applies): (suffix, replacement)
      // pairs in the style of Lucene's per-language *MinimalStemFilter /
      // *LightStemFilter families the reference wires up per language
      // (DefaultAnalyzerFactory.java:186-360). A rule fires only when the
      // stemmed result keeps at least `stemMinLen` characters.
      stemRules: Seq[(String, String)] = Nil,
      stemMinLen: Int = 3,
      // per-token character folds applied AFTER the stopword filter and
      // BEFORE the stem rules (Snowball's prelude/postlude: German ß→ss
      // and umlaut removal, Russian ё→е) — stopword lists keep their
      // natural orthography, stem suffixes match the folded form
      charFolds: Seq[(String, String)] = Nil)

  object Analyzer {
    /** ASCII default — byte-compatible with the original index. */
    val default: Analyzer = Analyzer()

    /** Unicode letters/digits: non-Latin scripts tokenize correctly. */
    val unicode: Analyzer = Analyzer(splitPattern = "[^\\p{L}\\p{N}]+")

    /** English with a minimal stopword list. */
    val english: Analyzer = Analyzer(stopwords = Set(
      "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
      "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
      "that", "the", "their", "then", "there", "these", "they", "this",
      "to", "was", "will", "with"))

    /** CJK: unicode split + Han-run bigram shingles. */
    val cjk: Analyzer = unicode.copy(cjkBigrams = true)

    // heads of the standard per-language stopword lists + minimal suffix
    // stemmers (the reference serves Lucene's GermanAnalyzer/
    // FrenchAnalyzer/RussianAnalyzer etc. — DefaultAnalyzerFactory
    // .java:186-360 wires Brazilian/Chinese/CJK/Czech/Dutch/German/Greek/
    // French/Russian/Thai; the rules below are the corresponding
    // *MinimalStemFilter-style plural/inflection strippers)
    // German at Snowball grade (the snowball german2 algorithm's shape,
    // flattened to one ordered longest-first pass): prelude/postlude char
    // folds (ß→ss, umlaut removal), the step-3 derivational suffixes
    // (lich/isch/ig/ung/heit/keit/end — including the fused lich+keit and
    // ig+keit forms one-pass application needs spelled out), then the
    // step-1/2 inflectional endings. stemMinLen approximates the R1
    // region bound.
    val german: Analyzer = unicode.copy(stopwords = Set(
      "der", "die", "das", "und", "oder", "ein", "eine", "ist", "nicht",
      "mit", "von", "zu", "im", "den", "auf", "für", "des", "dem"),
      charFolds = Seq("ß" -> "ss", "ä" -> "a", "ö" -> "o", "ü" -> "u"),
      stemRules = Seq(
        "lichkeiten" -> "", "igkeiten" -> "", "lichkeit" -> "",
        "igkeit" -> "", "keiten" -> "", "heiten" -> "",
        "ischen" -> "", "ischer" -> "", "isches" -> "", "ische" -> "",
        "lichen" -> "", "licher" -> "", "liches" -> "", "liche" -> "",
        "ungen" -> "", "enden" -> "", "endes" -> "", "ende" -> "",
        "keit" -> "", "heit" -> "", "isch" -> "", "lich" -> "",
        "igen" -> "", "iger" -> "", "iges" -> "", "ige" -> "",
        "ung" -> "", "end" -> "", "ern" -> "", "em" -> "", "en" -> "",
        "er" -> "", "es" -> "", "ig" -> "", "e" -> "", "st" -> "",
        "s" -> ""),
      stemMinLen = 4)
    // French at light-stemmer grade (Snowball french step-1 derivational
    // suffixes + step-2/3 verb and residual endings, flattened longest-
    // first; equivalence-class replacements — euse(s)→eu, ence(s)→ent,
    // ive(s)→if, aux→al — keep inflected pairs on one stem)
    val french: Analyzer = unicode.copy(stopwords = Set(
      "le", "la", "les", "un", "une", "des", "et", "ou", "est", "ne",
      "pas", "dans", "sur", "avec", "du", "de", "ce", "que", "qui"),
      stemRules = Seq(
        "issements" -> "", "issement" -> "",
        "atrices" -> "", "atrice" -> "", "ateurs" -> "", "ateur" -> "",
        "ations" -> "", "ation" -> "", "logies" -> "log", "logie" -> "log",
        "ements" -> "", "ement" -> "",
        "euses" -> "eu", "euse" -> "eu",
        "ismes" -> "", "isme" -> "", "istes" -> "", "iste" -> "",
        "ances" -> "", "ance" -> "", "ences" -> "ent", "ence" -> "ent",
        "ités" -> "", "ité" -> "", "ives" -> "if", "ive" -> "if",
        "eaux" -> "eau", "aux" -> "al", "eux" -> "eu",
        "ées" -> "", "ée" -> "", "és" -> "", "é" -> "",
        "er" -> "", "ez" -> "",
        "x" -> "", "s" -> "", "e" -> ""),
      stemMinLen = 4)
    // Spanish/Portuguese/Italian/Dutch at the same light-stemmer grade:
    // derivational suffixes (miento/idade/zione/heid families), common
    // verb endings, and gendered plural pairs spelled out so singular and
    // plural land on ONE stem under single-pass application (os/as before
    // the bare s)
    val spanish: Analyzer = unicode.copy(stopwords = Set(
      "el", "la", "los", "las", "un", "una", "y", "o", "es", "no", "en",
      "con", "de", "del", "por", "para", "que", "se"),
      stemRules = Seq(
        "amientos" -> "", "imientos" -> "", "amiento" -> "", "imiento" -> "",
        "ciones" -> "ción", "idades" -> "", "idad" -> "",
        "ieron" -> "", "aron" -> "", "ando" -> "", "iendo" -> "",
        "aban" -> "", "aba" -> "", "ían" -> "", "ía" -> "",
        "ar" -> "", "er" -> "", "ir" -> "",
        "os" -> "", "as" -> "", "es" -> "", "s" -> "", "o" -> "",
        "a" -> "", "e" -> ""),
      stemMinLen = 4)
    val portuguese: Analyzer = unicode.copy(stopwords = Set(
      "o", "a", "os", "as", "um", "uma", "e", "ou", "de", "do", "da",
      "em", "no", "na", "que", "não", "por", "para", "com"),
      stemRules = Seq(
        "amentos" -> "", "imentos" -> "", "amento" -> "", "imento" -> "",
        "idades" -> "", "idade" -> "",
        "ções" -> "ção", "ões" -> "ão", "ães" -> "ão",
        "aram" -> "", "eram" -> "", "ando" -> "", "endo" -> "",
        "indo" -> "", "ava" -> "",
        "ar" -> "", "er" -> "", "ir" -> "",
        "os" -> "", "as" -> "", "es" -> "", "s" -> "", "a" -> "",
        "o" -> "", "e" -> ""),
      stemMinLen = 4)
    val italian: Analyzer = unicode.copy(stopwords = Set(
      "il", "lo", "la", "i", "gli", "le", "un", "una", "e", "o", "di",
      "del", "che", "in", "con", "per", "non", "è"),
      stemRules = Seq(
        "amenti" -> "", "amento" -> "", "imenti" -> "", "imento" -> "",
        "zioni" -> "zion", "zione" -> "zion", "mente" -> "", "ità" -> "",
        "ando" -> "", "endo" -> "", "are" -> "", "ere" -> "", "ire" -> "",
        "e" -> "", "i" -> "", "o" -> "", "a" -> ""),
      stemMinLen = 4)
    val dutch: Analyzer = unicode.copy(stopwords = Set(
      "de", "het", "een", "en", "of", "van", "in", "op", "met", "dat",
      "die", "is", "niet", "te", "voor"),
      stemRules = Seq(
        "heden" -> "heid", "ingen" -> "ing", "eren" -> "",
        "tje" -> "", "je" -> "",
        "en" -> "", "e" -> "", "s" -> ""),
      stemMinLen = 4)
    // Russian at Snowball grade, flattened: ё→е fold, then one ordered
    // longest-first pass over the Snowball russian suffix classes —
    // derivational (ость), reflexive verb compounds (ется/лась/ться…,
    // spelled out because a single pass can't strip ся/сь then recurse),
    // participles/gerunds, adjectival, verb, and noun endings
    val russian: Analyzer = unicode.copy(stopwords = Set(
      "и", "в", "не", "на", "с", "что", "это", "он", "она", "они", "как",
      "но", "по", "из", "у", "за", "от", "для"),
      charFolds = Seq("ё" -> "е"),
      stemRules = Seq(
        "остью" -> "", "остей" -> "", "ости" -> "", "ость" -> "",
        "ировать" -> "", "ировал" -> "", "ируют" -> "", "ирует" -> "",
        "ывшись" -> "", "ившись" -> "", "вшись" -> "",
        "аться" -> "", "иться" -> "", "ется" -> "", "ются" -> "",
        "ится" -> "", "ятся" -> "", "ться" -> "",
        "лась" -> "", "лось" -> "", "лись" -> "", "лся" -> "",
        "ся" -> "", "сь" -> "",
        "ейший" -> "", "ейшая" -> "", "ейшее" -> "", "ейше" -> "",
        "иями" -> "", "ями" -> "", "ами" -> "",
        "ующ" -> "", "ивш" -> "", "ывш" -> "",
        "ого" -> "", "его" -> "", "ому" -> "", "ему" -> "",
        "ыми" -> "", "ими" -> "",
        "иях" -> "", "иям" -> "", "ией" -> "",
        "ешь" -> "", "ишь" -> "", "ует" -> "", "уют" -> "",
        "ить" -> "", "ыть" -> "", "ать" -> "", "ять" -> "",
        "ете" -> "", "ите" -> "",
        "ах" -> "", "ях" -> "", "ов" -> "", "ев" -> "",
        "ый" -> "", "ий" -> "", "ой" -> "", "ей" -> "",
        "ая" -> "", "яя" -> "", "ое" -> "", "ее" -> "",
        "ые" -> "", "ие" -> "", "их" -> "", "ых" -> "",
        "ую" -> "", "юю" -> "", "ом" -> "", "ем" -> "",
        "ам" -> "", "ям" -> "", "ия" -> "", "ья" -> "", "ье" -> "",
        "ью" -> "", "ет" -> "", "ит" -> "", "ют" -> "", "ят" -> "",
        "ли" -> "", "ла" -> "", "ло" -> "", "ны" -> "", "на" -> "",
        "но" -> "", "ть" -> "",
        "ы" -> "", "и" -> "", "а" -> "", "я" -> "", "у" -> "",
        "ю" -> "", "е" -> "", "о" -> "", "ь" -> "", "й" -> ""),
      stemMinLen = 4)
    // Czech at the CzechStemmer grade (the light stemmer CzechAnalyzer
    // wires, lucene analyzers/cz/CzechStemmer: remove possessives ův/ov/in,
    // then case endings longest-first, with palatalization folded in as
    // fused suffix rewrites ce/ci/če/či→k, ze/zi/že/ži→h)
    val czech: Analyzer = unicode.copy(stopwords = Set(
      "a", "v", "na", "je", "se", "že", "s", "z", "do", "o", "i", "to",
      "ale", "pro", "za"),
      stemRules = Seq(
        "atech" -> "", "atům" -> "", "ětem" -> "", "etem" -> "",
        "ého" -> "", "ému" -> "", "ěmi" -> "", "emi" -> "", "ete" -> "",
        "eti" -> "", "iho" -> "", "ího" -> "", "ími" -> "", "imu" -> "",
        "ách" -> "", "ata" -> "", "aty" -> "", "ých" -> "", "ama" -> "",
        "ami" -> "", "ové" -> "", "ovi" -> "", "ými" -> "",
        "ech" -> "", "ich" -> "", "ích" -> "",
        "ům" -> "", "ám" -> "", "em" -> "", "es" -> "", "ém" -> "",
        "ím" -> "", "at" -> "", "os" -> "", "us" -> "", "ým" -> "",
        "mi" -> "", "ou" -> "", "ův" -> "", "ov" -> "", "in" -> "",
        "ce" -> "k", "ci" -> "k", "če" -> "k", "či" -> "k",
        "ze" -> "h", "zi" -> "h", "že" -> "h", "ži" -> "h",
        "á" -> "", "é" -> "", "í" -> "", "ě" -> "", "ů" -> "", "ý" -> "",
        "a" -> "", "e" -> "", "i" -> "", "o" -> "", "u" -> "", "y" -> ""),
      stemMinLen = 4)
    // Greek at the GreekStemmer grade: GreekLowerCaseFilter's accent
    // removal + final-sigma normalization as char folds, then the
    // -ματα/-ματων family (→ μ so plural and singular meet at one stem),
    // verb endings, and noun/adjective case endings longest-first
    val greek: Analyzer = unicode.copy(stopwords = Set(
      "ο", "η", "το", "οι", "τα", "και", "σε", "με", "για", "από", "που",
      "δεν", "να", "είναι"),
      charFolds = Seq("ά" -> "α", "έ" -> "ε", "ή" -> "η", "ί" -> "ι",
                      "ό" -> "ο", "ύ" -> "υ", "ώ" -> "ω", "ϊ" -> "ι",
                      "ϋ" -> "υ", "ΐ" -> "ι", "ΰ" -> "υ", "ς" -> "σ"),
      stemRules = Seq(
        "ματων" -> "μ", "ματοσ" -> "μ", "ματα" -> "μ",
        "οντασ" -> "", "ωντασ" -> "",
        "ουμε" -> "", "ειτε" -> "", "ονται" -> "", "εται" -> "",
        "ουνε" -> "",
        "ιων" -> "", "εων" -> "",
        "ουν" -> "", "εισ" -> "", "ετε" -> "",
        "ουσ" -> "", "εσ" -> "", "ασ" -> "", "ησ" -> "", "οσ" -> "",
        "ων" -> "", "ου" -> "", "οι" -> "", "αι" -> "", "ια" -> "",
        "ιο" -> "", "ει" -> "",
        "α" -> "", "η" -> "", "ο" -> "", "ι" -> "", "ε" -> "",
        "ω" -> "", "υ" -> ""),
      stemMinLen = 4)
    // Thai writes without inter-word spaces: like the Han case, segment
    // Thai-script runs into overlapping bigrams (the reference wires
    // Lucene's dictionary ThaiAnalyzer; bigram shingling is the
    // dictionary-free analogue, same recall shape as CJK)
    val thai: Analyzer = unicode.copy(cjkBigrams = true)

    /** Language-code → analyzer registry (DefaultAnalyzerFactory
      * .getAnalyzers:186 keyed by ISO code; the reference registers per-
      * language Lucene analyzers, we register Column-pipeline configs).
      */
    val byLang: Map[String, Analyzer] = Map(
      "en" -> english.copy(stem = true),
      "de" -> german, "fr" -> french, "es" -> spanish,
      "pt" -> portuguese, "it" -> italian, "nl" -> dutch,
      "ru" -> russian, "cs" -> czech, "el" -> greek, "th" -> thai,
      "zh" -> cjk, "ja" -> cjk, "ko" -> cjk)

    // ISO 639-2/3 → 639-1 fallback (getAnalyzer:105-123 tries the 3-letter
    // code, then the 2-letter code)
    private[search] val iso3to2: Map[String, String] = Map(
      "eng" -> "en", "deu" -> "de", "ger" -> "de", "fra" -> "fr",
      "fre" -> "fr", "spa" -> "es", "zho" -> "zh", "chi" -> "zh",
      "jpn" -> "ja", "kor" -> "ko", "por" -> "pt", "ita" -> "it",
      "nld" -> "nl", "dut" -> "nl", "rus" -> "ru", "ces" -> "cs",
      "cze" -> "cs", "ell" -> "el", "gre" -> "el", "tha" -> "th")

    /** Select the analyzer for a language tag: strip the region subtag
      * ("en-US" → "en"), map 3-letter codes down, fall back to the unicode
      * analyzer (the reference's StandardAnalyzer default,
      * DefaultAnalyzerFactory.getAnalyzer:75-123).
      */
    def forLang(langTag: String): Analyzer = {
      if (langTag == null || langTag.isEmpty) return unicode
      val primary = langTag.toLowerCase.takeWhile(c => c != '-' && c != '_')
      byLang.getOrElse(iso3to2.getOrElse(primary, primary), unicode)
    }
  }

  /** Tokenize with the default analyzer (lowercase, split on
    * non-alphanumerics, drop empties).
    */
  def tokens(text: Column): Column = tokens(text, Analyzer.default)

  /** Array stage ONLY (split + CJK/Thai bigram shingling) — the
    * higher-order array lambdas Spark cannot whole-stage-codegen
    * (ArrayTransform/ArrayFilter are CodegenFallback) are confined here;
    * the per-token stopword/fold/stem analysis is scalar (`keepToken` /
    * `analyzeToken`) so the posting builders, which explode immediately,
    * keep the hot per-token work inside codegen.
    */
  private def tokensRaw(text: Column, a: Analyzer): Column = {
    val folded = if (a.foldCase) lower(text) else text
    var toks = split(folded, a.splitPattern)
    if (a.cjkBigrams) {
      // a Han- or Thai-script run of length n becomes its n-1 overlapping
      // bigrams (a single char stays itself); other tokens pass through.
      // (Thai writes without spaces — bigram shingling is the
      // dictionary-free analogue of the reference's ThaiAnalyzer.)
      toks = flatten(transform(toks, t =>
        when(t.rlike("^(\\p{IsHan}{2,}|\\p{IsThai}{2,})$"),
             transform(sequence(lit(1), length(t) - 1), i => t.substr(i, lit(2))))
          .otherwise(array(t))))
    }
    toks
  }

  /** Scalar token admission: length bound + stopword filter, evaluated on
    * the RAW token (stopword lists keep natural orthography; folds apply
    * after, in analyzeToken). Codegen-friendly — no lambdas.
    */
  private[search] def keepToken(t: Column, a: Analyzer): Column = {
    val lenOk = length(t) >= math.max(1, a.minTokenLen)
    if (a.stopwords.isEmpty) lenOk
    else lenOk && !t.isInCollection(a.stopwords)
  }

  /** Scalar char folds + the minimal English plural stem. MUST be
    * materialized (own projection / own transform pass) before stemToken
    * runs: the suffix chain reads its input in every WHEN branch, and an
    * inlined fold would recompute the string replace per branch —
    * hundreds of allocations per token.
    */
  private[search] def foldToken(t0: Column, a: Analyzer): Column = {
    val t = a.charFolds.foldLeft(t0) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    if (!a.stem) t
    else when(length(t) >= 4 && t.endsWith("s") &&
              !t.endsWith("ss") && !t.endsWith("us") && !t.endsWith("is"),
              t.substr(lit(1), length(t) - 1)).otherwise(t)
  }

  /** Scalar ordered suffix rules over an ALREADY-folded token (FIRST
    * matching rule with a long-enough stem fires). One plain CASE
    * expression — codegen'd.
    */
  private[search] def stemToken(t: Column, a: Analyzer): Column =
    if (a.stemRules.isEmpty) t
    else a.stemRules.foldLeft(when(lit(false), t)) { case (acc, (sfx, repl)) =>
      acc.when(length(t) >= a.stemMinLen + sfx.length && t.endsWith(sfx),
               concat(t.substr(lit(1), length(t) - sfx.length), lit(repl)))
    }.otherwise(t)

  /** Tokenize per the analyzer config (array form — the same raw/keep/
    * fold/stem stages the scalar posting path uses, so the two cannot
    * drift). Two transform passes: the fold materializes per token
    * BEFORE the suffix chain reads it many times.
    */
  def tokens(text: Column, a: Analyzer): Column =
    transform(transform(filter(tokensRaw(text, a), t => keepToken(t, a)),
                        t => foldToken(t, a)),
              t => stemToken(t, a))

  /** Tokenize with the analyzer selected per row by its language tag — the
    * data-parallel form of Analyzer.forLang: one when-chain over the
    * registered languages, so a mixed-language corpus analyzes in a single
    * pass with no per-language splits or shuffles.
    */
  /** Registry analyzers grouped with ALL their 2- and 3-letter codes, so
    * each distinct analyzer appears once in a dispatch chain.
    */
  private lazy val langGroups: Seq[(Analyzer, Seq[String])] =
    Analyzer.byLang.toSeq.groupBy(_._2).toSeq.map {
      case (a, entries) =>
        val codes = entries.map(_._1) ++
          Analyzer.iso3to2.collect { case (c3, c2) if entries.exists(_._1 == c2) => c3 }
        (a, codes.distinct)
    }

  def tokensByLang(text: Column, lang: Column): Column = {
    val primary = lower(split(lang, "[-_]").getItem(0))
    langGroups.foldLeft(lit(null).cast(ArrayType(StringType))) { case (acc, (a, codes)) =>
      when(primary.isin(codes: _*), tokens(text, a)).otherwise(acc)
    } match {
      case chain => coalesce(chain, tokens(text, Analyzer.unicode))
    }
  }

  // NOTE on evaluation strategy, measured at sf0.01 (11365 postings):
  // a "scalar post-explode" variant of the posting pipeline — dispatching
  // keep/fold/stem per TOKEN through one all-languages CASE — ran 2-3×
  // SLOWER than this array form (1.4-1.8s vs 0.55-0.7s warm). The fused
  // CASE exceeds Janino's 64KB method limit ("grows beyond 64 KB" in the
  // logs), so whole-stage codegen falls back to interpreting one enormous
  // expression tree per token; the array form instead picks ONE
  // language's pipeline per document and materializes each stage's result
  // between the small lambda passes. Higher-order lambdas being
  // CodegenFallback is the cheaper of the two evils here — keep the
  // array form in the builders.

  /** Build the inverted index: (term, doc, tf, w) + per-doc norm.
    * `docs` needs columns (doc, text).
    */
  def buildIndex(docs: DataFrame): DataFrame = buildIndex(docs, Analyzer.default)

  def buildIndex(docs: DataFrame, analyzer: Analyzer): DataFrame =
    weigh(docs
      .select(col("doc"), explode(tokens(col("text"), analyzer)).as("term"))
      .groupBy("term", "doc").agg(count(lit(1)).as("tf")), docs.count())

  /** Inverted index over a mixed-language corpus: each document tokenizes
    * with the analyzer its `lang` column selects (the reference indexes
    * per-language-code fields the same way, FullTextIndex.java:240 +
    * DefaultAnalyzerFactory). `docs` needs (doc, text, lang).
    */
  def buildIndexByLang(docs: DataFrame): DataFrame =
    weigh(tfPostingsByLang(docs), docs.count())

  /** Raw (term, doc, tf) postings with per-language analysis. */
  def tfPostingsByLang(docs: DataFrame): DataFrame =
    docs.select(col("doc"),
                explode(tokensByLang(col("text"), col("lang"))).as("term"))
      .groupBy("term", "doc").agg(count(lit(1)).as("tf"))

  /** Postings matched by the query: exact terms by equality, trailing-'*'
    * terms by prefix. With `matchAll`, only documents matching EVERY query
    * term keep their postings (bds:matchAllTerms).
    */
  private def matchedPostings(index: DataFrame, terms: Seq[String],
                              matchAll: Boolean): DataFrame = {
    val (prefixes, exact) = terms.partition(_.endsWith("*"))
    val conds =
      exact.map(t => col("term") === t) ++
      prefixes.map(p => col("term").startsWith(p.stripSuffix("*")))
    // an empty query matches nothing (not everything): no postings
    val matched = index.filter(conds.reduceOption(_ || _).getOrElse(lit(false)))
    if (!matchAll) matched
    else {
      // which query pattern(s) a posting matched, for per-doc accounting
      val pat = (exact.map(t => (col("term") === t, t)) ++
                 prefixes.map(p => (col("term").startsWith(p.stripSuffix("*")), p)))
        .map { case (c, t) => when(c, t) }
      val tagged = matched.withColumn("qpat",
        explode(filter(array(pat: _*), _.isNotNull)))
      val full = tagged.groupBy("doc")
        .agg(count_distinct(col("qpat")).as("nmatched"))
        .filter(col("nmatched") === terms.size)
        .select("doc")
      tagged.join(full, "doc").select(index.columns.map(col): _*).distinct()
    }
  }

  /** Lucene's 8-bit norm quantization (Similarity.encodeNorm/decodeNorm,
    * SmallFloat "315": 3 significand bits counting the hidden bit), which
    * the reference bakes into every stored doc-term weight
    * (FullTextIndexTupleSerializer.java:126-134) — scores are only
    * reproducible through the same round-trip: keep the exponent and the
    * top TWO explicit mantissa bits, truncating the rest.
    */
  def luceneNormQuantize(x: Column): Column = {
    val e = floor(log2(x))
    val p = pow(lit(2.0), e)
    when(x <= 0.0, 0.0).otherwise(
      (lit(1.0) + floor((x / p - 1.0) * 4) / 4.0) * p)
  }

  /** The reference's own index weights (TermFrequencyData.normalize:119-140):
    * dw(t,d) = tf / sqrt(Σ_t tf²) — plain tf-cosine, NO idf — stored through
    * the Lucene norm quantization above.
    */
  def buildBdsIndex(docs: DataFrame, analyzer: Analyzer = Analyzer.default): DataFrame = {
    val tf = docs
      .select(col("doc"), explode(tokens(col("text"), analyzer)).as("term"))
      .groupBy("term", "doc").agg(count(lit(1)).as("tf"))
    val norm = tf.groupBy("doc").agg(sqrt(sum(col("tf") * col("tf"))).as("dmag"))
    tf.join(norm, "doc")
      .withColumn("w", luceneNormQuantize(col("tf") / col("dmag")))
      .select("term", "doc", "tf", "w")
  }

  /** Reference-faithful relevance (ReadIndexTask.java:162-189): score(d) =
    * Σ_t qw(t)·dw(t,d) with qw = qtf/sqrt(Σ qtf²) = 1/sqrt(|q|) for
    * distinct terms; dw is the quantized stored weight. Rank over
    * (score desc, doc) with minCosine/maxRank slicing as in `search`.
    *
    * The full BDS hit pipeline (FullTextIndex._search:1078-1290 + slice):
    * matchExact keeps hits whose materialized literal CONTAINS the exact
    * query string (BigdataValueCentricFullTextIndex.matchExact:390-456,
    * `stringValue().contains(query)`); matchRegex keeps hits the Java
    * regex FINDS in (applyRegex:461-530, `matcher.find()`). Both run
    * BEFORE ranking, so ranks number the exact/regex-filtered ordering.
    * Cosine bounds prune next; minRank/maxRank then take the positional
    * window [minRank, maxRank] of what remains (slice:1297-1430) —
    * surviving hits keep their pre-slice rank (Hit.setRank runs before
    * slice), so the first row of a minRank=5 query is rank 5, and a
    * maxCosine prune leaves the survivors' original ranks intact.
    */
  def searchBds(index: DataFrame, query: Seq[String], minCosine: Double = 0.0,
                maxRank: Int = Int.MaxValue, matchAll: Boolean = false,
                maxCosine: Double = 1.0, minRank: Int = 1,
                matchExact: Option[String] = None,
                matchRegex: Option[String] = None): DataFrame = {
    val terms = query.map(_.toLowerCase).distinct
    val qw = 1.0 / math.sqrt(terms.size.toDouble)
    var scored = matchedPostings(index, terms, matchAll)
      .groupBy("doc").agg(round(sum(col("w") * qw), 6).as("score"))
    matchExact.foreach(q => scored = scored.filter(col("doc").contains(q)))
    matchRegex.foreach(r => scored = scored.filter(col("doc").rlike(r)))
    val kept = scored.filter(col("score") >= minCosine &&
      (if (maxCosine < 1.0) col("score") <= maxCosine else lit(true)))
    val sliced = rankSlice(kept, maxRank, minRank)
    if (maxCosine < 1.0) {
      // minCosine prunes a SUFFIX of the (score desc) ordering, so ranks
      // are unaffected; a maxCosine prune removes a PREFIX — reported
      // ranks shift by the count of pruned higher-scoring hits (a 1-row
      // broadcast, keeping the TakeOrdered window path intact)
      val head = scored.agg(
        count(when(col("score") > maxCosine, 1)).as("__head"))
      sliced.crossJoin(head)
        .withColumn("rank", col("rank") + col("__head"))
        .select("doc", "score", "rank")
    } else sliced
  }

  /** Weight tf postings and ATTACH the per-doc cosine norm to every posting
    * row. Computing dnorm here — at BUILD time, once — is what lets
    * `search` score a query from the matched postings alone: the old
    * query-time `index.groupBy("doc")` norm pass re-aggregated the ENTIRE
    * index on every search (at a 100 TB postings table, an O(index) scan
    * per query). The per-row redundancy is free in parquet (dictionary/RLE
    * on a per-doc constant).
    */
  private def weigh(tf0: DataFrame, n: Long): DataFrame = {
    // materialize the postings once: they feed the df aggregation, the
    // weighting join AND (via `weighted`) the norm pass — as a plain plan
    // the tokenize+explode+count subtree re-executed for each reference
    // (the dominant cost of an index build; the checkpoint is the postings
    // relation itself, which the build is about to write out anyway)
    val tf = graft.util.Fixpoint.materialize(tf0)
    val df_ = tf.groupBy("term").agg(count_distinct(col("doc")).as("df"))
    val weighted = tf.join(df_, "term")
      .withColumn("w", (lit(1.0) + log(col("tf"))) * log(lit(n.toDouble) / col("df")))
    val norms = weighted.groupBy("doc").agg(sqrt(sum(col("w") * col("w"))).as("dnorm"))
    weighted.join(norms, "doc").select("term", "doc", "tf", "w", "dnorm")
  }

  /** Subject-centric index over an RDF store (reference:
    * BigdataSubjectCentricFullTextIndex): doc = subject term, text = all of
    * the subject's string-literal objects concatenated.
    */
  def buildSubjectIndex(quads: DataFrame): DataFrame = {
    import graft.rdf.Term
    val docs = quads
      .filter(col("c").isNull && Term.isLiteral(col("o")) &&
              (Term.dt(col("o")) === Term.XsdString || Term.dt(col("o")).isNull))
      .groupBy(Term.lex(col("s")).as("doc"))
      .agg(concat_ws(" ", sort_array(collect_list(Term.lex(col("o"))))).as("text"))
    buildIndex(docs)
  }

  /** Raw term-frequency postings (term, doc, tf) — the INCREMENTALLY
    * MAINTAINABLE index form: tf facts never change once written, so new
    * documents are a pure append (`appendDocs`), unlike the weighted
    * index where a shifting corpus size and df re-touch every posting.
    * Weights derive at query time (`searchTf`) from the handful of query
    * terms' postings — the maintenance story the reference gets from its
    * B+Tree postings + read-time relevance (FullTextIndex.java:892-897).
    */
  def buildTfIndex(docs: DataFrame, analyzer: Analyzer = Analyzer.default): DataFrame =
    docs.select(col("doc"), explode(tokens(col("text"), analyzer)).as("term"))
      .groupBy("term", "doc").agg(count(lit(1)).as("tf"))

  /** Merge new documents into a tf index (docs must be NEW ids; a re-fed
    * doc id would double-count — delete-then-append for updates).
    */
  def appendDocs(tfIndex: DataFrame, newDocs: DataFrame,
                 analyzer: Analyzer = Analyzer.default): DataFrame =
    tfIndex.unionByName(buildTfIndex(newDocs, analyzer))

  /** Incrementally-maintained statistics for the tf path: the pieces of
    * the tf-idf weight that depend on the WHOLE corpus — N (doc count, as
    * a distinct-doc table whose count is parquet metadata when persisted)
    * and per-term df — kept as small additive side tables so `searchTf`
    * never aggregates the full postings table to re-derive them per query.
    * Both are pure-additive under `appendDocs`' new-ids contract:
    * docs' = docs ∪ new ids; df' = df ⊎ new postings' df (summed).
    */
  final case class TfStats(df: DataFrame, docs: DataFrame)

  def buildTfStats(tfIndex: DataFrame): TfStats = TfStats(
    tfIndex.groupBy("term").agg(count_distinct(col("doc")).as("df")),
    tfIndex.select("doc").distinct())

  /** Fold a batch of NEW documents into the stats (same new-ids contract
    * as `appendDocs`): no posting is ever re-read — the increment derives
    * from the new batch alone.
    */
  def appendTfStats(stats: TfStats, newDocs: DataFrame,
                    analyzer: Analyzer = Analyzer.default): TfStats = {
    val newDf = buildTfIndex(newDocs, analyzer)
      .groupBy("term").agg(count_distinct(col("doc")).as("df"))
    TfStats(
      stats.df.unionByName(newDf).groupBy("term").agg(sum(col("df")).as("df")),
      stats.docs.unionByName(newDocs.select("doc")))
  }

  /** Search a tf index with query-time weighting: identical scoring to
    * `search` over `buildIndex` (w = (1+ln tf)·ln(N/df)), deriving df/N
    * at query time instead of storing weights — so the stored index never
    * needs rewriting as the corpus grows (the weighted form would
    * re-touch EVERY posting whenever N or any df moves).
    *
    * Every aggregation here is bounded by the MATCHED docs: postings are
    * term-filtered, the doc norm aggregates only the matched docs' rows
    * (a doc-keyed semi-join, not a full-index pass), and N/df come from
    * `stats` (pass the persisted tables; omitted, they derive inline —
    * correct but full-scan, for throwaway indexes only).
    */
  def searchTf(tfIndex: DataFrame, query: Seq[String], minCosine: Double = 0.0,
               maxRank: Int = Int.MaxValue, matchAll: Boolean = false,
               stats: Option[TfStats] = None): DataFrame = {
    val st = stats.getOrElse(buildTfStats(tfIndex))
    val terms = query.map(_.toLowerCase).distinct
    val n = st.docs.count()
    val matched = matchedPostings(tfIndex, terms, matchAll)
    val docsMatched = matched.select("doc").distinct()
    // full posting rows of ONLY the matched docs (dnorm needs every term
    // of a matched doc, nothing of unmatched docs), weighted via the df
    // side table — vocabulary-sized, never the postings
    val rows = tfIndex.join(docsMatched, "doc")
      .join(st.df, "term")
      .withColumn("w",
        (lit(1.0) + log(col("tf"))) * log(lit(n.toDouble) / col("df")))
    val (prefixes, exact) = terms.partition(_.endsWith("*"))
    val isMatch = (exact.map(t => col("term") === t) ++
      prefixes.map(p => col("term").startsWith(p.stripSuffix("*"))))
      .reduceOption(_ || _).getOrElse(lit(false))
    val qnorm = math.sqrt(terms.size.toDouble)
    val scored = rows.groupBy("doc").agg(
        sum(when(isMatch, col("w")).otherwise(lit(0.0))).as("dot"),
        sqrt(sum(col("w") * col("w"))).as("dnorm"))
      .withColumn("score", round(col("dot") / (col("dnorm") * qnorm), 6))
      .filter(col("score") >= minCosine)
    rankSlice(scored, maxRank)
  }

  /** BM25 ranking over a tf index (Robertson/Walker Okapi weighting with
    * the Lucene +1 idf floor): score(q,d) = Σ_t idf(t) · tf·(k1+1) /
    * (tf + k1·(1−b+b·dl/avgdl)), idf(t) = ln((N−df+0.5)/(df+0.5)+1).
    * The probabilistic-relevance counterpart of the reference's cosine
    * Hiterator surface (FullTextIndex.java:892) — same slicing contract.
    *
    * Scale posture mirrors `searchTf`: postings touch only the query
    * terms' lists; df/N come from the additive `stats` side tables and
    * per-document lengths from the `docLens` side table (doc, dl = Σtf) —
    * also pure-additive under `appendDocs`' new-ids contract — so no
    * full-index aggregation runs at query time (omitting either derives
    * it inline: correct but full-scan, for throwaway indexes only).
    * avgdl is an exact long-sum ratio, so scores replay in ANSI SQL.
    */
  def searchBm25(tfIndex: DataFrame, query: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75, maxRank: Int = Int.MaxValue,
                 matchAll: Boolean = false, stats: Option[TfStats] = None,
                 docLens: Option[DataFrame] = None): DataFrame = {
    val st = stats.getOrElse(buildTfStats(tfIndex))
    val terms = query.map(_.toLowerCase).distinct
    val n = st.docs.count()
    val dl = docLens.getOrElse(
      tfIndex.groupBy("doc").agg(sum(col("tf")).as("dl")))
    // exact: long sum / long count, two IEEE divisions — replayable
    val avgdl = dl.agg(
      (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl"))
    val matched = matchedPostings(tfIndex, terms, matchAll)
    val scored = matched.join(st.df, "term").join(dl, "doc")
      .crossJoin(broadcast(avgdl))
      .withColumn("idf",
        log((lit(n.toDouble) - col("df") + lit(0.5)) /
            (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            (lit(b) * col("dl")) / col("avgdl"))))
      .groupBy("doc").agg(round(sum(col("contrib")), 6).as("score"))
    rankSlice(scored, maxRank)
  }

  /** Search the index: cosine(query, doc) with minCosine/maxRank slicing
    * (Hiterator semantics). Query term weights are 1·idf (tf=1 per term).
    *
    * A query term ending in '*' is a PREFIX match (the reference's
    * FullTextQuery prefixMatch / trailing-wildcard surface, BDS.java);
    * `matchAll` keeps only documents matching every query term
    * (bds:matchAllTerms).
    */
  def search(index: DataFrame, query: Seq[String], minCosine: Double = 0.0,
             maxRank: Int = Int.MaxValue, matchAll: Boolean = false): DataFrame = {
    val terms = query.map(_.toLowerCase).distinct
    val qpost = matchedPostings(index, terms, matchAll)
    // query weight per term = idf = w(t,d)/(1+ln tf) is awkward to recover;
    // use the standard simplification: q vector has weight 1 per term, so
    // score = Σ_t w(t,d) / (dnorm · sqrt(|q|))
    val qnorm = math.sqrt(terms.size.toDouble)
    // dnorm comes straight off the matched postings when the index stores
    // it (buildIndex does, since round 5) — scoring then touches ONLY the
    // query terms' posting lists. The groupBy fallback (full-index norm
    // pass) remains for externally-built (term, doc, tf, w) indexes.
    val scored = (if (index.columns.contains("dnorm"))
      qpost.groupBy("doc").agg(sum(col("w")).as("dot"),
                               first(col("dnorm")).as("dnorm"))
    else {
      val docNorm = index.groupBy("doc")
        .agg(sqrt(sum(col("w") * col("w"))).as("dnorm"))
      qpost.groupBy("doc").agg(sum(col("w")).as("dot")).join(docNorm, "doc")
    })
      .withColumn("score", round(col("dot") / (col("dnorm") * qnorm), 6))
      .filter(col("score") >= minCosine)
    rankSlice(scored, maxRank)
  }

  /** Rank (score desc, doc) with maxRank slicing. Finite maxRank: global
    * top-k via orderBy+limit, which Spark executes as
    * TakeOrderedAndProject — each partition keeps its own k best and only
    * k rows ever reach the driver-side merge. The row_number window then
    * runs over ≤ maxRank rows, not the whole scored corpus (a global
    * unpartitioned window would funnel every scored document through one
    * task — the classic single-core rank bottleneck at scale).
    */
  private def rankSlice(scored: DataFrame, maxRank: Int,
                        minRank: Int = 1): DataFrame = {
    val w = Window.orderBy(col("score").desc, col("doc"))
    val sliced =
      if (maxRank != Int.MaxValue)
        scored.orderBy(col("score").desc, col("doc")).limit(maxRank)
      else scored
    val ranked = sliced.withColumn("rank", row_number().over(w).cast(LongType))
    // BDS minRank pagination: drop ranks below the window start; survivors
    // KEEP their rank (the reference assigns ranks before slicing)
    (if (minRank > 1) ranked.filter(col("rank") >= minRank) else ranked)
      .select("doc", "score", "rank")
  }
}
