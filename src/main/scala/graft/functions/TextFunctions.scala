package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline.
  *
  * All of these are compositions of built-in (codegen'd) functions —
  * no UDFs — so they inline into WholeStageCodegen and scale linearly.
  * Each has an ANSI-SQL twin used by the DuckDB oracle (SparkEntry), so
  * the exact formulas here are part of the contract.
  */
object TextFunctions {

  /** Canonical text normalization: lowercase, collapse whitespace, trim. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Document fingerprint: md5 of the normalized text. Engine-portable
    * (md5 is identical everywhere), used for exact dedup at scale —
    * grouping on a 128-bit digest instead of the full text keeps shuffle
    * rows small. */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** Whitespace tokenization. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Engine-portable feature-hash bucket in [0, n): first 48 bits of
    * md5 mod n — the same digest [[graft.operators.Sampling.hashUnit]]
    * uses, so the DuckDB twin is
    * `CAST(('0x' || substring(md5(x),1,12)) AS BIGINT) % n`. The basis
    * of the hashed bag-of-ngrams feature space (DSIR, fastText-class
    * classifiers): a FIXED n-sized feature domain independent of vocab
    * size, so model/weight tables are bounded and broadcastable at any
    * corpus scale. */
  def hashBucket(c: Column, n: Int): Column =
    graft.functions.expr.Md5Bucket(c, n)

  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(tokens(c)))

  /** A BPE-ish subword proxy: count of alternating letter/digit runs —
    * `[a-z]+|[0-9]+|[^a-z0-9\s]` matches over normalized text. */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(normalizeText(c), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Word n-gram shingles over whitespace tokens (n ≥ 1): space-joined
    * n-grams; documents shorter than n tokens get their whole token
    * sequence as a single shingle. Native codegen'd expression
    * ([[graft.functions.expr.WordShingles]]). */
  def wordShingles(c: Column, n: Int): Column =
    graft.functions.expr.WordShingles(tokens(normalizeText(c)), n, distinct = false)

  /** Distinct shingle set (order-insensitive) — the unit of Jaccard. */
  def shingleSet(c: Column, n: Int): Column =
    graft.functions.expr.WordShingles(tokens(normalizeText(c)), n, distinct = true)

  // ---- quality / stats ------------------------------------------------

  /** ASCII punctuation count (explicit class — identical semantics in
    * Java regex and RE2, so the oracle can mirror it). */
  def punctCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[.,;:!?'\"()\\[\\]{}-]"), lit(0)))

  def digitCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[0-9]"), lit(0)))

  def upperCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Z]"), lit(0)))

  val StopWords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** How many tokens are stopwords (multiset count). */
  def stopwordCount(c: Column): Column = {
    val toks = tokens(normalizeText(c))
    size(filter(toks, t => t.isin(StopWords: _*)))
  }

  /** Composite quality score in [0,1]: penalizes punctuation/digit load,
    * rewards stopword presence (natural-language-ness) and length.
    * Fixed formula — mirrored in the oracle SQL. */
  def qualityScore(c: Column): Column = {
    val len = length(c).cast("double")
    val nTok = tokenCount(c).cast("double")
    val punctR = punctCount(c) / greatest(len, lit(1.0))
    val digitR = digitCount(c) / greatest(len, lit(1.0))
    val stopR = stopwordCount(c) / greatest(nTok, lit(1.0))
    val lenScore = least(len / lit(500.0), lit(1.0))
    round(
      greatest(lit(0.0), least(lit(1.0),
        lit(0.4) * lenScore + lit(0.4) * least(stopR * lit(4.0), lit(1.0)) +
          lit(0.2) * (lit(1.0) - least((punctR + digitR) * lit(5.0), lit(1.0))))),
      6)
  }

  // ---- language ID ----------------------------------------------------

  /** Marker-word sets per language for the stopword-hit heuristic. The
    * t24 oracle SQL is GENERATED from this seq (SparkEntry.oracleSql),
    * so edits here propagate to both engines automatically. ASCII-only
    * function words; overlaps across Romance languages are expected —
    * the argmax over full sets still separates, and ties break by seq
    * order. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to", "in", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "una", "por", "con", "para"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "une", "dans", "pour", "aux"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "eine", "von"),
    "it" -> Seq("il", "la", "che", "di", "per", "una", "con", "del", "sono", "non"),
    "pt" -> Seq("de", "que", "em", "um", "para", "com", "uma", "dos", "mais", "como"),
  )

  /** Heuristic language ID: argmax over marker-word hit counts with a
    * deterministic preference order (ties → earlier entry in
    * `LangMarkers`; zero hits everywhere → "und").
    *
    * HONESTY NOTE — this is a marker-WORD heuristic, not a language
    * model: it covers exactly the `LangMarkers` languages (6), needs
    * whitespace-tokenizable ASCII-ish text, and returns "und" for
    * everything else (CJK, Arabic, short strings, code). It exists to
    * exercise the classify-and-aggregate PLAN SHAPE with an exactly
    * mirrorable oracle; swap in a real char-n-gram model (fastText
    * class) behind the same Column signature for production quality. */
  def langId(c: Column): Column = {
    val toks = tokens(normalizeText(c))
    val scores = LangMarkers.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words: _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val expr = LangMarkers.reverse.foldLeft(lit("und")) { case (acc, (lang, _)) =>
      val sc = scores.find(_._1 == lang).get._2
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
    expr
  }

  // ---- PII redaction --------------------------------------------------

  /** Redaction patterns, applied in this order (email first — its local
    * part may contain digit runs that the NUM rule would otherwise eat).
    * Explicit ASCII classes + `\b`/`{m,n}` only: identical semantics in
    * Java regex and RE2, so the DuckDB oracle mirrors them verbatim. */
  val PiiRules: Seq[(String, String)] = Seq(
    """[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}""" -> "[EMAIL]",
    """\b\d{1,3}(\.\d{1,3}){3}\b""" -> "[IP]",
    """\d{7,}""" -> "[NUM]")

  /** Scrub emails / IPv4s / long digit runs (phone-ish ids) — the
    * pre-training privacy pass. One narrow codegen'd map; order fixed. */
  def redactPii(c: Column): Column =
    PiiRules.foldLeft(c) { case (acc, (pat, repl)) => regexp_replace(acc, pat, repl) }

  // ---- repetition / boilerplate signals (Gopher-style rules) ----------

  /** Duplicate word-`n`-gram fraction in ppm: 1 − |distinct|/|all| —
    * the intra-document repetition signal used by Gopher/C4-class
    * quality filters (high ⇒ boilerplate or looping text). */
  def dupShingleFracPpm(c: Column, n: Int): Column = {
    val all = size(wordShingles(c, n)).cast("double")
    val dis = size(shingleSet(c, n)).cast("double")
    floor((lit(1.0) - dis / greatest(all, lit(1.0))) * 1e6).cast("long")
  }

  /** Mean token length in ppm (Gopher bounds flag machine-generated or
    * OCR-noise text via extreme mean word length). */
  def meanWordLenPpm(c: Column): Column = {
    val toks = tokens(normalizeText(c))
    val total = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    floor(total.cast("double") / greatest(size(toks).cast("double"), lit(1.0)) * 1e6).cast("long")
  }

  /** Punctuation-per-token in ppm (symbol-to-word ratio). */
  def punctPerTokenPpm(c: Column): Column =
    floor(punctCount(c).cast("double") /
      greatest(tokenCount(c).cast("double"), lit(1.0)) * 1e6).cast("long")

  // ---- URLs ------------------------------------------------------------

  /** URL host pattern (scheme + host, group 1 = host). Explicit ASCII
    * classes only — identical semantics in Java regex and RE2, so the
    * DuckDB oracle mirrors it verbatim (same contract as [[PiiRules]]). */
  val UrlHostPattern: String = """https?://([a-zA-Z0-9.-]+)"""

  /** All URL hosts in a text column (array; host = up to the first
    * character outside [a-zA-Z0-9.-], i.e. path/query excluded). */
  def urlHosts(c: Column): Column =
    regexp_extract_all(c, lit(UrlHostPattern), lit(1))

  // ---- hashing --------------------------------------------------------

  /** Seeded 64-bit shingle hash used by MinHash/SimHash signatures.
    * xxhash64 is Spark-native and codegen'd; the seed folds in via
    * concat so one expression family serves all signature positions. */
  def seededHash(c: Column, seed: Int): Column =
    xxhash64(concat(lit(s"s$seed:"), c))
}
