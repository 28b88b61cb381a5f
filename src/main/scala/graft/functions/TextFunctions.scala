package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis + dedup primitives for the training-data pipeline surface:
  * token counting, quality scoring, language-ID heuristic, shingling,
  * MinHash signatures, SimHash. Everything here is built from codegen'd
  * `functions._` (no Scala closures in the hot path), designed so each stage
  * is a narrow projection that Catalyst can pipeline inside one
  * WholeStageCodegen span over a parquet scan.
  *
  * Integer arithmetic (`div`) is used for ratio features so results are
  * bit-stable across engines (DuckDB oracle parity) and partitionings.
  */
object TextFunctions {

  /** Whitespace token count; empty/blank → 0. Compiled single pass
    * ([[WsTokenCountExpr]]) with split-semantics parity; the HOF/regex
    * formulation below is the spec oracle.
    */
  def tokenCount(text: Column): Column = TextCountExprs.wsTokens(text)

  private[graft] def tokenCountRegex(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword token count: a GPT-2-style pre-tokenizer pattern
    * (contraction suffixes, space-prefixed letter runs, digit runs,
    * punctuation runs) — restricted to RE2-safe constructs (no lookahead)
    * so Java regex (Spark codegen) and RE2 (DuckDB oracle) count
    * identically. A far better LLM-token estimate than whitespace words:
    * "I'll say it's 42% done... maybe" → 10 vs 6 whitespace tokens.
    */
  val bpeTokenPattern = "'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeTokenPattern)).cast("long")

  /** Occurrences of a literal substring (exact integer math in any engine).
    * Compiled single-pass scan ([[CountOccurrencesExpr]], replace()
    * semantics); [[occurrencesReplace]] is the spec oracle.
    */
  def occurrences(text: Column, needle: String): Column =
    TextCountExprs.occurrences(text, needle)

  private[graft] def occurrencesReplace(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit("")))) / needle.length).cast("long")

  /** Per-mille (0–1000) ratio helpers — integer division, bit-stable. */
  def permille(part: Column, whole: Column): Column =
    when(whole === 0, lit(0L)).otherwise(floor((part * 1000L) / whole).cast("long"))

  // single-pass ASCII class counts ([[CharClassCountExpr]]); the
  // regexp_replace length-delta forms are the spec oracles
  def alphaCount(text: Column): Column = TextCountExprs.classCount(text, TextCountExprs.ClassAlpha)
  def digitCount(text: Column): Column = TextCountExprs.classCount(text, TextCountExprs.ClassDigit)
  def spaceCount(text: Column): Column = TextCountExprs.classCount(text, TextCountExprs.ClassSpace)
  def punctCount(text: Column): Column = TextCountExprs.classCount(text, TextCountExprs.ClassPunct)

  private[graft] def alphaCountRegex(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", ""))
  private[graft] def spaceCountRegex(text: Column): Column =
    length(regexp_replace(text, "[^ ]", ""))
  private[graft] def punctCountRegex(text: Column): Column =
    length(regexp_replace(text, "[^.,!?;:]", ""))

  /** Per-mille of characters that are punctuation (C4/Gopher-style signal:
    * heavy punctuation marks boilerplate/code, none marks run-on scrape).
    */
  def punctPermille(text: Column): Column = permille(punctCount(text), length(text))

  /** English stopword markers (space-delimited hits on the padded text,
    * mirroring [[langMarkers]]' counting) — the Gopher-style "has function
    * words" quality signal.
    */
  val stopwords: Seq[String] = Seq("the", "and", "of", "is", "to", "a", "in", "that")

  /** Per-mille of whitespace tokens that are stopwords. */
  def stopwordPermille(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val hits = stopwords.map(w => occurrences(padded, s" $w ")).reduce(_ + _)
    permille(hits, tokenCount(text))
  }

  /** Composite quality score in [0,1000]: alpha density + token-length sanity
    * + non-degenerate whitespace. Heuristic shape follows public quality
    * filters (C4/Gopher-style length & symbol ratios).
    */
  def qualityScore(text: Column): Column = {
    val len = length(text)
    val alphaPm = permille(alphaCount(text), len)
    val tokens = tokenCount(text)
    // `length(regexp_replace(text, "\\s+", ""))` == numChars − (\s chars):
    // \s is ASCII-only in Java regex, so the single-pass class count is exact
    val nonWsLen = len - TextCountExprs.classCount(text, TextCountExprs.ClassRegexWs)
    val meanTokLenPm = when(tokens === 0, lit(0L))
      .otherwise(floor((nonWsLen * 1000L) / tokens).cast("long"))
    // mean token length in [3,12] chars is "natural"; permille-scaled band
    val tokOk = when(meanTokLenPm.between(3000L, 12000L), lit(1000L)).otherwise(lit(0L))
    val spacePm = permille(spaceCount(text), len)
    val spaceOk = when(spacePm.between(50L, 400L), lit(1000L)).otherwise(lit(0L))
    floor((alphaPm * 4 + tokOk * 3 + spaceOk * 3) / 10).cast("long")
  }

  /** n-gram language-ID heuristic: stopword-marker hit counts per language,
    * argmax with deterministic alphabetical tie-break. Markers are scored on
    * the space-padded text so word boundaries match at string edges.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" der ", " und ", " die ", " nicht "),
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "es" -> Seq(" el ", " que ", " los ", " una "),
    "fr" -> Seq(" le ", " la ", " et ", " les "),
    "zh" -> Seq(" de5 ", " shi4 ", " le5 ", " bu4 "))

  def langScores(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), text, lit(" "))
    langMarkers.map { case (lang, kws) =>
      lang -> kws.map(occurrences(padded, _)).reduce(_ + _)
    }
  }

  /** Predicted language: argmax of marker scores; ties break alphabetically
    * (languages evaluated in sorted order, >= keeps the earlier one).
    */
  def langId(text: Column): Column = {
    val scores = langScores(text) // already alphabetical
    // fold: replace only on strict improvement → earlier (alphabetical) wins ties
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (l, s)) =>
        (when(s > bestScore, lit(l)).otherwise(bestLang),
          when(s > bestScore, s).otherwise(bestScore))
    }._1
  }

  /** Distinct character k-shingles of the text — compiled single-pass
    * custom expression ([[ShinglesExpr]]; the HOF
    * `array_distinct(transform(sequence…, substr))` form evaluates
    * interpreted per element and dominated the near-dup pipeline's wall).
    */
  def shingles(text: Column, k: Int): Column = ShinglesExpr.shingles(text, k)

  /** MinHash signature: `h` hash families over the shingle set. Compiled
    * custom expression ([[MinHashExpr]]) — the HOF formulation
    * (`transform(…, array_min(transform(…, xxhash64)))`) evaluates
    * interpreted per element and is ~10× slower.
    */
  def minhashSignature(shingleArr: Column, h: Int): Column =
    MinHashExpr.minhash(shingleArr, h)

  /** 64-bit hashes of the distinct k-shingles ([[ShingleHashesExpr]]): the
    * compact shingle-set representation the near-dup pipeline persists and
    * shuffles — 8 bytes per shingle instead of a ~k-char string.
    */
  def shingleHashes(text: Column, k: Int): Column =
    ShingleHashesExpr.shingleHashes(text, k)

  /** MinHash signature from pre-hashed shingles — bit-identical to
    * [[minhashSignature]] over the corresponding string shingles.
    */
  def minhashFromHashes(hashes: Column, h: Int): Column =
    MinHashFromHashesExpr.minhash(hashes, h)

  /** Exact Jaccard (per-mille) over pre-hashed shingle sets
    * ([[JaccardHashesExpr]]): same integer math as [[jaccardPermille]].
    */
  def jaccardHashesPermille(a: Column, b: Column): Column =
    JaccardHashesExpr.jaccardPermille(a, b)

  /** LSH band keys: split the signature into `bands` bands of `rowsPerBand`
    * and hash each band → candidate-bucket keys (join on any equal band).
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(concat_ws("_", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))), b))

  /** Exact Jaccard similarity (per-mille, integer-stable) of two shingle sets. */
  def jaccardPermille(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("long")
    val uni = size(array_union(a, b)).cast("long")
    when(uni === 0, lit(0L)).otherwise(floor((inter * 1000L) / uni).cast("long"))
  }

  /** SimHash-64 over the token array — custom Catalyst expression (one pass,
    * 64 vote counters; see [[SimHash64Expr]]).
    */
  def simhash64(tokens: Column): Column = SimHash64Expr.simhash64(tokens)

  /** SimHash-64 with DuckDB-`md5_number_lower` token hashing — bit-for-bit
    * reproducible in ANSI SQL, so the whole near-dup pipeline can be oracled.
    */
  def simhash64Md5(tokens: Column): Column = SimHash64Expr.simhash64Md5(tokens)

  /** Rolling-hash document fingerprint (see [[FingerprintExpr]]). */
  def fingerprint(text: Column, window: Int = 16): Column =
    FingerprintExpr.fingerprint(text, window)

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
