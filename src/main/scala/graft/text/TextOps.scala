package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [engine-added] Text-analysis column kernels for LLM-data-pipeline work
  * over the `documents` fixture table: tokenization, n-gram shingling,
  * quality scoring, marker-stopword language ID, rolling-hash document
  * fingerprints, and SimHash — all as built-in Spark expressions
  * (higher-order array functions), so every kernel runs inside whole-stage
  * codegen and composes with pushdown/pruning. No UDFs, no RDDs.
  *
  * The reference repo has no text surface at all (it is a vector-search
  * prototype); these ops are part of the engine's declared §2.B inventory
  * (SURVEY.md). Everything here is deterministic — a hard requirement for
  * the driver's DuckDB hash-compare.
  */
object TextOps {

  /** Whitespace tokens of the lowercased text, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** BPE-ish sub-token count: runs of letters, runs of digits, or single
    * non-alphanumeric glyphs (the usual pre-tokenizer regex shape). */
  val BpeTokenRe = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeTokenRe), lit(0)))

  /** Word n-gram shingles from a token array: `["a b c", "b c d", ...]`.
    * Guarded so short docs yield an empty array (Spark's `sequence(0, -1)`
    * would otherwise count DOWN and fabricate shingles). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))

  /** Distinct word n-gram shingle set (the unit of Jaccard similarity).
    * NOTE: as a single expression this re-evaluates the tokenizer once per
    * `element_at` in the shingle lambda — O(len²) per document. Fine for
    * per-row use on short strings and for oracle parity; bulk pipelines
    * should use [[shingleRows]], which tokenizes each document exactly once. */
  def shingleSet(text: Column, n: Int): Column = array_distinct(shingles(tokens(text), n))

  /** Row-wise shingles for bulk corpora: `(doc_id, s)` — tokenize ONCE
    * into a materialized array column (its own projection, so Catalyst
    * doesn't re-inline the tokenizer into every shingle lambda the way the
    * single-expression [[shingleSet]] does), assemble n-grams row-locally
    * from that array, dedupe per document with `array_distinct`, then
    * explode. ZERO shuffles — shingling is embarrassingly row-parallel, and
    * the per-document dedup replaces the global `distinct()` exchange a
    * row-shape pipeline would otherwise pay (an earlier window+`lead`
    * formulation shuffled every token row by doc_id and was the dominant
    * cost of the d03 pipeline at fixture scale).
    *
    * @param distinctSet true → one row per DISTINCT shingle (Jaccard set
    *                    semantics); false → one row per occurrence (counts)
    */
  def shingleRows(docs: org.apache.spark.sql.DataFrame, n: Int, distinctSet: Boolean): org.apache.spark.sql.DataFrame = {
    val withToks = docs.select(col("doc_id"), tokens(col("text")).as("_toks"))
    val sh = shingles(col("_toks"), n)
    withToks.select(col("doc_id"), explode(if (distinctSet) array_distinct(sh) else sh).as("s"))
  }

  /** Jaccard similarity of two (distinct-element) arrays. Pure int ratio in
    * double — bit-identical across engines, safe to order by. Uses
    * |A∪B| = |A|+|B|−|A∩B| so only ONE array traversal is needed (the
    * naive intersect+union form doubles the per-pair cost, which is the
    * hot loop of a blocked similarity join). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a).cast("double") + size(b).cast("double") - inter
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  // --- PII redaction -------------------------------------------------------

  /** Deliberately simple regexes, written in the common subset of Java's
    * regex and RE2 (no backrefs, no lookaround) so any engine — including
    * the DuckDB oracle — scrubs identically. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val LongNumRe = "[0-9]{4,}"

  /** Scrub emails → `<EMAIL>`, URLs → `<URL>`, 4+-digit runs → `<NUM>`,
    * in that order (emails/URLs swallow their own digits before the
    * number pass runs). Pure codegen'd `regexp_replace` chain — the
    * standard pre-training scrub shape, one projection, no shuffle. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        UrlRe,
        "<URL>"),
      LongNumRe,
      "<NUM>")

  // --- quality scoring ----------------------------------------------------

  private def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    countMatches(text, "[.,;:!?'\"()\\[\\]{}-]").cast("double") / greatest(lit(1), length(text))

  /** Fraction of characters that are digits. */
  def digitRatio(text: Column): Column =
    countMatches(text, "[0-9]").cast("double") / greatest(lit(1), length(text))

  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(toks: Column): Column =
    size(filter(toks, t => t.isin(EnStopwords: _*))).cast("double") / greatest(lit(1), size(toks))

  /** Mean token length in characters. */
  def avgTokenLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / greatest(lit(1), size(toks))

  /** Type-token ratio (lexical diversity). */
  def typeTokenRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / greatest(lit(1), size(toks))

  /** Composite heuristic quality score in [0,1]: rewards moderate length,
    * lexical diversity and stopword presence; punishes digit/punct noise.
    * (Shape follows the usual Gopher/C4-style filters; weights are ours.) */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val lenScore = least(size(toks).cast("double") / lit(50.0), lit(1.0))
    val divScore = typeTokenRatio(toks)
    val stopScore = least(stopwordRatio(toks) * lit(5.0), lit(1.0))
    val noise = punctRatio(text) + digitRatio(text)
    greatest(
      lit(0.0),
      least(
        lit(1.0),
        lit(0.3) * lenScore + lit(0.3) * divScore + lit(0.2) * stopScore - lit(0.4) * noise + lit(0.2)))
  }

  // --- language identification -------------------------------------------

  /** Marker stopword sets per language (tiny, public-knowledge lists). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "las", "un", "una", "por"),
    "fr" -> Seq("le", "la", "les", "des", "et", "un", "une", "est", "dans", "pour"),
    "de" -> Seq("der", "die", "und", "das", "ein", "eine", "zu", "mit", "ist", "nicht"))

  /** Marker-hit count for one language. */
  def langScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers: _*)))

  /** Heuristic language ID: argmax marker hits, first language wins ties,
    * "und" (undetermined) when nothing matches. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangMarkers.map { case (l, ms) => l -> langScore(toks, ms) }
    val best = greatest(scores.map(_._2): _*)
    scores.reverse.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  // --- fingerprints -------------------------------------------------------

  private val FpMod = 1000000007L // 1e9+7; keeps the rolling product in-range under ANSI

  /** Order-sensitive rolling-hash document fingerprint over tokens:
    * `h = (h*31 + xxhash64(tok) mod p) mod p`. Deterministic, overflow-safe
    * (max intermediate < p*31 + p << Long.Max). The fast bulk variant:
    * xxhash64 is a single codegen'd native hash per token. Not
    * cross-engine portable (xxhash64 is Spark-specific) — use
    * [[fingerprintPortable]] where an external system must recompute the
    * same fingerprint. */
  def fingerprint(toks: Column): Column =
    aggregate(
      toks,
      lit(0L),
      (acc, t) => pmod(acc * lit(31L) + pmod(xxhash64(t), lit(FpMod)), lit(FpMod)))

  /** Per-token Karp–Rabin polynomial hash over character codepoints:
    * `a = (a*131 + codepoint) mod p`, init 7. Pure arithmetic on
    * `ascii`/`substr` — any engine with the same fold reproduces it
    * bit-for-bit (the DuckDB oracle does, via ord/list_reduce).
    * Portability bound: BMP codepoints (Spark's `ascii` reads UTF-16
    * units, so supplementary-plane chars hash as surrogates where `ord`
    * sees the full codepoint) — fine for the ASCII fixture corpus; byte-
    * level folds are the fix if that ever matters. */
  def tokenHashPortable(tok: Column): Column =
    aggregate(
      sequence(lit(1), length(tok)),
      lit(7L),
      (a, i) => pmod(a * lit(131L) + ascii(tok.substr(i, lit(1))), lit(FpMod)))

  /** Cross-engine-portable document fingerprint: the [[fingerprint]] token
    * fold with [[tokenHashPortable]] in place of xxhash64. O(total chars)
    * per document instead of O(tokens) — prefer [[fingerprint]] for bulk
    * 100 TB fingerprinting, this one where verifiability matters. */
  def fingerprintPortable(toks: Column): Column =
    aggregate(
      toks,
      lit(0L),
      (acc, t) => pmod(acc * lit(31L) + tokenHashPortable(t), lit(FpMod)))

  private val FpMod2 = 998244353L // a second ~2^30 prime for the packed hash

  /** Second Karp–Rabin fold (base 137, init 11, mod 998244353) —
    * independent of [[tokenHashPortable]]'s constants so the two folds
    * make a usable 60-bit combined hash. */
  def tokenHashPortable2(tok: Column): Column =
    aggregate(
      sequence(lit(1), length(tok)),
      lit(11L),
      (a, i) => pmod(a * lit(137L) + ascii(tok.substr(i, lit(1))), lit(FpMod2)))

  /** Cross-engine-portable 60-bit token hash: two independent Karp–Rabin
    * folds, each finished with a multiplicative mix mod its own prime,
    * packed as `m1 + m2 · 2^30` (both moduli are < 2^30, so the fields
    * cannot overlap and the packed value stays < 2^60). The mix step is
    * essential, not decoration: a raw KR fold of a SHORT token is a small
    * number — 'a' folds to 7·131+97 = 1014 — so its high-order bits are
    * all zero and every short-token-heavy document votes the same way on
    * half the SimHash bits (measured: 1.4M spurious near-dup pairs at
    * sf0.1 without the mix, ~4k with it). Multiplication by a large
    * constant mod a prime is a BIJECTION, so small inputs land on
    * full-range residues while portability stays pure integer arithmetic.
    * The top four bits of the packed long are STRUCTURALLY ZERO — the
    * property that lets a SimHash built over these hashes be packed into
    * a 64-bit integer by engines whose `1 << 63` is a checked overflow
    * (DuckDB), because no vote ever sets bits 60–63. All products stay
    * under 2^62, in-range for ANSI long arithmetic on both engines. */
  def tokenHashPortable60(tok: Column): Column =
    pmod(tokenHashPortable(tok) * lit(2654435761L), lit(FpMod)) +
      pmod(tokenHashPortable2(tok) * lit(2246822519L), lit(FpMod2)) * lit(1073741824L)

  /** The 64 single-bit masks (1L << i); a literal array so per-bit tests
    * need no dynamic shifts (the Scala `shiftleft` only takes Int shifts). */
  private val BitMasks: Seq[Long] = (0 until 64).map(i => 1L << i)

  /** 64-bit SimHash over the token multiset: per bit, sum +1/−1 votes
    * weighted by token occurrences; bit set iff the vote is positive.
    * Native codegen'd [[SimHash64]] expression (primitive long loop);
    * [[simhash64Hof]] is the semantic reference it is parity-tested
    * against. */
  def simhash64(toks: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(toks)))
  }

  /** Portable-hash SimHash, bulk path: the codegen'd
    * [[PortableSimHash64]] expression — one primitive pass folding both
    * Karp–Rabin hashes and voting, no per-token array allocation. The HOF
    * composition `simhash64FromHashes(transform(toks, tokenHashPortable60))`
    * is its parity-tested semantic reference (7.3× slower at sf0.1). */
  def portableSimhash64(toks: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(PortableSimHash64(GraftSqlBridge.expression(toks)))
  }

  /** SimHash over an `array<long>` of PRECOMPUTED token hashes — the vote
    * loop of [[simhash64]] decoupled from the hash function, so a caller
    * can swap xxhash64 for a cross-engine-portable token hash
    * ([[tokenHashPortable60]]) and an external engine can recompute the
    * identical SimHash by pure arithmetic (the d04 oracle does). Same
    * HOF shape as [[simhash64Hof]]; same bulk-path caveat. */
  def simhash64FromHashes(hashes: Column): Column = {
    val masks = typedLit(BitMasks)
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) =>
        zip_with(
          acc,
          transform(masks, m => when(h.bitwiseAND(m) =!= 0L, lit(1L)).otherwise(lit(-1L))),
          (a, v) => a + v))
    aggregate(
      zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L),
      (acc, m) => acc.bitwiseOR(m))
  }

  /** Higher-order-function form of [[simhash64]] (nested
    * `aggregate`/`transform`/`zip_with`): kept as the portable semantic
    * reference for parity tests. Allocates two 64-element arrays per token
    * per row — do not use in bulk paths. */
  def simhash64Hof(toks: Column): Column = {
    val masks = typedLit(BitMasks)
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) =>
        zip_with(
          acc,
          transform(masks, m => when(xxhash64(t).bitwiseAND(m) =!= 0L, lit(1L)).otherwise(lit(-1L))),
          (a, v) => a + v))
    aggregate(
      zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L),
      (acc, m) => acc.bitwiseOR(m))
  }

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
