package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the large-scale training-data path.
  *
  * Everything here is composed from codegen'd built-ins and higher-order
  * functions — no Scala UDFs — so whole-stage codegen spans the full
  * pipeline and Catalyst can still prune/push around these expressions.
  * (The reference keeps all scalar logic in opaque flatMap closures, e.g.
  * reference: src/main/scala/com/mozilla/telemetry/pings/MainPing.scala:21-101;
  * this engine moves it into the expression tree instead — SURVEY.md §4.)
  */
object TextFunctions {

  /** Let-binding for computed arrays used inside higher-order-function
    * lambdas. Catalyst's CollapseProject inlines a computed column into
    * its use sites; when the use site is a lambda body the expression is
    * then re-evaluated PER ARRAY ELEMENT (e.g. a tokenizing split re-run
    * for every MinHash seed). Wrapping the value as the argument of a
    * one-element `transform` evaluates it exactly once per row and hands
    * the lambda a cheap bound variable. (Measured: 89s → sub-second for
    * the 32-seed MinHash over 5k docs.)
    */
  def bind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Whitespace tokenization; empty string → empty array (not [""]). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Token count without the split: a native one-pass scan
    * ([[org.apache.spark.sql.graft.TextNormOps]]) returning exactly
    * `size(tokens(text))` — split-FIELD semantics, including the empty
    * edge fields a tab-leading/trailing string produces — with none of
    * the regex or array-allocation cost on a corpus-wide scan.
    */
  def tokenCount(text: Column): Column =
    org.apache.spark.sql.graft.TextNormExpressions.tokenCount(text)

  /** BPE-ish subword count: word-piece regex over the raw text.
    * Counts alphanumeric runs, digits, and punctuation marks separately —
    * a cheap proxy for tokenizer cost used to budget training data.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Embedded subword vocabulary for [[bpeTokenCount]] — the multi-char
    * pieces a greedy longest-match tokenizer may consume in one step
    * (single characters are always implicitly in-vocab as the fallback).
    * Deterministic and small on purpose: the SAME literal list embeds in
    * the DuckDB oracle, so token accounting is cross-engine replayable.
    * A production build swaps in a real learned merge table behind the
    * identical column signature.
    */
  val BpeVocab: Seq[String] = Seq(
    "able", "ream", "ilt", "ata", "ble", "rge", "ter", "the", "row",
    "dow", "umn", "ine", "ash", "oin", "val", "an", "in", "st", "re",
    "er", "or", "al", "ow", "sc", "ta", "sm", "ue", "ey")

  /** Greedy longest-match subword count for ONE word: walk the word
    * left to right, at each position consuming the longest [[BpeVocab]]
    * piece that matches (else one character), and count the consumed
    * pieces — WordPiece-style segmentation, the accounting an actual
    * training pipeline's tokenizer produces (unlike the
    * [[subwordCount]] regex proxy, kept as the cheap path).
    *
    * The sequential scan is expressed as one `aggregate` over character
    * positions with the cursor state BIT-PACKED into the accumulator
    * (pos in the high 32 bits, count in the low 32): positions the
    * greedy cursor already consumed are skipped by the `i < pos` guard.
    * Pure codegen'd built-ins — no UDF — and the identical fold
    * restates in DuckDB as `list_reduce` with the same shift/mask
    * arithmetic, which is what makes a full hash oracle possible for a
    * tokenizer.
    */
  def bpeWordTokens(w: Column): Column = bind(w) { wb =>
    // longest-match = first hit over DESCENDING length classes: one
    // substr + one hash-set membership (Catalyst InSet) per class
    // instead of a substr+compare per vocab piece — same greedy
    // semantics, ~|lengths| work per position instead of ~|vocab|
    val byLen = BpeVocab.groupBy(_.length)
    val lens = byLen.keys.toSeq.sorted(Ordering[Int].reverse)
    val step = (acc: Column, i: Column) => {
      val pos = shiftrightunsigned(acc, 32)
      val cnt = acc.bitwiseAND(lit(0xFFFFFFFFL))
      val matchLen = lens.foldRight(lit(1): Column) { (n, fallback) =>
        when(wb.substr(i, lit(n)).isin(byLen(n).map(x => x: Any): _*), lit(n))
          .otherwise(fallback)
      }
      when(i.cast("long") < pos, acc)
        .otherwise(shiftleft((i + matchLen).cast("long"), 32)
          .bitwiseOR(cnt + lit(1L)))
    }
    when(length(wb) === 0, lit(0L))
      .otherwise(
        aggregate(sequence(lit(1), length(wb)), lit(1L << 32), step)
          .bitwiseAND(lit(0xFFFFFFFFL)))
  }

  /** Greedy-BPE subword count over a whole text: Σ per-word counts. */
  def bpeTokenCount(text: Column): Column = bind(tokens(text)) { toks =>
    aggregate(toks, lit(0L), (acc, w) => acc + bpeWordTokens(w))
  }

  /** DuckDB twin of [[bpeWordTokens]] over an in-scope word expression
    * `w`: the same bit-packed greedy fold via list_reduce. */
  def bpeWordTokensSql(w: String): String = {
    val pieces = BpeVocab.map(p =>
      s"CASE WHEN substr($w, CAST(i AS INT), ${p.length}) = '$p' THEN ${p.length} ELSE 1 END")
      .mkString(", ")
    s"""CASE WHEN length($w) = 0 THEN 0 ELSE
       | list_reduce(list_prepend(CAST(4294967296 AS BIGINT), range(1, length($w) + 1)),
       |  (acc, i) -> CASE WHEN i < (acc >> 32) THEN acc
       |   ELSE ((i + GREATEST(1, $pieces)) << 32) | ((acc & 4294967295) + 1) END)
       | & 4294967295 END""".stripMargin.replace("\n", " ")
  }

  /** Ratio of punctuation characters to total characters (0 for empty). */
  def punctRatio(text: Column): Column = {
    val punct = length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
    when(length(text) === 0, lit(0.0)).otherwise(punct.cast("double") / length(text))
  }

  /** Ratio of tokens that are English stopwords — a quality-score feature. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for", "with")

  def stopwordRatio(text: Column): Column = bind(tokens(text)) { toks =>
    val stops = filter(toks, t => t.isin(Stopwords.map(x => x: Any): _*))
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(stops).cast("double") / size(toks))
  }

  def meanWordLength(text: Column): Column = bind(tokens(text)) { toks =>
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: length sweet-spot, low punctuation,
    * some-but-not-all stopwords. Deterministic, codegen-friendly.
    */
  def qualityScore(text: Column): Column = {
    val lenScore   = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    val stopScore  = least(stopwordRatio(text) * 4.0, lit(1.0))
    round((lenScore + punctScore + stopScore) / 3.0, 6)
  }

  /** Deterministic stand-in weight vector for [[hashedLinearScore]] —
    * 64 values in [-1, 1), every one an exact multiple of 1e-3, so the
    * SAME literals embed bit-for-bit in the DuckDB oracle. A trained
    * model's weights slot in behind the identical column signature (the
    * [[langIdMarkers]] / [[BpeVocab]] precedent).
    */
  val ClassifierWeights: IndexedSeq[Double] =
    (0 until 64).map(k => ((k * 2654435761L + 99991L) % 2001L - 1000L) / 1000.0)

  /** Hashed-feature linear classifier score — the fastText-style quality
    * gate modern curation pipelines run over pretraining corpora: each
    * token hashes into one of `weights.size` buckets (the hashing trick;
    * size must be a power of two) and the document scores the MEAN
    * bucket weight of its tokens. The fold is left-to-right, so the
    * identical IEEE double dag replays in the oracle's `list_reduce` —
    * exact cross-engine, no libm anywhere. Empty documents score 0.
    * Map-side only: no shuffle, no model join — the weights ride the
    * expression tree as literals.
    */
  def hashedLinearScore(text: Column,
                        weights: Seq[Double] = ClassifierWeights): Column = {
    require(weights.nonEmpty && (weights.size & (weights.size - 1)) == 0,
      "weights.size must be a power of two")
    val mask = lit((weights.size - 1).toLong)
    val w = array(weights.map(lit): _*)
    bind(tokens(text)) { toks =>
      when(size(toks) === 0, lit(0.0))
        .otherwise(aggregate(
          transform(toks, t => element_at(w,
            (org.apache.spark.sql.graft.TextHashExpressions.fnv64(t)
              .bitwiseAND(mask) + lit(1L)).cast("int"))),
          lit(0.0), (acc, x) => acc + x) / size(toks))
    }
  }

  /** Marker-word language ID — deterministic first-match CASE chain, so the
    * exact rule is expressible in ANSI SQL for the oracle. A production
    * n-gram profile model slots in behind the same column signature.
    */
  def langIdMarkers(text: Column): Column =
    when(text.rlike("\\b(der|und|die|nicht|ist)\\b"), lit("de"))
      .when(text.rlike("\\b(le|la|les|et|est|une)\\b"), lit("fr"))
      .when(text.rlike("\\b(el|los|las|que|es|una)\\b"), lit("es"))
      .when(text.rlike("\\b(the|and|of|is|to)\\b"), lit("en"))
      .otherwise(lit("und"))

  /** Same rule as [[langIdMarkers]], DuckDB syntax (for oracle SQL). */
  val langIdMarkersSql: String =
    """CASE
      | WHEN regexp_matches(text, '\b(der|und|die|nicht|ist)\b') THEN 'de'
      | WHEN regexp_matches(text, '\b(le|la|les|et|est|une)\b') THEN 'fr'
      | WHEN regexp_matches(text, '\b(el|los|las|que|es|una)\b') THEN 'es'
      | WHEN regexp_matches(text, '\b(the|and|of|is|to)\b') THEN 'en'
      | ELSE 'und' END""".stripMargin.replace("\n", " ")

  /** Word-level n-gram shingles: ["a b c","b c d",…]. 1-based slice.
    * Tokens are let-bound so the inner index lambda reads an array
    * variable instead of re-splitting the text per shingle. A document
    * with fewer than n tokens has NO n-gram shingles (empty array, not a
    * singleton whole-text shingle) — the set semantics a SQL list
    * comprehension produces, so Jaccard oracles agree on short docs.
    */
  def shingles(text: Column, n: Int): Column = bind(tokens(text)) { toks =>
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Ascending distinct 64-bit hashes of the word-level n-gram shingles,
    * via the native one-pass expression
    * ([[org.apache.spark.sql.graft.ShingleOps]]): token hashes accumulate
    * during the text scan (no token/shingle string is ever allocated),
    * shingles combine through a ring buffer, output is sorted+deduped.
    * The hot input of MinHash/Jaccard indexing, where only set identity
    * (not the text) matters. Short docs (<n tokens) ⇒ empty array, same
    * set semantics as [[shingles]].
    */
  def shingleHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ShingleExpressions.shingleHashes(text, n)

  /** Rotate-xor rolling-hash fingerprint over tokens (order-sensitive).
    * Token hashes come from the native codegen'd FNV-1a expression
    * ([[org.apache.spark.sql.graft.TextHashOps.fnv64]]) whose arithmetic
    * is restatable in the oracle's SQL dialect, so fingerprints are
    * hash-comparable cross-engine; the rotate-xor combine is pure bitwise
    * ops — safe under ANSI mode (an arithmetic rolling hash would
    * overflow-throw there).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), t => org.apache.spark.sql.graft.TextHashExpressions.fnv64(t)),
      lit(0L),
      (acc, h) => shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59)).bitwiseXOR(h))

  /** HTML → text extraction — the content step between a raw crawl and
    * every text gate in this engine (tokens/quality/dedup all assume
    * markup-free text): drop <script>/<style> blocks wholesale (their
    * content is code, not prose — dotall non-greedy so embedded `<`
    * never derails the walk), strip remaining tags to spaces, THEN
    * decode the core entities (tags first so `&lt;b&gt;` in prose can
    * never be re-interpreted as a strippable tag; `&amp;` decoded LAST
    * so `&amp;lt;` yields the literal `&lt;`), collapse whitespace,
    * trim. Regex subset common to Java regex and RE2, so the oracle
    * replays the pipeline verbatim. A boilerplate-removal model
    * (trafilatura-class) slots in ABOVE this; the tag/entity layer is
    * the deterministic part.
    */
  def extractHtmlText(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(html, "(?s)<script.*?</script>", " "),
      "(?s)<style.*?</style>", " ")
    // comments BEFORE the generic tag strip: a comment containing '>'
    // (<!-- a > b -->) would otherwise be cut short by <[^>]*>, leaking
    // "b -->" into the text; after script/style so commented-looking
    // text inside code blocks is already gone with its block
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]*>", " ")
    // numeric references decode after tags (so &#60; can never be
    // re-stripped) and BEFORE named entities (so &amp;#65; decodes its
    // &amp; to yield the literal '&#65;', never 'A')
    val numDecoded = decodeNumericRefs(noTags)
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&",
        // the ampersand's own numeric forms decode in the SAME final
        // stage as &amp; (excluded from the numeric pass so &#38;lt;
        // yields the literal '&lt;', mirroring &amp;lt;)
        "&#38;" -> "&", "&#x26;" -> "&", "&#X26;" -> "&")
      .foldLeft(numDecoded) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Decode numeric character references — `&#NN;` (decimal) and
    * `&#xHH;`/`&#XHH;` (hex) — for code points in the printable-ASCII
    * range [32, 126], where Spark's mod-256 `chr` and DuckDB's Unicode
    * `chr` agree bit-for-bit (the cross-engine determinism boundary:
    * refs outside the range, e.g. `&#8217;`, pass through intact).
    * Code point 38 (`&`) is deliberately excluded — it decodes in
    * [[extractHtmlText]]'s final stage alongside `&amp;`, preserving
    * single-decode semantics for forms like `&#38;lt;`. Split-on-`&#`
    * + per-piece transform, so only genuine reference positions are
    * touched; malformed refs (`&#zz;`, unterminated digits) stay as-is.
    */
  private[graft] def decodeNumericRefs(c: Column): Column =
    bind(split(c, "&#", -1)) { parts =>
      concat(element_at(parts, 1),
        array_join(transform(slice(parts, 2, 1000000), p => {
          val dec = regexp_extract(p, "^([0-9]{1,7});", 1)
          val hexd = regexp_extract(p, "^[xX]([0-9a-fA-F]{1,6});", 1)
          val intact = concat(lit("&#"), p)
          bind(dec) { d =>
            bind(hexd) { h =>
              when(d =!= "",
                bind(d.cast("int")) { n =>
                  when(n.between(32, 126) && n =!= 38,
                    concat(char(n),
                      p.substr(length(d) + lit(2), lit(1000000))))
                    .otherwise(intact)
                })
                .when(h =!= "",
                  bind(conv(h, 16, 10).cast("int")) { n =>
                    when(n.between(32, 126) && n =!= 38,
                      concat(char(n),
                        p.substr(length(h) + lit(3), lit(1000000))))
                      .otherwise(intact)
                  })
                .otherwise(intact)
            }
          }
        }), ""))
    }

  /** The RFC 3986 unreserved set (ALPHA / DIGIT / `-` / `.` / `_` /
    * `~`) as (uppercase-hex escape → character) decode pairs — the
    * percent-encodings §2.3 says MUST be decoded for equivalence
    * (`%7E` ≡ `~`). Reserved/delimiter characters (`%2F`, `%3F`,
    * `%26`, `%25`, …) are deliberately absent: decoding those would
    * change where the URL parses. Shared with the oracle's generated
    * replace chain. */
  private[graft] val UnreservedDecodes: Seq[(String, String)] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~'))
      .map(ch => (f"%%${ch.toInt}%02X", ch.toString))

  /** Percent-encoding normalization (RFC 3986 §6.2.2.1–2): fold the two
    * hex digits after every `%` to uppercase (`%3f` → `%3F` — hex case
    * never carries meaning), then decode the [[UnreservedDecodes]] set
    * (`%7E` → `~`). Split-on-`%` + per-piece transform so only genuine
    * escape positions are touched; a `%` followed by non-hex passes
    * through untouched (invalid encodings stay as-is, deterministically).
    * Safe to apply to a whole pre-parse URL: no unreserved character is
    * a parse delimiter.
    */
  private[graft] def normalizePercent(c: Column): Column = {
    val folded = bind(split(c, "%", -1)) { parts =>
      concat(element_at(parts, 1),
        array_join(transform(slice(parts, 2, 1000000), p =>
          concat(lit("%"),
            when(p.rlike("^[0-9a-fA-F]{2}"), upper(p.substr(lit(1), lit(2))))
              .otherwise(p.substr(lit(1), lit(2))),
            p.substr(lit(3), lit(1000000)))), ""))
    }
    UnreservedDecodes.foldLeft(folded) { case (acc, (e, v)) =>
      replace(acc, lit(e), lit(v))
    }
  }

  /** URL canonicalization — the alias-collapse step every crawl dedup
    * runs before any content hash (the same page arrives as
    * `HTTP://WWW.Site.com:80/p?utm_source=x&b=2&a=1#frag` and
    * `http://site.com/p?a=1&b=2`): drop the fragment, normalize
    * percent-encoding ([[normalizePercent]] — uppercase hex, decode
    * unreserved), lowercase the scheme and host (paths stay
    * case-sensitive — URL semantics), strip a leading `www.`, a
    * trailing FQDN root dot (`example.com.` ≡ `example.com`) and the
    * default `:80` port (non-default ports survive), drop `utm_*`
    * tracking parameters, and sort the surviving query parameters so
    * param order can't fork the hash. The QUERY is split off before the
    * host/path split, so `http://site.com?a=1` (query, no path)
    * canonicalizes like `http://site.com/?a=1` instead of leaking
    * `?a=1` into the host. An empty path always renders as `/`
    * (`http://a.com` ≡ `http://a.com/`). Pure string/HOF expressions —
    * the whole transform is one codegen'd projection, restated verbatim
    * in the oracle's SQL, and IDEMPOTENT (spec'd): canonical input
    * passes through unchanged. (Bracketed IPv6 hosts are out of scope —
    * the port split is on the first `:`.)
    */
  def canonicalizeUrl(url: Column): Column = bind(url) { u =>
    bind(normalizePercent(substring_index(u, "#", 1))) { noFrag =>
      bind(substring_index(noFrag, "://", 1)) { rawScheme =>
        // everything after "://" (scheme length is case-stable)
        bind(noFrag.substr(length(rawScheme) + lit(4), lit(1000000))) { hostPathQ =>
          // query FIRST: '?' may precede any '/' when the path is empty
          bind(substring_index(hostPathQ, "?", 1)) { hostPath =>
            bind(when(instr(hostPathQ, "?") > 0,
                hostPathQ.substr(length(hostPath) + lit(2), lit(1000000)))
              .otherwise(lit(""))) { query =>
              bind(substring_index(hostPath, "/", 1)) { hostPort =>
                val path = when(instr(hostPath, "/") > 0,
                  hostPath.substr(length(hostPort) + lit(2), lit(1000000)))
                  .otherwise(lit(""))
                val hostOut = bind(substring_index(hostPort, ":", 1)) { hname =>
                  bind(when(instr(hostPort, ":") > 0,
                      hostPort.substr(length(hname) + lit(2), lit(1000000)))
                    .otherwise(lit(""))) { port =>
                    concat(
                      regexp_replace(regexp_replace(
                        lower(hname), "^www\\.", ""), "\\.+$", ""),
                      when(port === "" || port === "80", lit(""))
                        .otherwise(concat(lit(":"), port)))
                  }
                }
                bind(array_sort(filter(split(query, "&"),
                    p => !p.startsWith("utm_") && p =!= lit("")))) { params =>
                  concat(lower(rawScheme), lit("://"), hostOut, lit("/"), path,
                    when(size(params) > 0,
                      concat(lit("?"), array_join(params, "&"))).otherwise(lit("")))
                }
              }
            }
          }
        }
      }
    }
  }
}
