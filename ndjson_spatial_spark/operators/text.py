"""Text-analysis operators for training-data pipelines (north-rule additions).

Everything that CAN be pure Catalyst IS (token counting, quality ratios —
whole-stage-codegen'd, no Python); only language-ID's per-language stopword
scoring and the rolling-hash fingerprint drop to vectorized pandas UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

__all__ = ["token_count", "bpe_ish_token_count", "quality_score",
           "lang_id", "fingerprint", "repetition_signals",
           "word_ngrams", "top_ngrams", "contamination_check",
           "with_text_features"]

# per-language stopword profiles for Latin-script texts (the classic
# Cavnar-Trenkle-style profile heuristic, word-level; extendable per call
# via lang_id(..., extra_profiles=...)).  Constraint shared with the
# DuckDB oracle (the oracle SQL is generated FROM these tables): every
# word starts and ends with an ASCII letter, so Python-re and RE2 \b
# word-boundary semantics agree (inner diacritics are fine — boundaries
# are only asserted at the ASCII ends).  Tie-breaking is first-in-dict
# wins on equal scores, mirrored by CASE order in the oracle; closely
# related languages (sv/da/no, cs/sk, hr/sr, id/ms) therefore resolve
# deterministically, not randomly.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con", "para", "es"],
    "it": ["il", "di", "che", "e", "per", "del", "della", "sono", "anche", "come"],
    "pt": ["o", "os", "de", "que", "uma", "para", "com", "não", "mais", "como"],
    "nl": ["de", "het", "een", "en", "van", "dat", "niet", "voor", "zijn", "ook"],
    "sv": ["och", "att", "det", "som", "av", "den", "till", "med", "var", "inte"],
    "da": ["og", "det", "at", "en", "den", "til", "er", "som", "ikke", "der"],
    "no": ["og", "det", "at", "en", "til", "er", "som", "ikke", "av", "han"],
    "fi": ["ja", "on", "ei", "se", "mutta", "kun", "niin", "ole", "joka", "jos"],
    "pl": ["i", "w", "nie", "na", "jest", "to", "z", "do", "jak", "co"],
    "cs": ["a", "je", "na", "se", "to", "v", "s", "z", "ale", "jako"],
    "sk": ["a", "je", "na", "sa", "to", "v", "s", "z", "ale", "ako"],
    "hu": ["a", "az", "nem", "hogy", "is", "egy", "van", "de", "ha", "meg"],
    "ro": ["de", "la", "cu", "in", "o", "este", "nu", "pe", "un", "care"],
    "tr": ["bir", "bu", "ve", "da", "de", "ne", "o", "gibi", "ama", "daha"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini",
           "dari", "akan"],
    "ms": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini",
           "daripada", "akan"],
    "vi": ["không", "người", "trong", "này", "với", "một", "các", "cho",
           "khi", "làm"],
    "ca": ["els", "la", "que", "amb", "per", "una", "dels", "com",
           "aquest", "mes"],
    "hr": ["je", "i", "u", "na", "se", "da", "su", "za", "kao", "ali"],
    "sr": ["je", "i", "u", "na", "se", "da", "su", "za", "kao", "ili"],
    "sl": ["je", "in", "na", "se", "da", "so", "za", "kot", "tudi", "pa"],
    "et": ["ja", "on", "ei", "ta", "et", "oli", "see", "oma", "kui", "ka"],
    "lv": ["un", "ir", "es", "ka", "ar", "par", "vai", "bet", "tik", "no"],
    "lt": ["ir", "yra", "kad", "su", "tai", "bet", "kaip", "jis", "per",
           "savo"],
    "sq": ["dhe", "te", "me", "per", "nga", "kjo", "por", "si", "ka", "nuk"],
    "eu": ["eta", "da", "ez", "bat", "hau", "zen", "ere", "edo", "baina",
           "dira"],
    "gl": ["e", "o", "a", "que", "os", "unha", "para", "con", "non", "mais"],
    "sw": ["na", "ya", "wa", "kwa", "ni", "za", "la", "katika", "hii",
           "kuwa"],
    "tl": ["ang", "ng", "sa", "na", "mga", "ay", "at", "ito", "para",
           "hindi"],
}

# non-Latin scripts identify reliably from Unicode ranges alone (counted
# per batch; kana distinguishes ja from zh within CJK)
_SCRIPTS = [
    ("ko", "[가-힯]"),   # hangul
    ("ja", "[぀-ヿ]"),   # hiragana + katakana
    ("zh", "[一-鿿]"),   # CJK unified (after kana check)
    ("ru", "[Ѐ-ӿ]"),   # cyrillic
    ("ar", "[؀-ۿ]"),   # arabic
    ("el", "[Ͱ-Ͽ]"),   # greek
    ("hi", "[ऀ-ॿ]"),   # devanagari
    ("he", "[֐-׿]"),   # hebrew
    ("th", "[฀-๿]"),   # thai
    ("lo", "[຀-໿]"),   # lao
    ("bn", "[ঀ-৿]"),   # bengali
    ("pa", "[਀-੿]"),   # gurmukhi
    ("gu", "[઀-૿]"),   # gujarati
    ("ta", "[஀-௿]"),   # tamil
    ("te", "[ఀ-౿]"),   # telugu
    ("kn", "[ಀ-೿]"),   # kannada
    ("ml", "[ഀ-ൿ]"),   # malayalam
    ("si", "[඀-෿]"),   # sinhala
    ("ka", "[Ⴀ-ჿ]"),   # georgian
    ("hy", "[԰-֏]"),   # armenian
    ("am", "[ሀ-ጿ]"),   # ethiopic
    ("my", "[က-႟]"),   # myanmar
    ("km", "[ក-៿]"),   # khmer
]


def token_count(text_col: Column) -> Column:
    """Whitespace token count — pure Catalyst (codegen'd)."""
    t = F.trim(text_col)
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text_col: Column) -> Column:
    """BPE-ish token estimate: word pieces + digit runs + punctuation, via a
    single regex count — the common ~token-budget heuristic, JVM-side."""
    # count matches of: word chunks of <=4 chars, digits runs, punct
    pieces = F.regexp_count(text_col, F.lit(r"[A-Za-z]{1,4}|\d+|[^\sA-Za-z\d]"))
    return F.coalesce(pieces, F.lit(0))


def quality_score(text_col: Column) -> Column:
    """Heuristic quality in [0,1] from length / punctuation / alpha ratios —
    pure Catalyst arithmetic, no UDF.

    score = 0.4 * saturating(length/500)
          + 0.3 * alpha_ratio
          + 0.3 * (1 - punct_ratio_excess)
    """
    n = F.length(text_col).cast("double")
    alpha = F.regexp_count(text_col, F.lit(r"[A-Za-z]")).cast("double")
    punct = F.regexp_count(text_col, F.lit(r"[^\w\s]")).cast("double")
    len_term = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    punct_excess = F.greatest(
        F.lit(0.0),
        F.when(n > 0, punct / n).otherwise(F.lit(0.0)) - F.lit(0.1),
    )
    score = (
        F.lit(0.4) * len_term
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_excess * 5, F.lit(1.0)))
    )
    return F.round(score, 6)


def lang_id(text_col: Column, extra_profiles: dict | None = None) -> Column:
    """Two-tier language ID (vectorized pandas UDF, one pass per batch):

    1. SCRIPT detection from Unicode ranges (23 scripts: hangul/kana/CJK/
       cyrillic/arabic/greek/devanagari/hebrew/thai/lao/the Indic family/
       georgian/armenian/ethiopic/myanmar/khmer) — decisive on its own for
       non-Latin text (a row is assigned the script's language when >30%
       of its characters fall in the range, kana checked before CJK so
       Japanese text with kanji stays 'ja');
    2. Latin text scores against per-language stopword profiles
       (Cavnar-Trenkle-style word profiles, 32 languages, ONE alternation
       regex per language) — most counts wins, first-in-dict wins ties;
       'und' (undetermined) when nothing scores.

    `extra_profiles` merges caller-supplied {lang: [words...]} profiles
    (config-driven breadth; appended after the built-ins, so built-ins
    keep tie priority)."""
    profiles = dict(_STOPWORDS)
    if extra_profiles:
        profiles.update(extra_profiles)

    @pandas_udf(T.StringType())
    def _lang(text: pd.Series) -> pd.Series:
        n = len(text)
        lowered = text.fillna("").str.lower()
        lengths = np.maximum(lowered.str.len().to_numpy(), 1)
        out = np.full(n, "", dtype=object)
        for lg, pattern in _SCRIPTS:
            undecided = out == ""
            if not undecided.any():
                break
            frac = lowered.str.count(pattern).to_numpy() / lengths
            out[undecided & (frac > 0.3)] = lg
        undecided = out == ""
        if undecided.any():
            langs = list(profiles)
            scores = np.zeros((n, len(langs)))
            for j, lg in enumerate(langs):
                alt = "|".join(profiles[lg])
                scores[:, j] = lowered.str.count(rf"\b(?:{alt})\b").to_numpy()
            best = scores.argmax(axis=1)
            has = scores.max(axis=1) > 0
            latin = np.where(has, np.array(langs)[best], "und")
            out[undecided] = latin[undecided]
        return pd.Series(out.astype(str))

    return _lang(text_col)


def repetition_signals(text_col: Column) -> Column:
    """Gopher-style repetition / shape signals (Rae et al. 2021 quality
    filters), pure Catalyst — one struct column, no UDF:

      dup_line_frac   1 - distinct_lines/lines (boilerplate detector)
      mean_word_len   non-space chars per whitespace token
      symbol_ratio    [#=~|^] symbols per token (markup/table junk)

    All ratios 0.0 on empty input; rounded to 6dp for stable comparisons.
    """
    lines = F.split(text_col, "\n")
    n_lines = F.size(lines).cast("double")
    dup_line_frac = F.when(
        n_lines > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))
    words = token_count(text_col).cast("double")
    chars = F.length(F.regexp_replace(text_col, r"\s", "")).cast("double")
    mean_word_len = F.when(words > 0, chars / words).otherwise(F.lit(0.0))
    syms = F.regexp_count(text_col, F.lit(r"[#=~|^]")).cast("double")
    symbol_ratio = F.when(words > 0, syms / words).otherwise(F.lit(0.0))
    return F.struct(
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
    )


def fingerprint(text_col: Column) -> Column:
    """64-bit rolling polynomial hash of the normalized text (lowercased,
    whitespace collapsed) — a stable document fingerprint for lineage and
    cheap exact-dup pre-screening."""

    @pandas_udf(T.LongType())
    def _fp(text: pd.Series) -> pd.Series:
        # Round-6 (guide §4.2): ONE numpy pass per Arrow batch instead of
        # a per-row numpy loop.  Per row only the (Python-semantics)
        # normalization + utf-8 encode remain; all byte buffers are then
        # concatenated and hashed together: contribution of byte i in row
        # r is b[i] * base^(end_r - 1 - i) (the same polynomial as the
        # per-row Horner form, mod 2^64 by uint64 wraparound), summed per
        # row with np.add.reduceat.  Bit-identical to the per-row form
        # (pinned by test_fingerprint_vectorized_matches_reference).
        out = np.zeros(len(text), np.int64)
        base = np.uint64(1099511628211)
        bufs, rows = [], []
        for i, t in enumerate(text):
            if not t:
                continue
            norm = " ".join(t.lower().split())
            if not norm:  # whitespace-only text -> empty buffer
                continue
            bufs.append(norm.encode("utf-8", "ignore"))
            rows.append(i)
        if not bufs:
            return pd.Series(out)
        lens = np.fromiter((len(b) for b in bufs), np.int64, len(bufs))
        b = np.frombuffer(b"".join(bufs), np.uint8).astype(np.uint64)
        offs = np.zeros(len(bufs), np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        # base^k table up to the longest buffer (mod 2^64)
        maxlen = int(lens.max())
        powers = np.empty(maxlen, np.uint64)
        powers[0] = 1
        if maxlen > 1:
            np.multiply.accumulate(
                np.full(maxlen - 1, base, np.uint64), out=powers[1:])
        # exponent of byte i = (its row's end - 1) - i
        ends = offs + lens
        exp = np.repeat(ends - 1, lens) - np.arange(len(b), dtype=np.int64)
        contrib = b * powers[exp]
        sums = np.add.reduceat(contrib, offs).astype(np.uint64)
        out[np.asarray(rows, np.int64)] = sums.view(np.int64)
        return pd.Series(out)

    return _fp(text_col)


def word_ngrams(text_col: Column, n: int) -> Column:
    """``array<string>`` of whitespace-word n-grams — pure Catalyst
    (lower → split → filter empties → transform(sequence) + slice +
    concat_ws), whole-stage codegen'd, no UDF.  Rows with fewer than
    ``n`` words yield an empty array (never null), so explode drops them
    cleanly and counts stay exact."""
    # array_remove (codegen'd) over the HOF empty-filter (CodegenFallback
    # interpreted per element) — split never emits null elements, so the
    # two are identical here
    toks = F.array_remove(F.split(F.lower(text_col), r"\s+"), "")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>"))


def top_ngrams(
    df: DataFrame,
    n: int = 3,
    k: int = 20,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """EXACT corpus-level top-k word n-grams (heavy hitters) — the
    vocabulary-inspection primitive of a training-data pipeline
    (n-gram LM stats, boilerplate detection, template mining).

    Plan (the 100 TB shape): n-gram generation is a per-row Catalyst
    projection (no Python), explode feeds a hash aggregate whose
    map-side partial combine collapses the Zipf head BEFORE the one
    shuffle on the n-gram key, and the final top-k is
    ``orderBy(...).limit(k)`` → Catalyst's TakeOrderedAndProject:
    each reducer keeps only its local k rows and the driver merges
    k·P candidates — no global sort, no second shuffle.  Ties are
    broken (count DESC, ngram ASC) so the result set is a function of
    the corpus alone.  ``min_count`` prunes the long singleton tail
    between the aggregate and the ordering (at web scale the tail IS
    the vocabulary — cutting it there keeps the TakeOrdered input
    dense)."""
    grams = df.select(F.explode(word_ngrams(F.col(text_col), n))
                      .alias("ngram"))
    counts = grams.groupBy("ngram").agg(F.count("*").alias("cnt"))
    if min_count > 1:
        counts = counts.where(F.col("cnt") >= min_count)
    return counts.orderBy(F.desc("cnt"), F.asc("ngram")).limit(k)


def contamination_check(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    bench_text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination scan: for every document, count how many
    DISTINCT word ``n``-grams it shares with a (small) benchmark /
    eval-set corpus — the standard decontamination primitive for
    training-data pipelines (the n-gram-overlap test popularized by the
    GPT-3 / PaLM data cards).

    Plan (the 100 TB shape): the benchmark side is tiny by construction
    (eval sets are KBs–MBs), so its distinct n-gram set is BROADCAST;
    the corpus side explodes per-row DISTINCT n-grams (array_distinct
    caps fan-out at the document's own vocabulary) into a broadcast
    hash semi-join — zero shuffle for the match itself.  The only
    exchange is the per-document count aggregate keyed on ``id_col``,
    which partial-combines to ≤1 row per (partition, doc).  Output is
    one row per input document: ``n_contaminated`` (distinct shared
    n-grams, 0 when clean) and ``contaminated`` (boolean), joined back
    via a broadcast of the (small) hit set."""
    bgrams = benchmark.select(
        F.explode(F.array_distinct(
            word_ngrams(F.col(bench_text_col), n))).alias("__bgram")
    ).distinct()
    dgrams = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(
            word_ngrams(F.col(text_col), n))).alias("__gram"),
    )
    hits = (
        dgrams.join(F.broadcast(bgrams),
                    F.col("__gram") == F.col("__bgram"))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        df.join(F.broadcast(hits), id_col, "left")
        .withColumn("n_contaminated",
                    F.coalesce(F.col("n_contaminated"), F.lit(0)))
        .withColumn("contaminated", F.col("n_contaminated") > 0)
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 64,
    overlap: int = 16,
    drop_tail_suffix: bool = True,
) -> DataFrame:
    """Token-window document chunking — the context-length splitter every
    training / RAG pipeline runs before tokenization: each document
    becomes overlapping windows of at most ``max_tokens`` whitespace
    tokens, stepping ``max_tokens - overlap`` tokens per chunk.

    Semantics (deterministic, order-free):
      * tokens = whitespace split of trimmed text; zero-token documents
        produce zero chunks (explode drops them).
      * chunk starts = 0, step, 2*step, ... for every start < n_tokens.
      * ``drop_tail_suffix=True`` (default) drops a final chunk that is a
        pure suffix of its predecessor (starts with n - start <= overlap
        and start > 0 carry no new tokens).
      * ``chunk_id`` = start / step (stable, not a row_number — safe to
        recompute on any partitioning).

    Plan (the 100 TB shape): a single narrow projection — split /
    sequence / filter / transform / explode are all Catalyst expressions
    inside one whole-stage-codegen'd map, ZERO shuffles and ZERO Python.
    Chunk fan-out per row is bounded by ceil(n_tokens/step), so task
    output scales with input bytes; downstream tokenizers see chunks
    co-partitioned with their source split (no exchange inserted).
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    step = max_tokens - overlap
    t = F.trim(F.col(text_col))
    # STAGED projections (flagship.py's anti-inlining discipline): the
    # split result materializes ONCE as an attribute and the lambdas
    # below reference the attribute — building this as one nested
    # expression re-inlines the regex split into every lambda element
    # (measured 10x slower on a 200k-doc corpus).
    staged = df.withColumn(
        "__toks",
        F.when(t == "", F.array().cast("array<string>")).otherwise(
            F.split(t, r"\s+")),
    )
    n = F.size(F.col("__toks"))
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - F.lit(1), F.lit(step))
    ).otherwise(F.array().cast("array<int>"))
    # Explode the start offsets and build each chunk with PLAIN
    # expressions on attributes: higher-order transform/filter lambdas
    # are CodegenFallback (interpreted per element), while this shape
    # keeps slice/concat_ws inside whole-stage codegen (measured ~3x on
    # a 200k-doc corpus).  The tail-suffix predicate sits ABOVE the
    # generator on its output attribute, so it cannot be rewritten into
    # duplicated subtrees by pushdown.
    rows = staged.select(
        F.col(id_col), F.col("__toks"), n.alias("__n"),
        F.explode(starts).alias("__st"),
    )
    if drop_tail_suffix:
        rows = rows.where(
            (F.col("__st") == 0)
            | (F.col("__n") - F.col("__st") > F.lit(overlap)))
    return rows.select(
        id_col,
        (F.col("__st") / F.lit(step)).cast("int").alias("chunk_id"),
        F.concat_ws(
            " ", F.slice(F.col("__toks"), F.col("__st") + F.lit(1),
                         F.lit(max_tokens))).alias("chunk_text"),
        F.least(F.lit(max_tokens),
                F.col("__n") - F.col("__st")).alias("n_tokens"),
    )


#: (category, pattern) — ASCII-only regexes valid in BOTH Java (Spark) and
#: RE2 (DuckDB/Go) dialects: no backreferences, no lookaround, \b/\d are
#: ASCII in RE2 and agree on these all-ASCII patterns.  Scrub order is the
#: list order (longest/most-specific first so an SSN is not half-eaten by
#: the phone pattern).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
]


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str]] | None = None,
    token: str = "[PII]",
) -> DataFrame:
    """PII redaction — the privacy-scrub stage of a training-data
    pipeline: replace emails / SSNs / phone numbers / IPv4 addresses with
    a redaction token and report per-category match counts.

    Semantics: counts are measured on the ORIGINAL text per category
    (independent, so one count never depends on another category's
    rewrite); the scrub itself is applied sequentially in ``patterns``
    order, so an earlier category wins overlapping spans.

    Plan (the 100 TB shape): pure Catalyst — ``regexp_count`` +
    chained ``regexp_replace`` in ONE whole-stage-codegen'd projection,
    zero shuffles, zero Python workers; the regex state machines run
    JVM-side per partition.  At web scale this is scan-bound, exactly
    what a scrub pass should be.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    t = F.col(text_col)
    out_cols = {
        f"n_{name}": F.regexp_count(t, F.lit(pat)) for name, pat in pats
    }
    scrubbed = t
    for _, pat in pats:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    out_cols["scrubbed"] = scrubbed
    return df.withColumns(out_cols)


def clean_lines(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning (the Raffel et al. 2020 web-corpus
    preprocessing pass): within each document, (1) drop exact duplicate
    lines keeping the FIRST occurrence, then (2) keep only lines that end
    in terminal punctuation (``. ! ? "``) and contain at least
    ``min_words`` whitespace words.  Appends ``cleaned`` (kept lines
    re-joined with newlines, '' when nothing survives), ``n_lines``
    (original line count) and ``n_kept``.

    Plan (the 100 TB shape): one narrow Catalyst projection — split /
    array_distinct / filter / array_join, zero shuffles, zero Python.
    The dedup is per-document (array_distinct), so no state crosses rows
    and the pass is embarrassingly parallel.
    """
    t = F.col(text_col)
    staged = df.withColumn("__lines", F.split(t, r"\n"))
    deduped = F.array_distinct(F.col("__lines"))
    kept = F.filter(
        deduped,
        lambda ln: ln.rlike(r'[.!?"]$')
        & (F.size(F.split(ln, r"\s+")) >= min_words),
    )
    return (
        staged.withColumn("__kept", kept)
        .withColumns({
            "cleaned": F.array_join(F.col("__kept"), "\n"),
            "n_lines": F.size(F.col("__lines")),
            "n_kept": F.size(F.col("__kept")),
        })
        .drop("__lines", "__kept")
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "normalized",
    nfc: bool = True,
    strip_accents: bool = False,
    collapse_whitespace: bool = False,
) -> DataFrame:
    """Unicode text normalization — the canonicalization pass that makes
    dedup/fingerprinting/tokenization see one spelling per string: NFC
    composition (é as one codepoint, not e+◌́), optional accent
    stripping (NFD + drop combining marks — utf8proc/DuckDB
    ``strip_accents``-compatible on Latin ranges; ligatures/ß pass
    through, it is an ACCENT strip, not ASCII folding), optional
    whitespace collapse.  Null in -> null out.

    Plan: one Arrow-batched pandas UDF projection (Python's unicodedata
    is the reference Unicode implementation; there is no Catalyst NFC) —
    map-side only, zero shuffles.
    """
    import unicodedata

    @pandas_udf(T.StringType())
    def _norm(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if t is None:
                out.append(None)
                continue
            s = t
            if nfc:
                s = unicodedata.normalize("NFC", s)
            if strip_accents:
                s = "".join(
                    c for c in unicodedata.normalize("NFD", s)
                    if not unicodedata.combining(c))
                if nfc:
                    s = unicodedata.normalize("NFC", s)
            if collapse_whitespace:
                s = " ".join(s.split())
            out.append(s)
        return pd.Series(out, dtype=object)

    return df.withColumn(out_col, _norm(F.col(text_col)))


def pack_documents(
    df: DataFrame,
    budget_tokens: int = 2048,
    n_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing — assign documents to ~``budget_tokens`` training
    bins (the context-window packing stage between corpus and trainer),
    deterministically: documents are sharded by content-hash residue,
    ordered within a shard by (fingerprint, id), and a document whose
    cumulative-token START offset falls in [k*budget, (k+1)*budget) goes
    to bin k ("offset packing": a bin may overflow by at most one
    document's tail — the standard greedy-concat semantics, documented).

    Output: input columns + ``shard``, ``bin`` (per shard), ``bin_pos``
    (token offset of the document inside its shard's stream) and
    ``n_tokens``.  A (shard, bin) group concatenated in ``bin_pos``
    order IS the training row.

    Plan (the 100 TB shape): packing is a running sum, which is
    inherently sequential — a single global window would serialize the
    corpus through one partition.  Sharding first (hash residue) makes
    each shard an independent stream: ONE shuffle on ``shard`` and the
    window sort runs per shard in parallel; n_shards just has to exceed
    cluster parallelism.  Everything is deterministic (content hash), so
    re-runs produce identical bins.
    """
    if budget_tokens <= 0 or n_shards <= 0:
        raise ValueError("budget_tokens and n_shards must be positive")
    fp = fingerprint(F.col(text_col))
    staged = df.withColumns({
        "__fp": fp,
        "n_tokens": token_count(F.col(text_col)),
    }).withColumn(
        "shard",
        ((F.col("__fp") % n_shards + n_shards) % n_shards).cast("int"))
    w = Window.partitionBy("shard").orderBy("__fp", id_col)
    cum = F.sum("n_tokens").over(w)
    return (
        staged
        .withColumn("bin_pos", (cum - F.col("n_tokens")).cast("long"))
        .withColumn(
            "bin",
            F.floor(F.col("bin_pos") / F.lit(budget_tokens)).cast("int"))
        .drop("__fp")
    )


def unigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 5000,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's OWN
    add-alpha-smoothed unigram LM (top-``vocab_size`` vocabulary,
    out-of-vocabulary tokens get the smoothing floor) — the in-engine
    stand-in for CCNet-style LM-perplexity quality filtering: documents
    full of corpus-typical words score high, gibberish/rare-token soup
    scores low.  Higher (less negative) = more typical.

    Model: p(w) = (c_w + alpha) / (T + alpha*(V+1)) for vocabulary
    words, p(OOV) = alpha / (T + alpha*(V+1)); score(doc) = mean ln p
    over the document's whitespace tokens (lowercased).  T = total
    corpus tokens, V = actual vocabulary size.

    Plan (the 100 TB shape): one token-keyed aggregate builds counts
    (map-side combined); the vocabulary is a TakeOrdered top-K (count
    DESC, token ASC — deterministic), broadcast with precomputed log
    probabilities; scoring is explode -> broadcast-hash left join ->
    per-doc aggregate.  Two shuffles total (token counts, doc scores);
    T and V are collected driver-side as plan constants (two scalar
    actions, the auto_resolution pattern).  Docs with zero tokens get a
    null score.
    """
    import math

    if vocab_size <= 0 or alpha <= 0:
        raise ValueError("vocab_size and alpha must be positive")
    toks = F.array_remove(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), "")
    grams = df.select(F.col(id_col), F.explode(toks).alias("__w"))
    counts = grams.groupBy("__w").agg(F.count("*").alias("__c"))
    totals = counts.agg(
        F.sum("__c").alias("T"), F.count("*").alias("D")).collect()[0]
    T = int(totals.T or 0)
    V = min(vocab_size, int(totals.D or 0))
    denom = float(T) + alpha * (V + 1)
    oov_logp = math.log(alpha / denom)
    vocab = (
        counts.orderBy(F.desc("__c"), F.asc("__w")).limit(vocab_size)
        .select("__w",
                F.log((F.col("__c") + F.lit(alpha)) / F.lit(denom))
                .alias("__logp"))
    )
    scored = (
        grams.join(F.broadcast(vocab), "__w", "left")
        .withColumn("__lp", F.coalesce(F.col("__logp"),
                                       F.lit(float(oov_logp))))
        .groupBy(id_col)
        .agg((F.sum("__lp") / F.count("*")).alias("logprob_score"),
             F.count("*").alias("n_tokens"))
    )
    return df.join(scored, id_col, "left")


def _quantile_col_name(p: float) -> str:
    """p25 / p50 / p75 / p95 for 2-digit probabilities, p9375-style
    4-digit names otherwise (e.g. 0.9375 -> ``p9375_tokens``)."""
    hund = p * 100.0
    if hund == int(hund):
        return f"p{int(hund)}_tokens"
    return f"p{int(round(p * 10000.0))}_tokens"


def profile_corpus(
    df: DataFrame,
    strata_col: str = "lang",
    text_col: str = "text",
    probs: tuple = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Per-stratum corpus profile — the dataset-card summary every
    training corpus ships with: document count, total/mean whitespace
    tokens, and EXACT token-count quantiles (linear interpolation —
    Spark's ``percentile``, not the approximate sketch, so the numbers
    are reproducible and oracle-checkable).

    Cross-engine reproducibility note: with a DYADIC probability
    (denominator a power of two — 0.25/0.5/0.75/0.9375) the R-7 rank
    fraction ``(n-1)*p - floor((n-1)*p)`` is itself dyadic for EVERY
    group size n, so ``lower + frac*(higher-lower)`` on integer data is
    exactly representable and identical regardless of the engine's
    interpolation op order.  Non-dyadic probabilities (0.95) can land a
    1-ulp apart between engines and flip a 6-dp rounding — pass
    ``probs=(0.25, 0.5, 0.75, 0.9375)`` when the output feeds a
    bit-exact comparison.

    Plan (the 100 TB shape): token counting is a map-side Catalyst
    projection; the single shuffle is the stratum-keyed aggregate.
    Exact percentile buffers each group's values on the reducer — fine
    for per-stratum cardinalities (one group per language/source); for
    billions-per-stratum switch to ``percentile_approx`` and accept the
    sketch error (documented trade-off).
    """
    probs_sql = ", ".join(repr(float(p)) for p in probs)
    tok = token_count(F.col(text_col))
    agg = (
        df.select(F.col(strata_col).alias("stratum"), tok.alias("__tok"))
        .groupBy("stratum")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__tok").alias("total_tokens"),
            F.avg("__tok").alias("mean_tokens"),
            F.expr(f"percentile(__tok, array({probs_sql}))")
            .alias("__q"),
        )
    )
    return agg.select(
        "stratum", "n_docs", "total_tokens", "mean_tokens",
        *[F.col("__q")[i].alias(_quantile_col_name(p))
          for i, p in enumerate(probs)],
    )


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: append all text-analysis columns in one projection."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_tokens_bpe": bpe_ish_token_count(t),
            "quality": quality_score(t),
            "lang_pred": lang_id(t),
            "fingerprint": fingerprint(t),
        }
    )
