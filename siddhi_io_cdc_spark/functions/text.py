"""Text-analysis operators for large-scale training-data pipelines.

Every operator here is built from ``pyspark.sql.functions`` only — whole-stage
codegen, zero per-row Python — so the same expressions hold at 100 TB. Each
has an exact ANSI-SQL restatement (see ``__spark_entry__.oracle_sql``), which
is what makes them oracle-checkable.

Scale notes: all transforms are narrow; aggregating wrappers (e.g. corpus
stats) are single hash-aggregations with map-side partial aggregation for
free. The CPU-heavy per-document operators apply ``util.fan_out`` first —
a repartition UP to the session's parallelism that is a no-op on wide
inputs but rescues compact row-group-bound scans, where the regex/array
work otherwise serializes on a handful of tasks (measured 10x on a
factor-20 corpus held in one parquet file).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from pyspark.sql import functions as F

from siddhi_io_cdc_spark.util import fan_out as _fan_out
from pyspark.sql.window import Window

#: BPE-ish token pattern: letter runs, digit runs, single punctuation marks.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Punctuation class used by quality scoring (explicit list — portable between
#: Java regex and RE2, unlike POSIX classes).
PUNCT_RE = r"[.,;:!?'\"()\[\]{}-]"

#: Small per-language marker-word profiles for the n-gram/stopword heuristic
#: language id. Ordered dict: ties break toward the earlier language.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "los", "las", "y", "es", "una"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["in", "it", "that", "for", "on", "as"]


def normalize_text(col: Column | str) -> Column:
    """Canonical form for dedup/fingerprinting: lowercase, trim, collapse
    whitespace runs to single spaces."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def word_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def token_count(col: Column | str, pattern: str = TOKEN_RE) -> Column:
    """BPE-ish token count: number of TOKEN_RE matches."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(pattern))


def _marker_count(col: Column, words: list[str]) -> Column:
    ascii_words = [w for w in words if w.isascii()]
    cnt = F.lit(0)
    if ascii_words:
        cnt = F.regexp_count(F.lower(col), F.lit(r"\b(" + "|".join(ascii_words) + r")\b"))
    for w in words:
        if not w.isascii():  # \b is undefined around CJK; plain substring count
            cnt = cnt + F.regexp_count(col, F.lit(w))
    return cnt


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-word hit counts (the language-id signal)."""
    c = F.col(col) if isinstance(col, str) else col
    return {lang: _marker_count(c, words) for lang, words in LANG_MARKERS.items()}


def lang_detect(col: Column | str) -> Column:
    """Heuristic language id: argmax of marker-word counts, ties broken by
    profile order, 'und' when no marker hits at all.

    Implemented as array_position(scores, array_max(scores)) — NOT a
    running-best ``when`` chain: conditional branches are excluded from
    Spark's subexpression elimination, so a chain re-evaluates the
    regex-count subtrees O(2^langs) times per row (measured 3.1 s for 5k
    docs at sf0.1; ~4× less in this form). First-index ties == the chain's
    strictly-greater-replaces semantics, so values are unchanged."""
    scores = lang_scores(col)
    arr = F.array(*scores.values())
    best = F.array_max(arr)
    lang = F.element_at(
        F.lit(list(scores)), F.array_position(arr, best).cast("int")
    )
    return F.when(best > 0, lang).otherwise(F.lit("und"))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-document statistics columns: ``n_chars_calc``, ``n_words``,
    ``n_tokens``, ``punct_ratio``, ``stopword_ratio``.

    fan_out: the regex/marker counting is the CPU; a compact parquet scan
    (row-group granularity) must not serialize it — no-op on wide inputs."""
    df = _fan_out(df)
    c = F.col(text_col)
    n_chars = F.length(c)
    n_words = word_count(c)
    stop_hits = _marker_count(c, STOPWORDS_EN)
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("n_tokens", token_count(c))
        .withColumn(
            "punct_ratio",
            F.round(F.regexp_count(c, F.lit(PUNCT_RE)) / F.greatest(n_chars, F.lit(1)), 6),
        )
        .withColumn("stopword_ratio", F.round(stop_hits / F.greatest(n_words, F.lit(1)), 6))
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: length band + stopword presence −
    punctuation excess. Deterministic arithmetic, SQL-restatable."""
    stats = text_stats(df, text_col)
    length_ok = (F.col("n_chars_calc") >= 100) & (F.col("n_chars_calc") <= 20000)
    score = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(F.col("stopword_ratio") > 0.05, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(F.col("punct_ratio") < 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return stats.withColumn("quality_score", F.round(score, 2))


def fingerprint(col: Column | str) -> Column:
    """Stable 128-bit document fingerprint: md5 of the normalized text.
    (md5 chosen deliberately: bit-identical in Spark and DuckDB, so the
    fingerprint itself is oracle-checkable.)"""
    return F.md5(normalize_text(col))


def word_ngrams(col: Column | str, n: int = 2) -> Column:
    """Array of word n-grams over the normalized text (space-joined).

    Pure array expressions (codegen'd): split → slide an ``n``-wide slice.
    Texts with fewer than ``n`` words yield an empty array (the ``when``
    guard matters: ``F.sequence(1, 0)`` would DESCEND, not return empty).
    """
    words = F.split(normalize_text(col), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.when(F.size(words) >= n, grams).otherwise(F.array().cast("array<string>"))


def top_ngrams(
    df: DataFrame, n: int = 2, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide top-k word n-grams: explode → count → deterministic top-k.

    Scale shape: explode is narrow; the count is one hash-aggregate with
    map-side combine (the n-gram key space is long-tailed, so partial
    aggregation collapses most of the volume before the shuffle); top-k is
    TakeOrdered (per-partition heap, no global sort). Ties break on the
    n-gram string so the result is total-ordered and hash-stable.

    The token array is materialized in its OWN projection before the
    n-gram transform: referencing ``split(normalize(text))`` inside the
    lambda would re-evaluate it per array element (higher-order functions
    don't CSE; multiple references block Catalyst's CollapseProject from
    inlining it — measured ~6x on this query).
    """
    words = _fan_out(df.select(F.col(text_col))).select(
        F.split(normalize_text(text_col), " ").alias("__w")
    )
    grams = F.when(
        F.size("__w") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("__w") - n + 1),
            lambda i: F.concat_ws(" ", F.slice(F.col("__w"), i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        words.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram"))
        .limit(k)
    )


#: PII patterns — written to mean the same thing in Java regex (Spark) and
#: RE2 (DuckDB): no lookaround, no POSIX classes. Scrub order matters:
#: emails first (their local part contains digits a phone pattern could eat),
#: then IPs (dotted quads), then phone-like digit runs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d ().-]{6,}\d"

#: Markup patterns for boilerplate stripping.
HTML_TAG_RE = r"<[^>]+>"
HTML_ENTITY_RE = r"&[A-Za-z]+;|&#[0-9]+;"


def distinctive_terms(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """TF-IDF-style keyword extraction: the ``k`` most distinctive terms
    per document, ranked by term frequency DESC, document frequency ASC,
    term ASC.

    This is the tf-idf ORDERING expressed in pure integers: for a fixed
    document, tf·idf is monotone in tf and antitone in df, so ranking by
    ``(tf desc, df asc)`` picks the same leaders as the float score while
    staying bit-exact in any engine (no log/rounding boundary to flip a
    rank) — which is what makes the result oracle-hashable.

    Scale shape: one explode (narrow) feeding BOTH aggregations — per-doc
    term counts and corpus document frequencies — then the df table (≤
    vocabulary size) BROADCASTS back onto the per-doc counts, and the final
    per-doc top-k is a row_number over the doc-key shuffle. No global sort,
    no join of two fact-sized sides.
    """
    from siddhi_io_cdc_spark.util import fan_out

    toks = fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "rank")
    )


def scrub_pii(col: Column | str) -> Column:
    """Mask emails / IPv4s / phone-like digit runs with ``[EMAIL]`` /
    ``[IP]`` / ``[PHONE]`` tokens.

    A standard training-data hygiene pass; regex-only, so it stays inside
    whole-stage codegen. Bracket tokens (not angle brackets) so a later
    markup strip cannot eat the placeholders.
    """
    c = F.regexp_replace(col, EMAIL_RE, "[EMAIL]")
    c = F.regexp_replace(c, IP_RE, "[IP]")
    return F.regexp_replace(c, PHONE_RE, "[PHONE]")


def strip_markup(col: Column | str) -> Column:
    """Drop HTML tags and entities, collapse the leftover whitespace.

    The cheap deterministic boilerplate pass (full DOM-aware extraction
    needs an external parser — out of scope by design); run it BEFORE
    ``scrub_pii`` so tag attributes can't hide PII.
    """
    c = F.regexp_replace(col, HTML_TAG_RE, " ")
    c = F.regexp_replace(c, HTML_ENTITY_RE, " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (Gopher-style quality filters).

    Adds ``dup_word_frac`` (1 − distinct/total words) and ``dup_bigram_frac``
    (1 − distinct/total word 2-grams): high values flag boilerplate/spam
    documents that token-level dedup misses. Pure array expressions — the
    token array is staged once (higher-order functions don't CSE).
    """
    words = F.split(normalize_text(text_col), " ")
    staged = _fan_out(df).withColumn("__w", words)
    grams = F.when(
        F.size("__w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__w") - 1),
            lambda i: F.concat_ws(" ", F.slice(F.col("__w"), i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = staged.withColumn("__g", grams)
    frac = lambda arr: F.when(
        F.size(arr) > 0,
        F.round(1.0 - F.size(F.array_distinct(arr)) / F.size(arr), 6),
    ).otherwise(F.lit(0.0))
    return staged.withColumn("dup_word_frac", frac(F.col("__w"))).withColumn(
        "dup_bigram_frac", frac(F.col("__g"))
    ).drop("__w", "__g")


def _hex_bucket(id_col: str, salt: str) -> Column:
    """First 8 hex chars of md5(salt || id): uniform in [0, 16^8), compared
    LEXICOGRAPHICALLY against a hex threshold (lowercase hex order == numeric
    order) — bit-identical in every engine that has md5, no bigint conv."""
    return F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8)


def _rate_threshold(rate: float) -> str:
    return format(min(int(rate * 16**8), 16**8 - 1), "08x")


def deterministic_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Reproducible ``rate``-sample keyed on identity, not randomness.

    A row is kept iff the first 8 hex digits of ``md5(salt || id)`` fall
    under ``rate`` — the same rows are selected on every engine, every run,
    every partitioning (Spark's ``sample()`` is seed-deterministic but
    partition-dependent; this is not, and it is oracle-checkable). Change
    ``salt`` to draw an independent sample.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return df
    return df.where(_hex_bucket(id_col, salt) < F.lit(_rate_threshold(rate)))


def stratified_sample(
    df: DataFrame, rates: dict[str, float], stratum_col: str, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages/sources in a training mix). ``rates`` maps stratum value →
    keep rate; strata not listed are dropped. Same md5 mechanism as
    :func:`deterministic_sample` — reproducible and engine-portable."""
    for v, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {v!r} must be in [0, 1], got {r}")
    bucket = _hex_bucket(id_col, salt)
    keep = F.lit(False)
    for v, r in rates.items():
        in_stratum = F.col(stratum_col) == v
        keep = F.when(
            in_stratum, F.lit(True) if r >= 1.0 else bucket < F.lit(_rate_threshold(r))
        ).otherwise(keep)
    return df.where(keep)


def canonicalize_url(col: Column | str) -> Column:
    """Canonical URL for web-corpus dedup: lowercase, scheme and ``www.``
    stripped, query string / fragment / explicit port / trailing slashes
    dropped. The standard CommonCrawl-style URL key — two crawls of the
    same page under http/https, with/without tracking params, hash to the
    same document group. Pure regexp chain, fully codegen-side.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(F.trim(c))
    c = F.regexp_replace(c, r"^[a-z][a-z0-9+.-]*://", "")  # scheme
    c = F.regexp_replace(c, r"^www\.", "")
    c = F.regexp_replace(c, r"[?#].*$", "")  # query string / fragment
    c = F.regexp_replace(c, r":\d+(?=/|$)", "")  # explicit port
    return F.regexp_replace(c, r"/+$", "")  # trailing slashes


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Group documents by canonical URL: ``(canonical_url, doc_id, n_copies)``
    keeping the smallest id per group — one hash-aggregate, same single-
    shuffle shape as :func:`dedup_exact` (functions/dedup.py)."""
    return (
        df.groupBy(canonicalize_url(url_col).alias("canonical_url"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def c4_line_filters(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style structural line filters: per document, append

    - ``n_lines`` — number of ``\\n``-separated non-empty lines;
    - ``n_punct_lines`` — lines ending in terminal punctuation (``.!?"``),
      the C4 "keep lines that end in punctuation" signal;
    - ``n_short_lines`` — lines with fewer than 3 whitespace words
      (C4 drops them);
    - ``c4_keep`` — the document-level rule: at least one line, and at
      least half the lines end in terminal punctuation.

    All array expressions over one ``split``, no Python; ``fan_out``
    widens a row-group-bound compact scan first (no-op on wide inputs).
    (C4 reference: Raffel et al. 2020, §2.2 heuristics.)
    """
    df = _fan_out(df)
    c = F.col(text_col)
    lines = F.filter(F.split(c, "\n"), lambda ln: F.trim(ln) != "")
    n_lines = F.size(lines)
    punct = F.size(F.filter(lines, lambda ln: F.trim(ln).rlike('[.!?"]$')))
    short = F.size(
        F.filter(lines, lambda ln: F.size(F.split(F.trim(ln), r"\s+")) < 3)
    )
    return (
        df.withColumn("n_lines", n_lines)
        .withColumn("n_punct_lines", punct)
        .withColumn("n_short_lines", short)
        .withColumn(
            "c4_keep",
            (n_lines > 0) & (F.col("n_punct_lines") * 2 >= F.col("n_lines")),
        )
    )


#: The Gopher stop-word set (Rae et al. 2021, appendix A1.1): a document
#: must contain at least 2 of these to pass the repetition/quality gate.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document quality filters (Rae et al. 2021 §A1.1, the
    rule set FineWeb/Dolma re-use): per-document metrics plus the composite
    ``gopher_keep`` flag. Pure array/aggregate expressions, no Python —
    and every metric restates in ANSI SQL, so the contract query has an
    exact value oracle. ``fan_out`` widens a row-group-bound compact scan
    before the regex pass (measured 10x at factor-20 scale; no-op on wide
    inputs).

    Rules (thresholds per the paper):
    - word count in [50, 100_000]; mean word length in [3, 10]
    - symbol-to-word ratio (``#`` or ``…``/``...``) <= 0.1
    - <= 90% of lines start with a bullet; <= 30% end with an ellipsis
    - >= 80% of words contain at least one alphabetic character
    - at least 2 distinct Gopher stop-words present

    Words are whitespace runs of the RAW text (the paper filters on
    surface form, unlike the lowercased ``TOKEN_RE`` token family); the
    stop-word test lowercases only for the membership check.
    """
    # min_bytes_per_slot=0: the six regex/array passes here are an order of
    # magnitude more CPU per input byte than the generic text ops the size
    # threshold was tuned for — measured warm at sf0.1 (noop-sink, best of
    # 3): 1.24 s thresholded vs 0.59 s always-widened (round-9 reclaim of
    # the r8 warm creep; sf1/sf2 widen either way).
    df = _fan_out(df, min_bytes_per_slot=0)
    c = F.col(text_col)
    words = F.filter(F.split(c, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    safe_n = F.greatest(n_words, F.lit(1))
    mean_wl = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    ) / safe_n
    n_symbols = (
        F.size(F.split(c, "#", -1)) - 1
        + F.size(F.split(c, "…", -1)) - 1
        + F.size(F.split(c, r"\.\.\.", -1)) - 1
    )
    lines = F.filter(F.split(c, "\n"), lambda ln: F.trim(ln) != "")
    n_lines = F.size(lines)
    safe_lines = F.greatest(n_lines, F.lit(1))
    bullet_frac = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•]"))
    ) / safe_lines
    ellipsis_frac = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).rlike(r"(\.\.\.|…)$"))
    ) / safe_lines
    alpha_frac = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ) / safe_n
    lowered = F.transform(words, lambda w: F.lower(w))
    n_stop = F.size(
        F.filter(
            F.lit(GOPHER_STOPWORDS).cast("array<string>"),
            lambda s: F.array_contains(lowered, s),
        )
    )
    out = (
        df.withColumn("g_n_words", n_words)
        .withColumn("g_mean_word_len", F.round(mean_wl, 6))
        .withColumn("g_symbol_ratio", F.round(n_symbols / safe_n, 6))
        .withColumn("g_bullet_frac", F.round(bullet_frac, 6))
        .withColumn("g_ellipsis_frac", F.round(ellipsis_frac, 6))
        .withColumn("g_alpha_frac", F.round(alpha_frac, 6))
        .withColumn("g_n_stopwords", n_stop)
    )
    keep = (
        (F.col("g_n_words") >= 50)
        & (F.col("g_n_words") <= 100_000)
        & (F.col("g_mean_word_len") >= 3)
        & (F.col("g_mean_word_len") <= 10)
        & (F.col("g_symbol_ratio") <= 0.1)
        & (F.col("g_bullet_frac") <= 0.9)
        & (F.col("g_ellipsis_frac") <= 0.3)
        & (F.col("g_alpha_frac") >= 0.8)
        & (F.col("g_n_stopwords") >= 2)
    )
    return out.withColumn("gopher_keep", keep)


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_n: int = 50
) -> DataFrame:
    """Corpus-wide adjacent-symbol pair counts over word-internal
    characters — one counting round of BPE tokenizer training (Sennrich et
    al. 2016): the highest-count pair is the next merge a BPE trainer would
    learn. Words are lowercased alphabetic runs (pre-tokenization); each
    word of length L contributes its L−1 adjacent character pairs, WEIGHTED
    by the word's corpus frequency — exactly the statistic the classic
    word-frequency-table formulation counts.

    Two shuffles total, both tiny after map-side combine: the word-frequency
    aggregate (vocabulary-sized), then per-word pair explosion OF THE
    VOCABULARY (never of the corpus — a word's pairs are counted once and
    scaled by its frequency, so a 100 TB corpus costs one word-count pass
    plus vocabulary-sized work) and the pair aggregate. Returns the top
    ``top_n`` pairs as ``(left, right, pair_count)``, count-desc then
    lexicographic — deterministic, SQL-restatable.
    """
    words = (
        _fan_out(df.select(F.col(text_col)))
        .select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
            ).alias("__w")
        )
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__freq"))
        .where(F.length("__w") >= 2)
    )
    chars = F.split(F.col("__w"), "")
    pairs = F.zip_with(
        F.slice(chars, 1, F.length("__w") - 1),
        F.slice(chars, 2, F.length("__w") - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        words.select(F.explode(pairs).alias("__p"), "__freq")
        .groupBy(F.col("__p.l").alias("left"), F.col("__p.r").alias("right"))
        .agg(F.sum("__freq").cast("bigint").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "left", "right")
        .limit(top_n)
    )
