"""Training-data export operators: deterministic shard + shuffle, sequence
packing, chunking, and unigram-LM scoring.

These are the last mile of a large-scale training-data pipeline: after
dedup/filtering (``functions.dedup`` / ``functions.text``), the corpus must
be split into shards, shuffled deterministically (so re-runs produce
byte-identical exports), packed into fixed-context training sequences, and
optionally filtered by a language-model score (CCNet-style; Wenzek et al.
2020 use a 5-gram LM, this implements the unigram case exactly).

Everything here is pure ``pyspark.sql.functions`` — no Python UDFs — and
every operator is restatable in ANSI SQL, so each ships with an exact DuckDB
oracle in ``__spark_entry__.py``.

Scale notes (100 TB):
- ``stable_hash`` is md5-based rather than ``xxhash64`` so that shard
  assignment is reproducible OUTSIDE Spark (any engine with md5 can compute
  which shard a document landed in). 60 bits of the digest are used.
- ``shard_for_training`` costs exactly one shuffle (by shard), which the
  subsequent partitioned write needs anyway; the within-shard shuffle order
  falls out of the same hash, so no second sort pass.
- ``pack_sequences`` computes its running token total per shard, never
  globally — a global cumulative sum would serialize into one task. Each
  shard's window sorts only that shard's rows.
- ``unigram_logprob`` aggregates the vocabulary once (one shuffle on
  token); the per-token lookup broadcasts only when the measured
  vocabulary fits ``broadcast_vocab_max``, else it shuffle-joins — TOKEN_RE
  admits digit runs and punctuation, so a web-scale vocabulary is not
  guaranteed broadcastable. The tokenized view is persisted (it feeds both
  the vocabulary aggregate and the scoring join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window

from pyspark.sql import functions as F

from siddhi_io_cdc_spark.util import fan_out as _fan_out

from siddhi_io_cdc_spark.functions.text import TOKEN_RE, token_count

#: Separator between the seed and the key inside the hash preimage — keeps
#: (seed="1", id="23") distinct from (seed="12", id="3").
_HASH_SEP = "\x1f"


def stable_hash(col: Column, seed: int = 0) -> Column:
    """Deterministic 60-bit non-negative hash of ``col``, portable across
    engines: ``int(md5(seed || 0x1f || str(col))[:15 hex], 16)``. Unlike
    ``F.xxhash64`` this has an exact restatement anywhere md5 exists
    (DuckDB: ``CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)``)."""
    preimage = F.concat_ws(_HASH_SEP, F.lit(str(seed)), col.cast("string"))
    return F.conv(F.md5(preimage).substr(1, 15), 16, 10).cast("bigint")


def shard_for_training(
    df: DataFrame,
    num_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every row a ``shard`` in [0, num_shards) and a deterministic
    pseudo-random ``shard_pos`` within its shard.

    A training-data export wants (a) fixed-count shards sized for the data
    loader, (b) rows shuffled WITHIN each shard so sequential reads see
    decorrelated documents, and (c) bit-reproducibility across re-runs —
    which rules out ``F.rand``. Hashing the id gives all three: the hash
    picks the shard, and ordering by the same hash inside the shard is a
    deterministic shuffle. One shuffle total (by shard), which the
    partitioned write needs anyway; ``row_number`` sorts each shard's rows
    within its own partition.
    """
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive (got {num_shards})")
    h = stable_hash(F.col(id_col), seed)
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(id_col))
    return (
        df.withColumn("__h", h)
        .withColumn("shard", F.pmod(F.col("__h"), F.lit(num_shards)).cast("bigint"))
        .withColumn("shard_pos", (F.row_number().over(w) - 1).cast("bigint"))
        .drop("__h")
    )


def pack_sequences(
    df: DataFrame,
    ctx_len: int,
    num_shards: int = 32,
    seed: int = 0,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing: within each shard, documents are
    laid end-to-end in id order and sliced into ``ctx_len``-token training
    sequences (the GPT-style packing scheme).

    Emits per document: ``shard``, ``seq_id`` (which fixed-length sequence
    its FIRST token lands in), ``seq_offset`` (token offset inside that
    sequence), and ``n_tokens``. A document whose tokens straddle a sequence
    boundary continues into the next sequence — consumers slice the
    concatenated stream, so no padding is wasted (documents are not aligned
    up to sequence boundaries).

    Packing is per-shard, not global: a global running total would order the
    whole corpus through one window task. Sharding first (same
    ``stable_hash`` as :func:`shard_for_training`) keeps every cumulative
    sum local to its shard's partition while staying deterministic.
    """
    if ctx_len <= 0:
        raise ValueError(f"ctx_len must be positive (got {ctx_len})")
    toks = (
        F.col(tokens_col).cast("bigint")
        if tokens_col
        else token_count(F.col(text_col)).cast("bigint")
    )
    if tokens_col is None:
        # tokenizing here: widen a row-group-bound scan before the regex
        # pass (no-op on wide inputs; the shard window reshuffles anyway)
        df = _fan_out(df)
    h = stable_hash(F.col(id_col), seed)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        df.withColumn("n_tokens", toks)
        .withColumn("shard", F.pmod(h, F.lit(num_shards)).cast("bigint"))
        .withColumn("__cum", cum_before)
        .select(
            id_col,
            "shard",
            F.floor(F.col("__cum") / ctx_len).cast("bigint").alias("seq_id"),
            F.pmod(F.col("__cum"), F.lit(ctx_len)).cast("bigint").alias("seq_offset"),
            "n_tokens",
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_chars: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-width character chunks with optional
    overlap — the pre-tokenization chunking step for long-document corpora
    (and for embedding models with bounded input).

    Chunk ``i`` covers ``[i * (chunk_chars - overlap), ... + chunk_chars)``;
    the last chunk may be shorter. Pure array expressions
    (``sequence`` → ``transform(substring)`` → ``posexplode``), no Python —
    chunking 100 TB is a map-only pass. ``fan_out`` widens a row-group-bound
    compact scan first (no-op on wide inputs).
    """
    if chunk_chars <= 0:
        raise ValueError(f"chunk_chars must be positive (got {chunk_chars})")
    if not 0 <= overlap < chunk_chars:
        raise ValueError(f"overlap must be in [0, chunk_chars) (got {overlap})")
    stride = chunk_chars - overlap
    n_chunks = F.greatest(
        F.ceil((F.length(text_col) - F.lit(overlap)) / stride), F.lit(1)
    ).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        starts, lambda i: F.col(text_col).substr(i * stride + 1, F.lit(chunk_chars))
    )
    pos = F.posexplode(chunks)
    return _fan_out(df).select(id_col, pos.alias("chunk_idx", "chunk_text")).select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        "chunk_text",
    )


def chunk_documents_tokens(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-width TOKEN windows with optional
    overlap — the chunking unit embedding models actually bound on (the
    character variant :func:`chunk_documents` can split mid-token).

    Tokens are ``TOKEN_RE`` matches over the raw text (same tokenizer as
    ``token_count``); chunk ``i`` covers tokens
    ``[i * (chunk_tokens - overlap), ... + chunk_tokens)`` and is re-joined
    with single spaces (token-normalized output — original inter-token
    whitespace is not preserved). The last chunk may be shorter; an empty
    document yields one empty chunk. Pure array expressions
    (``regexp_extract_all`` → ``sequence`` → ``transform(slice)`` →
    ``posexplode``), no Python — a map-only pass at any scale. ``fan_out``
    widens a row-group-bound compact scan first (no-op on wide inputs;
    on a streaming micro-batch it spreads the chunk/tokenize work too).
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive (got {chunk_tokens})")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"overlap must be in [0, chunk_tokens) (got {overlap})")
    stride = chunk_tokens - overlap
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)
    n_chunks = F.greatest(
        F.ceil((F.size(toks) - F.lit(overlap)) / stride), F.lit(1)
    ).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            F.array_join(F.slice(toks, i * stride + 1, chunk_tokens), " ").alias("txt"),
            F.size(F.slice(toks, i * stride + 1, chunk_tokens)).alias("nt"),
        ),
    )
    pos = F.posexplode(chunks)
    return _fan_out(df).select(id_col, pos.alias("chunk_idx", "chunk")).select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("chunk.txt").alias("chunk_text"),
        F.col("chunk.nt").cast("bigint").alias("chunk_tokens"),
    )


def quantile_buckets(
    df: DataFrame,
    score_col: str,
    cuts: tuple[float, ...] = (1 / 3, 2 / 3),
    group_col: str | None = None,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    bucket_col: str = "bucket",
) -> DataFrame:
    """Assign each row a quantile bucket of ``score_col`` — CCNet's
    head/middle/tail perplexity split (Wenzek et al. 2020) when fed an LM
    score and grouped by language. ``len(labels)`` must be
    ``len(cuts) + 1``; rows with NULL score get a NULL bucket.

    Cutoffs come from ONE exact ``percentile`` aggregate (per ``group_col``
    when given, else global), broadcast back onto the data — the corpus
    itself never shuffles, so at 100 TB this is a tiny aggregate plus a
    map-only labeling pass. Cutoffs are rounded to 9 decimals before
    comparison: linear-interpolation formulas legitimately differ by 1 ulp
    across engines (``lo + f·(hi−lo)`` vs ``(1−f)·lo + f·hi``), and when a
    cutoff lands exactly ON a score value that ulp decides the boundary
    row's bucket (observed at sf0.1 — Spark 3.401546 vs DuckDB
    3.4015459999999997). Rounding far below score precision (scores carry
    6 dp) but far above ulp noise makes the label deterministic across
    engines without moving any real boundary.
    """
    if len(labels) != len(cuts) + 1:
        raise ValueError(
            f"need len(cuts)+1 labels (got {len(cuts)} cuts, {len(labels)} labels)"
        )
    if list(cuts) != sorted(cuts) or not all(0 < c < 1 for c in cuts):
        raise ValueError(f"cuts must be ascending fractions in (0,1) (got {cuts})")
    pct = F.transform(
        F.percentile(F.col(score_col), F.array(*[F.lit(float(c)) for c in cuts])),
        lambda x: F.round(x, 9),
    )
    if group_col is None:
        cutoffs = df.agg(pct.alias("__cuts"))
        labeled = df.crossJoin(F.broadcast(cutoffs))
    else:
        cutoffs = df.groupBy(group_col).agg(pct.alias("__cuts"))
        labeled = df.join(F.broadcast(cutoffs), group_col)
    bucket = F.lit(labels[-1])
    for i in range(len(cuts) - 1, -1, -1):
        bucket = F.when(F.col(score_col) <= F.col("__cuts")[i], labels[i]).otherwise(
            bucket
        )
    bucket = F.when(F.col(score_col).isNull(), F.lit(None).cast("string")).otherwise(
        bucket
    )
    return labeled.withColumn(bucket_col, bucket).drop("__cuts")


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab_max: int | None = 5_000_000,
) -> DataFrame:
    """Per-document mean negative log-probability under the corpus's own
    bigram LM: ``avg(-ln(c(w1,w2) / c(w1,·)))`` over the document's bigram
    positions — one step up the n-gram ladder from :func:`unigram_logprob`
    toward CCNet's 5-gram filter (Wenzek et al. 2020). Because the LM is
    trained on the scored corpus itself, every document bigram has count
    ≥ 1 — no smoothing needed for exactness. Documents with fewer than two
    tokens get NULL.

    Bigrams are built ARRAY-SIDE (zip of the token array with its own
    1-shifted slice), so the only shuffles are the bigram-vocabulary
    aggregate and the final per-document regroup; the context count
    ``c(w1,·)`` is an exact second aggregate OF the bigram table (sum of
    bigram counts per first token — cheaper than re-tokenizing, and equal to
    it by construction). The per-position lookup broadcasts only when the
    measured bigram vocabulary is at most ``broadcast_vocab_max`` (a bigram
    vocabulary grows much faster than a unigram one), else it shuffle-joins.
    """
    from siddhi_io_cdc_spark.util import scoped_persist, tag_caches

    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = scoped_persist(
        _fan_out(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), F.explode(pairs).alias("__bg")).select(
            id_col, F.col("__bg.w1").alias("__w1"), F.col("__bg.w2").alias("__w2")
        )
    )
    # eager materialization, size-gated like the KN hierarchy: checkpoint
    # while the measured estimate stays vocab-sized, persist (lineage
    # kept) above — the vocabulary feeds the context aggregate, the
    # broadcast-guard count and the lm join (see _kn_lower_orders /
    # _kn_materialize for the measured rationale and trade-off)
    vocab = _kn_materialize(big.groupBy("__w1", "__w2").agg(
        F.count("*").alias("__c12")
    ))
    ctx = vocab.groupBy("__w1").agg(F.sum("__c12").alias("__c1"))
    use_broadcast = (
        broadcast_vocab_max is None or vocab.count() <= broadcast_vocab_max
    )
    lm = vocab.join(ctx, "__w1").select(
        "__w1", "__w2", (F.col("__c12") / F.col("__c1")).alias("__p")
    )
    scored = (
        big.join(F.broadcast(lm) if use_broadcast else lm, ["__w1", "__w2"])
        .groupBy(id_col)
        .agg(
            F.round(F.avg(-F.log("__p")), 6).alias("bigram_nll"),
            F.count("*").cast("bigint").alias("n_bigrams"),
        )
    )
    out = df.select(id_col).distinct().join(scored, id_col, "left")
    return tag_caches(out, [big])


def kneser_ney_logprob(
    df: DataFrame,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab_max: int | None = 5_000_000,
) -> DataFrame:
    """Per-document mean negative log-probability under an interpolated
    Kneser-Ney bigram LM (Kneser & Ney 1995; Chen & Goodman 1998 eq. 4.24)
    trained on the scored corpus itself — the smoothing KenLM applies,
    i.e. what CCNet actually scores with (Wenzek et al. 2020), one step
    past the MLE ladder (:func:`bigram_logprob`):

        P(w2|w1) = max(c(w1,w2) - D, 0)/c(w1)
                 + (D * N1+(w1,.)/c(w1)) * (N1+(.,w2) / N1+(.,.))

    where ``N1+`` are the continuation-type counts. Unlike the MLE rungs
    this assigns mass to UNSEEN bigrams, so the score separates "common
    words in novel orders" (natural text) from "common words in common
    orders" (boilerplate) — the actual CCNet discrimination signal.

    Every quantity is an exact integer count off the bigram-vocabulary
    table; the probability is a fixed-shape arithmetic tree over them
    (both engines evaluate the identical association order), so the oracle
    restates it verbatim. Shuffles: the bigram vocabulary aggregate, three
    VOCABULARY-sized aggregates for c(w1)/N1+(w1,.)/N1+(.,w2) (plus one
    1-row type total), the lookup join (broadcast under the same measured
    guard as :func:`bigram_logprob`), and the per-document regroup —
    corpus-sized data crosses the wire once.

    Documents with fewer than two tokens get NULL scores.
    """
    from siddhi_io_cdc_spark.util import scoped_persist, tag_caches

    if not 0 < discount < 1:
        raise ValueError(f"discount must be in (0, 1) (got {discount})")
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = scoped_persist(
        _fan_out(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), F.explode(pairs).alias("__bg"))
        .select(
            id_col, F.col("__bg.w1").alias("__w1"), F.col("__bg.w2").alias("__w2")
        )
    )
    # eager materialization, size-gated like the KN hierarchy (see
    # _kn_materialize): the vocabulary feeds the three statistic
    # aggregates, the guard count and the lm join chain
    vocab = _kn_materialize(big.groupBy("__w1", "__w2").agg(
        F.count("*").cast("bigint").alias("__c12")
    ))
    # All three KN statistics are aggregates OF the (tiny) vocabulary table:
    # c(w1) = sum of bigram counts, N1+(w1,.) / N1+(.,w2) = row counts per
    # side, N1+(.,.) = the vocabulary's own row count.
    left = vocab.groupBy("__w1").agg(
        F.sum("__c12").cast("bigint").alias("__c1"),
        F.count("*").cast("bigint").alias("__n1p_w1"),
    )
    right = vocab.groupBy("__w2").agg(F.count("*").cast("bigint").alias("__n1p_w2"))
    types = vocab.agg(F.count("*").cast("bigint").alias("__n_types"))
    use_broadcast = (
        broadcast_vocab_max is None or vocab.count() <= broadcast_vocab_max
    )
    d = F.lit(float(discount))
    # fixed-shape arithmetic tree — the oracle restates this association
    # order token for token
    p = (
        F.greatest(F.col("__c12").cast("double") - d, F.lit(0.0))
        / F.col("__c1").cast("double")
    ) + (d * F.col("__n1p_w1").cast("double") / F.col("__c1").cast("double")) * (
        F.col("__n1p_w2").cast("double") / F.col("__n_types").cast("double")
    )
    lm = (
        vocab.join(left, "__w1")
        .join(right, "__w2")
        .crossJoin(F.broadcast(types))
        .select("__w1", "__w2", p.alias("__p"))
    )
    scored = (
        big.join(F.broadcast(lm) if use_broadcast else lm, ["__w1", "__w2"])
        .groupBy(id_col)
        .agg(
            F.round(F.avg(-F.log("__p")), 6).alias("kn_nll"),
            F.count("*").cast("bigint").alias("n_bigrams"),
        )
    )
    out = df.select(id_col).distinct().join(scored, id_col, "left")
    return tag_caches(out, [big])


def _gram_rows(df, n, id_col, text_col):
    """One row per n-gram OCCURRENCE, ``(id_col, __w1..__wn)`` — the
    shared explode both the batch scorers and the CDC-maintained LM state
    (``streaming/ngram_lm.py``) are built from, so their counts agree by
    construction."""
    toks = F.col("__toks")
    length = F.size(toks)
    positions = F.when(
        length >= n, F.sequence(F.lit(1), length - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = F.transform(
        positions,
        lambda p: F.struct(
            *[F.element_at(toks, p + i).alias(f"__w{i + 1}") for i in range(n)]
        ),
    )
    wcols = [f"__w{i + 1}" for i in range(n)]
    return (
        # min_bytes_per_slot=0: tokenize + per-position struct-gather +
        # explode is heavy per input byte (same call-site measurement as
        # ngram_logprob's)
        _fan_out(df.select(F.col(id_col), F.col(text_col)), min_bytes_per_slot=0)
        .select(
            F.col(id_col),
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0
            ).alias("__toks"),
        )
        .select(F.col(id_col), F.explode(gram).alias("__g"))
        .select(id_col, *[F.col(f"__g.{w}").alias(w) for w in wcols])
    )


#: Plan-stats bytes above which an LM vocabulary/hierarchy level REFUSES
#: the eager ``localCheckpoint`` and falls back to ``scoped_persist`` + an
#: eager count (lineage KEPT). localCheckpoint stores the table in
#: executor memory/disk with NO lineage — fine for model/vocab-sized
#: tables (the repo's lineage rule), but an n-gram vocabulary approaches
#: one row per corpus position as n grows, so checkpointing it at 100 TB
#: is a §5 memory/spill hazard and turns any executor loss into a job
#: kill. The gate uses the same Catalyst plan-stats proxy as ``fan_out``
#: / ``_BCAST_LABELS_MIN_CORPUS``. Calibration (measured r16): for a
#: fresh aggregate over the persisted gram explode the estimate is the
#: COMPRESSED projected-scan bytes — sf0.1 top-order estimate 0.24 MiB
#: vs ≈10 MiB materialized, sf2 (20x corpus) 4.7 MiB vs ≈199 MiB, i.e.
#: ≈40x under — while an aggregate over an already-materialized persisted
#: parent reports ACTUAL cached bytes. The 2 MiB default therefore caps a
#: no-lineage table at ≈100 MiB materialized (comfortably vocab-sized),
#: keeps every shipped bench SF (≤ sf0.1) on the measured checkpoint fast
#: path, and flips the 10x/20x scale-series corpora to the
#: lineage-keeping branch. In production, size it to a modest fraction of
#: per-executor storage memory.
_KN_CHECKPOINT_MAX_BYTES = 2 * 1024 * 1024


def _kn_materialize(level, unknown_checkpoints=False):
    """Materialize one KN hierarchy level eagerly, gated on its measured
    (plan-stats) size: ``localCheckpoint`` up to
    ``_KN_CHECKPOINT_MAX_BYTES`` (leaf scan — every later reference
    analyzes instantly), ``scoped_persist`` + eager ``count()`` above it
    (lineage kept, blocks can spill and recompute; the count materializes
    the cache NOW so the cascade still builds sequentially instead of
    racing inside the final plan's broadcast builds — the r15 lazy-persist
    failure mode). ``unknown_checkpoints`` picks the branch for a missing
    estimate: lower orders derive from an already-materialized parent
    (checkpoint leaves carry no stats) and are grouped projections of it —
    strictly smaller, so unknown means "child of a small-enough table" and
    checkpoints; the top order's unknown means "corpus lineage, no
    estimate" and persists (the conservative branch at scale)."""
    from siddhi_io_cdc_spark.util import _plan_size_bytes, scoped_persist

    size = _plan_size_bytes(level)
    small = (
        size <= _KN_CHECKPOINT_MAX_BYTES if size is not None
        else unknown_checkpoints
    )
    if small:
        return level.localCheckpoint()
    level = scoped_persist(level)
    level.count()
    return level


def _kn_lower_orders(a_n, wcols, n, persist_lower=False, on_level=None):
    """The KenLM adjusted-count hierarchy below the top order: recursive
    distinct-predecessor continuation counts
    ``a_k(w^k) = |{v : a_{k+1}(v·w^k) > 0}|`` derived from ``a[n]`` alone
    — each table keyed by gram POSITIONS n-k+1..n so every later join is
    a plain column-name equi-join.

    ``persist_lower`` materializes each level EAGERLY, via
    :func:`_kn_materialize` — ``localCheckpoint`` while the level's
    plan-stats estimate is at most ``_KN_CHECKPOINT_MAX_BYTES``,
    ``scoped_persist`` + count (lineage kept) above it: the lm join chain
    references these tables
    ~10 times across its ctx aggregates, suffix joins and broadcast
    builds, and every ACTION's analysis re-canonicalizes a persisted
    subtree per reference (CacheManager lookup) while a checkpoint is a
    leaf scan of already-stored UnsafeRows; eager checkpointing also
    materializes the chain SEQUENTIALLY (level k from the stored level
    k+1) instead of racing inside the concurrently-submitted broadcast
    builds. Measured paired at sf0.1 n=5: 9.5 → 6.2 s for the 5-gram
    scorer. Trade-off vs persist: no lineage to recompute a lost block
    from — these are the hierarchy's count tables (strictly shrinking
    derived aggregates), so a failure means re-running the scorer, not
    silent wrong answers; the corpus-sized gram table keeps persist and
    full lineage.

    ``on_level(k, a_k)`` (honored only with ``persist_lower``) fires as
    each level finishes materializing, top order first — the overlap hook:
    the cascade's levels run small coalesced jobs that leave most cores
    idle, so callers schedule each level's DERIVED work (ctx aggregates,
    guard counts, count-of-count collects) on background threads while the
    cascade walks down (guide-§2.6 back-fill; results are unaffected by
    scheduling)."""
    a: dict[int, DataFrame] = {n: a_n}
    if persist_lower and on_level is not None:
        on_level(n, a_n)
    for k in range(n - 1, 0, -1):
        lower = a[k + 1].groupBy(*wcols[n - k:]).agg(
            F.count("*").cast("bigint").alias(f"__a{k}")
        )
        a[k] = (
            _kn_materialize(lower, unknown_checkpoints=True)
            if persist_lower else lower
        )
        if persist_lower and on_level is not None:
            on_level(k, a[k])
    return a


def _kn_hierarchy(df, n, id_col, text_col, persist_lower=False, on_level=None):
    """Shared front half of both n-gram Kneser-Ney scorers: the exploded
    n-gram table plus the adjusted-count hierarchy ``a[1..n]`` (raw counts
    at the top order via :func:`_gram_rows`, continuation counts below via
    :func:`_kn_lower_orders`). ``persist_lower`` additionally materializes
    the whole hierarchy a[n]..a[1] via eager ``localCheckpoint`` (see
    :func:`_kn_lower_orders` for the measured rationale and trade-off);
    the corpus-sized gram table always keeps ``persist`` + full lineage.
    ``on_level`` passes through to :func:`_kn_lower_orders`."""
    from siddhi_io_cdc_spark.util import scoped_persist

    wcols = [f"__w{i + 1}" for i in range(n)]
    grams = scoped_persist(_gram_rows(df, n, id_col, text_col))
    a_n = grams.groupBy(*wcols).agg(F.count("*").cast("bigint").alias(f"__a{n}"))
    # The top order is the size-gated level that actually bites: at n=5 the
    # gram vocabulary approaches one row per corpus position, so above
    # _KN_CHECKPOINT_MAX_BYTES it keeps lineage (persist) instead of the
    # lineage-cutting checkpoint.
    a_n = _kn_materialize(a_n) if persist_lower else scoped_persist(a_n)
    return grams, _kn_lower_orders(a_n, wcols, n, persist_lower, on_level), wcols


def _kn_ctx_fixed_agg(ak, wcols, n, k):
    """One order's fixed-discount context stats: total mass ``s_k`` and
    continuation-type count ``t_k`` per context."""
    return ak.groupBy(*wcols[n - k:-1]).agg(
        F.sum(f"__a{k}").cast("bigint").alias(f"__s{k}"),
        F.count("*").cast("bigint").alias(f"__t{k}"),
    )


def _kn_ctx_modified_agg(ak, wcols, n, k):
    """One order's modified-KN context stats: total mass ``s_k`` plus the
    three per-count continuation-type counts the three discounts weight."""
    c = F.col(f"__a{k}")
    return ak.groupBy(*wcols[n - k:-1]).agg(
        F.sum(f"__a{k}").cast("bigint").alias(f"__s{k}"),
        F.sum(F.when(c == 1, 1).otherwise(0)).cast("bigint").alias(f"__t1_{k}"),
        F.sum(F.when(c == 2, 1).otherwise(0)).cast("bigint").alias(f"__t2_{k}"),
        F.sum(F.when(c >= 3, 1).otherwise(0)).cast("bigint").alias(f"__t3_{k}"),
    )


def _kn_count_of_counts(ak, k):
    """One order's count-of-counts ``{c: |{gram : a_k(gram) = c}|}`` for
    c ≤ 4 — the four bigints the modified-KN discount estimator needs."""
    return {
        r["__c"]: r["__n"]
        for r in ak.where(F.col(f"__a{k}") <= 4)
        .groupBy(F.col(f"__a{k}").alias("__c"))
        .agg(F.count("*").cast("bigint").alias("__n"))
        .collect()
    }


def _kn_fixed_ctx_prob(a, wcols, n, discount, ctx=None):
    """Context stats + the fixed-discount interpolated-KN probability tree
    (Chen & Goodman eq. 4.24), shared by the batch scorer and the
    maintained-state scorer so their arithmetic is identical. ``ctx``
    accepts precomputed (e.g. background-materialized) context tables —
    same aggregate, built by :func:`_kn_ctx_fixed_agg` either way."""
    if ctx is None:
        ctx = {k: _kn_ctx_fixed_agg(a[k], wcols, n, k) for k in range(n, 1, -1)}
    d = F.lit(float(discount))
    # fixed-shape arithmetic tree, innermost (unigram) outwards — the
    # oracle restates this association order term for term
    prob = F.col("__a1").cast("double") / F.col("__S1").cast("double")
    for k in range(2, n + 1):
        prob = (
            F.greatest(F.col(f"__a{k}").cast("double") - d, F.lit(0.0))
            / F.col(f"__s{k}").cast("double")
        ) + (
            d * F.col(f"__t{k}").cast("double") / F.col(f"__s{k}").cast("double")
        ) * prob
    return ctx, prob


def _kn_lm(a, ctx, prob, wcols, n, broadcast_vocab_max, a_n_count=None):
    """The per-gram probability table ``(__w1..__wn, __p)`` assembled by
    the vocab-to-vocab join chain (a[n] ⋈ ctx[n] ⋈ a[n-1] ⋈ ... ⋈ a[1] ⋈
    S1), plus the MEASURED broadcast-or-shuffle decision for the corpus
    lookup join. ``a_n_count`` supplies a precomputed (e.g. background-
    overlapped) guard count for the broadcast decision."""
    s1 = a[1].agg(F.sum("__a1").cast("bigint").alias("__S1"))
    lm = a[n]
    for k in range(n, 1, -1):
        if k < n:
            lm = lm.join(a[k], wcols[n - k:])
        lm = lm.join(ctx[k], wcols[n - k:-1])
    lm = lm.join(a[1], wcols[-1:]).crossJoin(F.broadcast(s1))
    lm = lm.select(*wcols, prob.alias("__p"))
    use_broadcast = broadcast_vocab_max is None or (
        a_n_count if a_n_count is not None else a[n].count()
    ) <= broadcast_vocab_max
    return lm, use_broadcast


def _kn_score(df, grams, a, ctx, prob, wcols, n, id_col, broadcast_vocab_max,
              out_name, deps, a_n_count=None):
    """Shared back half of both n-gram Kneser-Ney scorers: assemble the
    per-gram probability table, guard the corpus lookup join on the
    MEASURED vocabulary size, regroup per document, left-join every input
    id (< n-token documents get NULL)."""
    from siddhi_io_cdc_spark.util import tag_caches

    lm, use_broadcast = _kn_lm(
        a, ctx, prob, wcols, n, broadcast_vocab_max, a_n_count
    )
    scored = (
        grams.join(F.broadcast(lm) if use_broadcast else lm, wcols)
        .groupBy(id_col)
        .agg(
            F.round(F.avg(-F.log("__p")), 6).alias(out_name),
            F.count("*").cast("bigint").alias("n_ngrams"),
        )
    )
    out = df.select(id_col).distinct().join(scored, id_col, "left")
    return tag_caches(out, deps)


def kneser_ney_ngram_logprob(
    df: DataFrame,
    n: int = 5,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab_max: int | None = 5_000_000,
    persist_lower: bool = True,
) -> DataFrame:
    """Per-document mean negative log-probability under an interpolated
    Kneser-Ney ``n``-gram LM trained on the scored corpus — the full CCNet
    scoring rung (Wenzek et al. 2020 score with a 5-gram KN LM; Chen &
    Goodman 1998 eq. 4.24 gives the recursion, Heafield 2011 §3 the
    adjusted-count scheme KenLM uses, restated here over DataFrame
    aggregates). :func:`kneser_ney_logprob` is the n=2 case of the same
    recursion (kept separate: its two-table shape is the common fast path).

    Counts, KenLM-style ("adjusted counts"): the highest order uses raw
    n-gram counts ``a_n = c(w_1^n)``; every lower order k uses CONTINUATION
    counts derived recursively from the order above —
    ``a_k(w^k) = |{v : a_{k+1}(v·w^k) > 0}|`` (distinct predecessors), so
    the entire hierarchy derives from ONE corpus pass. With context sums
    ``s_k = Σ_w a_k(ctx·w)`` and continuation-type counts
    ``t_k = |{w : a_k(ctx·w) > 0}|``:

        P_1(w)       = a_1(w) / S_1
        P_k(w|ctx)   = max(a_k - D, 0)/s_k + (D·t_k/s_k)·P_{k-1}(w|ctx')

    where ``ctx'`` drops the leftmost context word. Scoring the training
    corpus itself means every scored n-gram has ``a_n ≥ 1`` and every
    suffix table row exists — no zero contexts, the recursion is total.

    Shape at scale: the corpus crosses the wire once (the n-gram explode +
    vocabulary aggregate); everything after is VOCABULARY-sized — n−1
    suffix aggregates (each strictly smaller than the last), n−1 context
    aggregates, and a chain of vocab-to-vocab joins assembling the per-gram
    probability. The final lookup join broadcasts only when the measured
    vocabulary is at most ``broadcast_vocab_max`` (an n-gram vocabulary
    approaches one row per corpus position, so the shuffle-join fallback is
    the expected branch at 100 TB — same guard, and same reason, as
    :func:`ngram_logprob`). Documents with fewer than ``n`` tokens get
    NULL.

    ``persist_lower`` (default on) materializes the whole hierarchy
    ``a[n]..a[1]`` eagerly — ``localCheckpoint`` for levels whose
    plan-stats estimate stays within ``_KN_CHECKPOINT_MAX_BYTES`` (the
    repo's model/vocab-size lineage rule), ``scoped_persist`` + count
    above it so a near-corpus-sized top order keeps its lineage and can
    spill/recompute instead of pinning executor storage — the join chain
    otherwise recomputes the lower orders from ``a[n]`` at every use (the
    r9 plan audit counted 42 exchanges with zero reuse at n=5), and a
    lazily-persisted hierarchy materializes RACING inside the final
    plan's concurrently-submitted broadcast builds (r15 profile: ten
    overlapping 2-3 s jobs blocked on the block-manager locks). The
    tables are strictly smaller than ``a[n]`` — each a grouped projection
    of the order above — so the extra memory is bounded; measured paired
    A/B at sf0.1 n=5 warm: 6.2 s checkpointed vs 9.5 s lazily persisted.

    Output: ``(id_col, kn_nll, n_ngrams)`` — uniform with the n=2 rung.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2 (got {n})")
    if not 0 < discount < 1:
        raise ValueError(f"discount must be in (0, 1) (got {discount})")

    if not persist_lower:
        grams, a, wcols = _kn_hierarchy(df, n, id_col, text_col)
        ctx, prob = _kn_fixed_ctx_prob(a, wcols, n, discount)
        return _kn_score(df, grams, a, ctx, prob, wcols, n, id_col,
                         broadcast_vocab_max, "kn_nll", [grams, a[n]])

    # Overlap the broadcast-guard count with the cascade on a background
    # thread (guide §2.6): it needs only the already-stored a[n] and is a
    # tiny leaf count, so it back-fills the cascade's idle cores instead of
    # adding a driver-synchronous job after the hierarchy. ONLY such tiny
    # driver round-trips overlap — a first cut also background-checkpointed
    # the ctx aggregates and measured WORSE (sum of job spans +1 s: the
    # stored ctx pass duplicated work the final plan's broadcast builds had
    # fused, and the chunky ctx[n] job FIFO-starved the cascade's critical
    # path). Values are unaffected — only the schedule moves.
    from concurrent.futures import ThreadPoolExecutor

    cnt_fut: list[object] = []
    with ThreadPoolExecutor(max_workers=1) as pool:

        def on_level(k, ak):
            if k == n and broadcast_vocab_max is not None:
                cnt_fut.append(pool.submit(ak.count))

        grams, a, wcols = _kn_hierarchy(
            df, n, id_col, text_col, persist_lower=True, on_level=on_level
        )
        a_n_count = cnt_fut[0].result() if cnt_fut else None
    ctx, prob = _kn_fixed_ctx_prob(a, wcols, n, discount)
    return _kn_score(df, grams, a, ctx, prob, wcols, n, id_col,
                     broadcast_vocab_max, "kn_nll", [grams], a_n_count)


def modified_kn_discounts(
    n1: int, n2: int, n3: int, n4: int,
    fallback: tuple[float, float, float] | None = None,
) -> tuple[float, float, float]:
    """The three modified-KN discounts from an order's count-of-counts
    (Chen & Goodman 1998 eq. 4.26-4.29; what KenLM estimates per order):
    ``Y = n1/(n1 + 2*n2)``, ``D1 = 1 - 2*Y*n2/n1``, ``D2 = 2 - 3*Y*n3/n2``,
    ``D3+ = 3 - 4*Y*n4/n3``. Shared by the Spark scorer (as driver-side
    literals) and the oracle generator (restated in SQL with the identical
    association order), so the doubles match bit-for-bit.

    When any count-of-count is zero the estimator is undefined. Default:
    raise, exactly as KenLM's ``lmplz`` errors ("Could not calculate
    Kneser-Ney discounts"). ``fallback`` substitutes the given
    ``(D1, D2, D3+)`` for the degenerate order instead — KenLM's
    ``--discount_fallback`` escape hatch (its default is 0.5/1.0/1.5)."""
    if min(n1, n2, n3, n4) <= 0:
        if fallback is not None:
            d1, d2, d3 = fallback
            return (float(d1), float(d2), float(d3))
        raise ValueError(
            f"modified-KN discounts undefined: count-of-counts "
            f"(n1..n4) = {(n1, n2, n3, n4)} contain a zero — pass "
            f"discount_fallback (KenLM --discount_fallback, e.g. "
            f"(0.5, 1.0, 1.5)) or use the fixed-discount "
            f"kneser_ney_ngram_logprob instead"
        )
    y = n1 / (n1 + 2.0 * n2)
    ds = (1.0 - 2.0 * y * n2 / n1, 2.0 - 3.0 * y * n3 / n2, 3.0 - 4.0 * y * n4 / n3)
    # KenLM's range check (lm/builder/adjust_counts.cc): each Dj must lie in
    # [0, j], else the discount would assign negative mass (gamma < 0 -> a
    # negative per-gram probability -> NaN NLL downstream of F.log). Skewed
    # count-of-counts (e.g. n3 >> n2) violate this even with all nj > 0.
    for j, d in enumerate(ds, start=1):
        if not (0.0 <= d <= float(j)):
            if fallback is not None:
                d1, d2, d3 = fallback
                return (float(d1), float(d2), float(d3))
            raise ValueError(
                f"modified-KN discount D{j}={d!r} outside [0, {j}] for "
                f"count-of-counts (n1..n4) = {(n1, n2, n3, n4)} — KenLM "
                f"refuses such discounts; pass discount_fallback (e.g. "
                f"(0.5, 1.0, 1.5)) or use kneser_ney_ngram_logprob"
            )
    return ds


def modified_kneser_ney_logprob(
    df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab_max: int | None = 5_000_000,
    discount_fallback: tuple[float, float, float] | None = None,
) -> DataFrame:
    """Per-document mean negative log-probability under a MODIFIED
    Kneser-Ney ``n``-gram LM — KenLM's default smoothing (Chen & Goodman
    1998 §3 "modified Kneser-Ney"; Heafield et al. 2013), i.e. the
    estimator CCNet's published models were actually trained with. Same
    adjusted-count hierarchy as :func:`kneser_ney_ngram_logprob`; the
    difference is the discount: instead of one fixed D, each order k uses
    THREE discounts D1/D2/D3+ chosen by the gram's own count (1, 2, or
    ≥3), estimated from the order's count-of-counts via
    :func:`modified_kn_discounts`, and the backoff mass is
    ``γ(ctx) = D1·N1(ctx·) + D2·N2(ctx·) + D3+·N3+(ctx·)`` where
    ``Nj(ctx·)`` counts continuations with adjusted count exactly j (3+
    for the last).

    Scale shape is identical to the fixed-discount scorer plus one
    4-row count-of-count aggregate per order collected to the driver (16
    BIGINTs total at n=5 — the discounts enter the expression as
    literals). The unigram level stays the undiscounted continuation
    distribution ``a1/S1`` (the same base case as the fixed-D scorer, so
    the two recursions differ only where the estimator differs).

    Output: ``(id_col, mkn_nll, n_ngrams)``.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2 (got {n})")

    # Overlap the tiny driver round-trips — each order's count-of-count
    # collect (4 bigints to the driver, constant-size at any corpus scale)
    # and the broadcast-guard count — with the remaining cascade on
    # background threads (guide §2.6): each needs only its already-stored
    # a[k], and previously they ran as one driver-synchronous action per
    # order AFTER the whole hierarchy, under an AQE-off scope this overlap
    # obsoletes. The ctx aggregates deliberately stay lazy inside the
    # final plan (a background-checkpoint variant measured WORSE — see the
    # fixed-discount scorer's note). Values are unaffected — same
    # aggregates, same arithmetic, only the schedule moves.
    from concurrent.futures import ThreadPoolExecutor

    cc_fut: dict[int, object] = {}
    cnt_fut: list[object] = []
    with ThreadPoolExecutor(max_workers=2) as pool:

        def on_level(k, ak):
            if k >= 2:
                cc_fut[k] = pool.submit(_kn_count_of_counts, ak, k)
            if k == n and broadcast_vocab_max is not None:
                cnt_fut.append(pool.submit(ak.count))

        grams, a, wcols = _kn_hierarchy(
            df, n, id_col, text_col, persist_lower=True, on_level=on_level
        )
        disc: dict[int, tuple[float, float, float]] = {}
        for k in range(2, n + 1):
            cc = cc_fut[k].result()
            disc[k] = modified_kn_discounts(
                cc.get(1, 0), cc.get(2, 0), cc.get(3, 0), cc.get(4, 0),
                fallback=discount_fallback,
            )
        a_n_count = cnt_fut[0].result() if cnt_fut else None
    # context stats: total mass + the three per-count continuation types
    ctx = {k: _kn_ctx_modified_agg(a[k], wcols, n, k) for k in range(n, 1, -1)}
    # fixed-shape arithmetic tree, innermost outwards; discounts enter as
    # literals, the per-gram discount picked by a two-branch CASE on the
    # adjusted count
    prob = F.col("__a1").cast("double") / F.col("__S1").cast("double")
    for k in range(2, n + 1):
        d1, d2, d3 = disc[k]
        ak = F.col(f"__a{k}").cast("double")
        dk = (
            F.when(F.col(f"__a{k}") == 1, F.lit(float(d1)))
            .when(F.col(f"__a{k}") == 2, F.lit(float(d2)))
            .otherwise(F.lit(float(d3)))
        )
        sk = F.col(f"__s{k}").cast("double")
        gamma = (
            F.lit(float(d1)) * F.col(f"__t1_{k}").cast("double")
            + F.lit(float(d2)) * F.col(f"__t2_{k}").cast("double")
            + F.lit(float(d3)) * F.col(f"__t3_{k}").cast("double")
        )
        prob = (F.greatest(ak - dk, F.lit(0.0)) / sk) + (gamma / sk) * prob
    return _kn_score(df, grams, a, ctx, prob, wcols, n, id_col,
                     broadcast_vocab_max, "mkn_nll", [grams], a_n_count)


def ngram_logprob(
    df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab_max: int | None = 5_000_000,
) -> DataFrame:
    """Per-document mean negative log-probability under the corpus's own
    ``n``-gram LM — the general rung of the CCNet ladder
    (:func:`unigram_logprob` is n=1, :func:`bigram_logprob` n=2; Wenzek et
    al. 2020 filter with a 5-gram LM, the default here). Score is
    ``avg(-ln(c(w1..wn) / c(w1..w{n-1},·)))`` over the document's n-gram
    positions; the LM is trained on the scored corpus itself, so every
    document n-gram has count ≥ 1 and the exact MLE needs no smoothing.
    Documents with fewer than ``n`` tokens get NULL.

    Construction: n-grams are built ARRAY-SIDE — one ``transform`` over the
    position sequence gathers the n tokens at each position into a struct
    (an O(n) expression, no joins, no self-zip chain) — then exploded once.
    The context count ``c(w1..w{n-1},·)`` is an exact second aggregate OF
    the n-gram table (sum of n-gram counts per (n−1)-prefix — equal to the
    prefix count by construction, cheaper than re-tokenizing). Shuffles:
    the n-gram vocabulary aggregate, the prefix aggregate (over the already
    tiny vocabulary), the lookup join (broadcast when the MEASURED
    vocabulary is at most ``broadcast_vocab_max`` — an n-gram vocabulary
    approaches one entry per corpus position as n grows, so the shuffle
    fallback is the expected path at scale for n ≥ 3), and the final
    per-document regroup.

    Output columns are ``ngram_nll`` / ``n_ngrams`` for every n (uniform
    schema across the ladder)."""
    from siddhi_io_cdc_spark.util import scoped_persist, tag_caches

    if n < 2:
        raise ValueError(f"n must be >= 2 (got {n}); use unigram_logprob for n=1")
    # Tokenize into a COLUMN first: an expression captured inside a
    # higher-order-function lambda is re-evaluated per array element, so
    # referencing the regexp_extract_all subtree directly from the
    # per-position lambda re-ran the tokenizer O(positions x n) times per
    # row (measured 17 s for trigrams at sf0.1 vs 2 s for the hoisted
    # form). After hoisting, element_at is O(1) array indexing.
    toks = F.col("__toks")
    length = F.size(toks)
    # sequence(1, L-n+1) DESCENDS when L < n — gate to an empty array.
    positions = F.when(
        length >= n, F.sequence(F.lit(1), length - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = F.transform(
        positions,
        lambda p: F.struct(
            *[F.element_at(toks, p + i).alias(f"__w{i + 1}") for i in range(n)]
        ),
    )
    wcols = [f"__w{i + 1}" for i in range(n)]
    grams = scoped_persist(
        # min_bytes_per_slot=0: tokenize + per-position struct-gather +
        # explode is heavy per input byte; measured warm at sf0.1 the size
        # threshold cost the 5-gram rung ~0.6 s (3.6 vs 3.0 s noop-sink)
        _fan_out(df.select(F.col(id_col), F.col(text_col)), min_bytes_per_slot=0)
        .select(
            F.col(id_col),
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0
            ).alias("__toks"),
        )
        .select(F.col(id_col), F.explode(gram).alias("__g"))
        .select(id_col, *[F.col(f"__g.{w}").alias(w) for w in wcols])
    )
    # eager materialization, size-gated like the KN hierarchy: an n-gram
    # vocabulary approaches one row per corpus position as n grows, so
    # above the gate it keeps lineage (see _kn_materialize); it feeds the
    # prefix aggregate, the guard count and the lm join
    vocab = _kn_materialize(grams.groupBy(*wcols).agg(
        F.count("*").alias("__cn")
    ))
    ctx = vocab.groupBy(*wcols[:-1]).agg(F.sum("__cn").alias("__cc"))
    use_broadcast = (
        broadcast_vocab_max is None or vocab.count() <= broadcast_vocab_max
    )
    lm = vocab.join(ctx, wcols[:-1]).select(
        *wcols, (F.col("__cn") / F.col("__cc")).alias("__p")
    )
    scored = (
        grams.join(F.broadcast(lm) if use_broadcast else lm, wcols)
        .groupBy(id_col)
        .agg(
            F.round(F.avg(-F.log("__p")), 6).alias("ngram_nll"),
            F.count("*").cast("bigint").alias("n_ngrams"),
        )
    )
    out = df.select(id_col).distinct().join(scored, id_col, "left")
    return tag_caches(out, [grams])


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    scale: int = 1_000_000,
) -> DataFrame:
    """Deterministic domain-mixture downsampling: keep the largest subset
    whose per-domain proportions match ``weights`` without oversampling any
    domain (no replacement) — the training-mixture step of Pile/Dolma-style
    corpora, where heterogeneous sources must be re-weighted before export.

    Semantics: with ``n_d`` rows in domain ``d`` and normalized weight
    ``w_d``, the achievable total is ``T = min_d(n_d / w_d)`` (the binding
    domain is kept in full); every other domain keeps rate
    ``r_d = w_d * T / n_d``. A row survives iff
    ``stable_hash(id, seed) % scale < round(r_d * scale)`` — the same
    engine-portable md5 hash as :func:`shard_for_training`, so the kept set
    is bit-reproducible and restatable in any engine. Domains absent from
    ``weights`` (or weighted 0) are dropped. Realized proportions are exact
    in expectation with O(sqrt(n_d)) hash-binomial noise — the price of
    keeping the pass MAP-ONLY over the corpus.

    Scale shape: one tiny hash-aggregate for the per-domain counts (|domains|
    rows, broadcast back), then a narrow filter over the corpus — no shuffle
    of the data, no window. The exact-count alternative (rank rows per
    domain, keep the first ``c_d``) needs a per-domain global sort whose
    partitioning is the low-cardinality domain key — unusable skew at 100 TB.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative (got {weights})")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("at least one weight must be positive")
    norm = {d: w / wsum for d, w in weights.items() if w > 0}

    counts = df.groupBy(F.col(domain_col).alias("__dom")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    wmap = F.create_map(
        *[F.lit(x) for d, w in sorted(norm.items()) for x in (d, float(w))]
    )
    weighted = counts.select(
        "__dom", "__n", wmap[F.col("__dom")].alias("__w")
    ).where(F.col("__w").isNotNull())
    total = weighted.agg(F.min(F.col("__n") / F.col("__w")).alias("__t"))
    rates = weighted.crossJoin(F.broadcast(total)).select(
        "__dom",
        F.round(F.least(F.lit(1.0), F.col("__w") * F.col("__t") / F.col("__n")) * scale)
        .cast("bigint")
        .alias("__thr"),
    )
    h = F.pmod(stable_hash(F.col(id_col), seed), F.lit(scale))
    return (
        df.join(F.broadcast(rates), df[domain_col] == F.col("__dom"))
        .where(h < F.col("__thr"))
        .drop("__dom", "__thr")
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab_max: int | None = 5_000_000,
) -> DataFrame:
    """Per-document mean negative log-probability under the corpus's own
    unigram LM (lower = more typical text) — the unigram case of CCNet's
    LM-perplexity quality filter, computed exactly in two passes.

    Pass 1 aggregates the token vocabulary (one shuffle on token); pass 2
    joins each token against the vocabulary and averages
    ``-ln(count / total)``. Tokens are TOKEN_RE matches over lowercased
    text, the same tokenizer as ``token_count``, so scores line up with the
    rest of the text-quality family. Documents with zero tokens get NULL.

    Scale guard: TOKEN_RE makes digit runs and punctuation tokens, so a
    100 TB corpus's vocabulary is NOT guaranteed small enough for the
    driver/broadcast limits. The tokenized view and the vocabulary are
    persisted (both feed two consumers), and the per-token lookup
    broadcasts ONLY when the measured vocabulary size is at most
    ``broadcast_vocab_max`` — otherwise it falls back to a shuffle join on
    the token. ``broadcast_vocab_max=None`` skips the probe and always
    broadcasts (callers that know their corpus). The 1-row total is always
    broadcast.
    """
    from siddhi_io_cdc_spark.util import scoped_persist, tag_caches

    toks = scoped_persist(
        _fan_out(df.select(F.col(id_col), F.col(text_col)))
        .select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
            ).alias("__tok"),
        )
    )
    # eager materialization, size-gated like the KN hierarchy (see
    # _kn_materialize): the vocabulary feeds the total, the guard count
    # and the lookup join
    vocab = _kn_materialize(toks.groupBy("__tok").agg(F.count("*").alias("__cnt")))
    use_broadcast = (
        broadcast_vocab_max is None or vocab.count() <= broadcast_vocab_max
    )
    total = vocab.agg(F.sum("__cnt").alias("__total"))
    scored = (
        toks.join(F.broadcast(vocab) if use_broadcast else vocab, "__tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg(-F.log(F.col("__cnt") / F.col("__total"))), 6
            ).alias("nll"),
            F.count("*").cast("bigint").alias("n_tokens"),
        )
    )
    out = df.select(id_col).distinct().join(scored, id_col, "left")
    return tag_caches(out, [toks])


def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.7,
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    scale: int = 1_000_000,
) -> DataFrame:
    """Temperature-based domain re-weighting: :func:`mixture_sample` with
    weights ``w_d ∝ n_d^alpha`` computed from the corpus itself — the
    standard multilingual/multi-domain mixing rule (alpha < 1 UPsamples
    small domains relative to their natural share; alpha = 1 is the natural
    distribution, alpha = 0 uniform). One tiny per-domain count aggregate
    (|domains| rows, a driver-safe collect — domains are a handful of
    sources by construction), then the same map-only hash-keep pass as
    mixture_sample: no data shuffle, no window.
    """
    if not 0 <= alpha <= 1:
        raise ValueError(f"alpha must be in [0, 1] (got {alpha})")
    # NULL domains are dropped (filtered before the count, so they get no
    # weight and no output rows) — matching mixture_sample's semantics for
    # a domain absent from the weight map. Without the filter, sorted()
    # below would raise TypeError on a None key.
    counts = {
        r["d"]: r["n"]
        for r in df.where(F.col(domain_col).isNotNull())
        .groupBy(F.col(domain_col).alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # sorted: weight normalization sums in a deterministic order whatever
    # order the collect returned domains in
    weights = {d: float(n) ** alpha for d, n in sorted(counts.items())}
    return mixture_sample(
        df, weights, domain_col=domain_col, id_col=id_col, seed=seed, scale=scale
    )


def span_corruption(
    df: DataFrame,
    span_len: int = 3,
    block_len: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """T5-style span-corruption prep (Raffel et al. 2020 §3.1.4): mask
    token spans with ``<extra_id_k>`` sentinels, emit the denoising
    ``(input_text, target_text)`` pair per document.

    Deterministic block-grid variant: positions tile into consecutive
    ``block_len``-token blocks; each block long enough masks exactly ONE
    ``span_len`` span at a hash-derived offset. Corruption rate is exactly
    ``span_len / block_len``, spans never overlap by construction, and
    every position's fate is a pure function of ``(doc_id, block)`` — so
    the whole transform is map-only (no sequential sampling state, unlike
    the paper's iid draw) and restates exactly in SQL via the portable
    md5 hash. The token array is staged as a real column first: expression
    subtrees captured in ``transform`` lambdas re-evaluate PER ELEMENT,
    so an inlined tokenizer would re-run once per block (the measured
    n-gram-ladder pitfall).

    Scale: one narrow projection — no shuffle, no Python, no driver state;
    corrupting 100 TB is a map-only pass like chunking.
    """
    if span_len <= 0 or block_len < span_len:
        raise ValueError(
            f"need 0 < span_len <= block_len (got {span_len}, {block_len})"
        )
    from siddhi_io_cdc_spark.functions.text import TOKEN_RE

    # fan_out before the per-token hash/slice work: a small file count
    # otherwise caps parallelism well below the session's cores (the
    # row-group-starvation pitfall measured on the text family).
    staged = _fan_out(df).withColumn(
        "__toks", F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    )
    input_text, target_text, n_masked = _span_corruption_exprs(
        F.col("__toks"), id_col, span_len, block_len, seed
    )
    return (
        staged.withColumn("input_text", input_text)
        .withColumn("target_text", target_text)
        .withColumn("n_masked", n_masked.cast("bigint"))
        .drop("__toks")
    )


def _span_corruption_exprs(
    toks: Column, id_col: str, span_len: int, block_len: int, seed: int
) -> tuple[Column, Column, Column]:
    """The span-corruption column expressions over a staged token-array
    column: ``(input_text, target_text, n_masked)``. Shared by
    :func:`span_corruption` and the R/X branches of :func:`ul2_denoisers`
    (which evaluates two parameterizations over ONE staged scan)."""
    n = F.size(toks)
    nblocks = F.ceil(n / F.lit(block_len)).cast("int")
    bseq = F.when(n > 0, F.sequence(F.lit(0), nblocks - 1)).otherwise(
        F.lit([]).cast("array<int>")
    )
    L = F.lit(span_len)

    def block_parts(b):
        bt = F.slice(toks, b * block_len + 1, block_len)
        s_b = F.size(bt)
        h = F.conv(
            F.md5(
                F.concat_ws(
                    _HASH_SEP,
                    F.lit(str(seed)),
                    F.col(id_col).cast("string"),
                    b.cast("string"),
                )
            ).substr(1, 15),
            16,
            10,
        ).cast("bigint")
        start = (h % (s_b - L + 1)).cast("int")
        sentinel = F.concat(F.lit("<extra_id_"), b.cast("string"), F.lit(">"))
        inp = F.when(
            s_b >= L,
            F.concat(
                F.slice(bt, 1, start),
                F.array(sentinel),
                F.slice(bt, start + L + 1, s_b - start - L),
            ),
        ).otherwise(bt)
        tgt = F.when(
            s_b >= L, F.concat(F.array(sentinel), F.slice(bt, start + 1, L))
        ).otherwise(F.lit([]).cast("array<string>"))
        return inp, tgt

    input_text = F.array_join(
        F.flatten(F.transform(bseq, lambda b: block_parts(b)[0])), " "
    )
    target_text = F.array_join(
        F.flatten(F.transform(bseq, lambda b: block_parts(b)[1])), " "
    )
    n_masked = F.size(
        F.filter(bseq, lambda b: F.size(F.slice(toks, b * block_len + 1, block_len)) >= L)
    )
    return input_text, target_text, n_masked


def ul2_denoisers(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """UL2 mixture-of-denoisers prep (Tay et al. 2022): every document is
    deterministically routed by the portable md5 hash to one of the three
    objective families and emitted as a denoising pair —

    - ``r`` (regular): T5 span corruption, span 3 / block 20 (15% rate);
    - ``x`` (extreme): aggressive corruption, span 8 / block 16 (50% rate);
    - ``s`` (sequential, PrefixLM): split at a hash-derived pivot (both
      sides non-empty when the document has ≥ 2 tokens);
      ``input = prefix + <extra_id_0>``, ``target = <extra_id_0> + suffix``.

    Routing by hash (not by row position) keeps the 7:25 paper mixture out
    of scope on purpose: an exactly-restatable uniform third per objective,
    stable under repartition/replay. One staged scan evaluates all three
    branches under a CASE — map-only, no shuffle, no Python; at 100 TB this
    is a single pass like chunking. Returns
    ``(id_col, denoiser, input_text, target_text)``.
    """
    from siddhi_io_cdc_spark.functions.text import TOKEN_RE

    staged = _fan_out(df).withColumn(
        "__toks", F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    )
    toks = F.col("__toks")
    n = F.size(toks)
    route = F.pmod(stable_hash(F.col(id_col), seed=seed), F.lit(3))

    r_in, r_tgt, _ = _span_corruption_exprs(toks, id_col, 3, 20, seed)
    x_in, x_tgt, _ = _span_corruption_exprs(toks, id_col, 8, 16, seed)

    # S branch: pivot in [1, n-1] so prefix and suffix are both non-empty;
    # degenerate docs (n < 2) put everything in the prefix, empty target.
    pivot_hash = stable_hash(
        F.concat(F.lit("s:"), F.col(id_col).cast("string")), seed=seed
    )
    pivot = F.when(n >= 2, (F.lit(1) + F.pmod(pivot_hash, n - 1)).cast("int")).otherwise(
        n.cast("int")
    )
    sentinel = F.array(F.lit("<extra_id_0>"))
    s_in = F.array_join(F.concat(F.slice(toks, 1, pivot), sentinel), " ")
    s_tgt = F.array_join(F.concat(sentinel, F.slice(toks, pivot + 1, n - pivot)), " ")

    return staged.select(
        F.col(id_col),
        F.when(route == 0, F.lit("r"))
        .when(route == 1, F.lit("x"))
        .otherwise(F.lit("s"))
        .alias("denoiser"),
        F.when(route == 0, r_in).when(route == 1, x_in).otherwise(s_in)
        .alias("input_text"),
        F.when(route == 0, r_tgt).when(route == 1, x_tgt).otherwise(s_tgt)
        .alias("target_text"),
    )


def dsir_weights(
    df: DataFrame,
    target: Column,
    buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    the log-likelihood ratio between a TARGET bag-of-hashed-ngrams LM and
    the RAW-corpus LM, so that resampling by weight shifts the corpus
    toward the target distribution.

    Features are the paper's unigram+bigram union, hashed into ``buckets``
    buckets with the engine-portable md5 hash (:func:`stable_hash`), so the
    oracle can restate every bucket id. Both LMs are add-one smoothed over
    the bucket space: ``p(b) = (c(b) + 1) / (total + buckets)``. The weight
    is ``sum_positions [ln p_target(b) - ln p_raw(b)]`` rounded to 6
    decimals (magnitude-homogeneous summands — the n-gram-NLL exactness
    argument), NULL for documents with no features.

    ``target`` is a boolean Column over ``df``'s columns selecting the
    target-domain examples (e.g. ``F.col("lang") == "en"``); the raw LM is
    the whole corpus.

    Scale shape: one explode feeds both LM aggregations (each at most
    ``buckets`` rows — broadcast back) and the per-position scoring join;
    the only fact-sized shuffle is the final per-document sum. At 100 TB
    the bucket tables stay 1024 rows regardless of corpus size — that is
    the point of hashed DSIR over exact-vocabulary LMs.
    """
    from siddhi_io_cdc_spark.util import scoped_persist, tag_caches

    if buckets <= 1:
        raise ValueError(f"buckets must be > 1 (got {buckets})")
    hashed = scoped_persist(
        dsir_hashed_grams(df, buckets, id_col=id_col, text_col=text_col,
                          seed=seed, flag=target)
    )
    raw_lm = hashed.groupBy("__b").agg(F.count(F.lit(1)).alias("__cr"))
    tgt_lm = hashed.where(F.col("__t")).groupBy("__b").agg(
        F.count(F.lit(1)).alias("__ct")
    )
    totals = hashed.agg(
        F.count(F.lit(1)).alias("__nr"),
        F.sum(F.col("__t").cast("bigint")).alias("__nt"),
    )
    out = _dsir_score(df, hashed, raw_lm, tgt_lm, totals, buckets, id_col)
    return tag_caches(out, [hashed])


def dsir_hashed_grams(
    df: DataFrame,
    buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    flag: Column | None = None,
) -> DataFrame:
    """The hashed unigram+bigram feature stream ``(id, [__t,] __b)`` shared
    by :func:`dsir_weights` and the CDC-incremental LM maintainer
    (``streaming/dsir.py``) — one definition, so batch and incremental
    bucket ids cannot drift."""
    from siddhi_io_cdc_spark.functions.text import normalize_text, word_ngrams

    grams1 = F.filter(F.split(normalize_text(text_col), " "), lambda t: t != "")
    cols = [F.col(id_col)] + ([flag.alias("__t")] if flag is not None else [])
    # min_bytes_per_slot=0: 1024-bucket ngram hashing is per-byte heavy
    # (size-based skip measured +3.4 s on llm_dsir_weights at sf0.1)
    feats = _fan_out(
        df.select(*cols, F.col(text_col)), min_bytes_per_slot=0
    ).select(
        F.col(id_col),
        *([F.col("__t")] if flag is not None else []),
        F.explode(F.concat(grams1, word_ngrams(text_col, 2))).alias("__g"),
    )
    return feats.select(
        F.col(id_col),
        *([F.col("__t")] if flag is not None else []),
        F.pmod(stable_hash(F.col("__g"), seed=seed), F.lit(buckets)).alias("__b"),
    )


def _dsir_score(
    df: DataFrame,
    hashed: DataFrame,
    raw_lm: DataFrame,
    tgt_lm: DataFrame,
    totals: DataFrame,
    buckets: int,
    id_col: str,
) -> DataFrame:
    """Score per-document log-likelihood ratios from LM bucket tables —
    the shared arithmetic tail of the batch scorer and the maintained-state
    scorer (identical expression tree, so the two paths are bit-equal).
    ``raw_lm``: (__b, __cr); ``tgt_lm``: (__b, __ct); ``totals``: 1 row
    (__nr, __nt).

    Both LM joins are LEFT with counts coalesced to 0: a feature hashing
    to a bucket absent from an LM table scores with the add-one-smoothed
    zero count the DSIR definition implies. For the batch scorer this is
    value-identical to an inner raw join (its raw LM covers every bucket
    the hashed stream produces); for the maintained-state scorer
    (streaming/dsir.py — state drops 0/0 buckets) it is the difference
    between scoring a not-yet-reflected corpus correctly and silently
    dropping its unseen-bucket features from the sum and n_features."""
    B = F.lit(float(buckets))
    log_ratio = F.log(
        (F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(1.0)) / (F.col("__nt") + B)
    ) - F.log(
        (F.coalesce(F.col("__cr"), F.lit(0)) + F.lit(1.0)) / (F.col("__nr") + B)
    )
    scored = (
        hashed.join(F.broadcast(raw_lm), "__b", "left")
        .join(F.broadcast(tgt_lm), "__b", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.round(F.sum(log_ratio), 6).alias("dsir_weight"),
            F.count(F.lit(1)).cast("bigint").alias("n_features"),
        )
    )
    return df.select(id_col).distinct().join(scored, id_col, "left")


def dsir_select(
    df: DataFrame,
    target: Column,
    n: int,
    buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """Select the ``n`` documents with the highest DSIR importance weight
    (deterministic total order: weight desc, id asc) — the top-rank
    variant of the paper's Gumbel resampling (their appendix ablation;
    exactly reproducible where Gumbel noise is not). Featureless documents
    (NULL weight) are never selected. Distributed TakeOrdered, no global
    sort."""
    w = dsir_weights(
        df, target, buckets=buckets, id_col=id_col, text_col=text_col, seed=seed
    )
    return (
        w.where(F.col("dsir_weight").isNotNull())
        .orderBy(F.col("dsir_weight").desc(), F.col(id_col).asc())
        .limit(n)
    )
