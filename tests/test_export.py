"""Training-data export operators: deterministic shard+shuffle, sequence
packing, chunking, unigram-LM scoring (functions/export.py)."""

import hashlib
import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.export import (
    chunk_documents,
    pack_sequences,
    shard_for_training,
    stable_hash,
    unigram_logprob,
)
from siddhi_io_cdc_spark.functions.text import TOKEN_RE


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _py_hash(value, seed=0):
    pre = f"{seed}\x1f{value}".encode()
    return int(hashlib.md5(pre).hexdigest()[:15], 16)


def test_stable_hash_matches_portable_definition(spark):
    df = spark.range(5).select(F.col("id").alias("doc_id"))
    got = {
        r.doc_id: r.h
        for r in df.select("doc_id", stable_hash(F.col("doc_id"), seed=3).alias("h")).collect()
    }
    assert got == {i: _py_hash(i, 3) for i in range(5)}


def test_shard_assignment_and_positions(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    n = docs.count()
    out = shard_for_training(docs, num_shards=8, seed=0)
    rows = out.select("doc_id", "shard", "shard_pos").collect()
    assert len(rows) == n
    assert all(0 <= r.shard < 8 for r in rows)
    # positions are exactly 0..count-1 within each shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(len(positions))), shard
    # shard and order are the documented hash, not arbitrary
    sample = rows[0]
    assert sample.shard == _py_hash(sample.doc_id) % 8


def test_shard_is_deterministic_across_runs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = sorted(map(tuple, shard_for_training(docs, 4, seed=9).select(
        "doc_id", "shard", "shard_pos").collect()))
    b = sorted(map(tuple, shard_for_training(docs, 4, seed=9).select(
        "doc_id", "shard", "shard_pos").collect()))
    assert a == b


def test_shard_rejects_bad_count(spark, sf_dir):
    with pytest.raises(ValueError, match="num_shards"):
        shard_for_training(_docs(spark, sf_dir), 0)


def test_pack_sequences_cumulative_invariants(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    ctx = 256
    out = pack_sequences(docs, ctx_len=ctx, num_shards=4).collect()
    by_shard = {}
    for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        cum = 0
        for r in rows:
            assert r.seq_id == cum // ctx, (shard, r)
            assert r.seq_offset == cum % ctx, (shard, r)
            assert r.n_tokens > 0
            cum += r.n_tokens
    # first doc of every shard starts sequence 0 at offset 0
    for rows in by_shard.values():
        assert (rows[0].seq_id, rows[0].seq_offset) == (0, 0)


def test_pack_sequences_respects_precomputed_tokens(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100)], ["doc_id", "toks"]
    )
    out = {
        r.doc_id: (r.seq_id, r.seq_offset)
        for r in pack_sequences(
            df, ctx_len=128, num_shards=1, tokens_col="toks"
        ).collect()
    }
    assert out == {1: (0, 0), 2: (0, 100), 3: (1, 72)}


def test_pack_rejects_bad_ctx(spark, sf_dir):
    with pytest.raises(ValueError, match="ctx_len"):
        pack_sequences(_docs(spark, sf_dir), 0)


def test_chunk_documents_reconstructs_text(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(50)
    out = chunk_documents(docs, chunk_chars=200, overlap=0)
    rebuilt = (
        out.orderBy("doc_id", "chunk_idx")
        .groupBy("doc_id")
        .agg(F.concat_ws("", F.collect_list("chunk_text")).alias("text"))
    )
    orig = {r.doc_id: r.text for r in docs.collect()}
    for r in rebuilt.collect():
        assert r.text == orig[r.doc_id]


def test_chunk_documents_overlap_and_bounds(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_chars=4, overlap=2).collect(),
        key=lambda r: r.chunk_idx,
    )
    # stride 2: chunks at 0,2,4,6 -> "abcd","cdef","efgh","ghij"
    assert [r.chunk_text for r in rows] == ["abcd", "cdef", "efgh", "ghij"]
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_chars=4, overlap=4)
    with pytest.raises(ValueError, match="chunk_chars"):
        chunk_documents(df, chunk_chars=0)


def test_unigram_logprob_matches_hand_computation(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the the dog"), (3, "")],
        ["doc_id", "text"],
    )
    counts = Counter()
    per_doc = {}
    for doc_id, text in [(1, "the cat sat"), (2, "the the dog")]:
        toks = re.findall(TOKEN_RE, text.lower())
        per_doc[doc_id] = toks
        counts.update(toks)
    total = sum(counts.values())
    expected = {
        d: round(sum(-math.log(counts[t] / total) for t in toks) / len(toks), 6)
        for d, toks in per_doc.items()
    }
    got = {r.doc_id: (r.nll, r.n_tokens) for r in unigram_logprob(df).collect()}
    assert got[3] == (None, None)
    for d in (1, 2):
        assert got[d][1] == len(per_doc[d])
        assert got[d][0] == pytest.approx(expected[d], abs=1e-6)


def test_unigram_logprob_on_fixture_is_total(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = unigram_logprob(docs)
    assert out.count() == docs.select("doc_id").distinct().count()
    assert out.where(F.col("nll") <= 0).count() == 0


def test_unigram_logprob_shuffle_fallback_matches_broadcast(spark):
    """broadcast_vocab_max=0 forces the shuffle join; scores must be
    identical to the broadcast path (and to the no-probe always-broadcast
    path with broadcast_vocab_max=None)."""
    df = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "beta gamma 42!"), (3, "alpha")],
        ["doc_id", "text"],
    )
    broadcast = sorted(map(tuple, unigram_logprob(df).collect()))
    shuffled = sorted(map(tuple, unigram_logprob(df, broadcast_vocab_max=0).collect()))
    no_probe = sorted(map(tuple, unigram_logprob(df, broadcast_vocab_max=None).collect()))
    assert shuffled == broadcast == no_probe


def test_mixture_sample_proportions_and_binding_domain(spark, sf_dir):
    from siddhi_io_cdc_spark.functions.export import mixture_sample

    docs = _docs(spark, sf_dir)
    weights = {"src0": 0.5, "src1": 0.25, "src2": 0.125, "src3": 0.125}
    kept = mixture_sample(docs, weights).select("doc_id", "source").collect()
    by_dom = Counter(r.source for r in kept)
    n = {r.source: r.cnt for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    # binding domain (largest weight per row) is kept in full
    assert by_dom["src0"] == n["src0"]
    # unweighted domains are dropped entirely
    assert set(by_dom) <= set(weights)
    # other domains keep ~rate_d of their rows (hash-binomial tolerance)
    t = min(n[d] / w for d, w in weights.items())
    for d, w in weights.items():
        expect = min(1.0, w * t / n[d]) * n[d]
        assert abs(by_dom[d] - expect) <= 3 * math.sqrt(expect) + 1, (d, by_dom[d], expect)


def test_mixture_sample_deterministic_and_partition_independent(spark, sf_dir):
    from siddhi_io_cdc_spark.functions.export import mixture_sample

    docs = _docs(spark, sf_dir)
    weights = {"src1": 1.0, "src2": 1.0}
    a = sorted(r.doc_id for r in mixture_sample(docs, weights).collect())
    b = sorted(r.doc_id for r in mixture_sample(docs.repartition(7), weights).collect())
    assert a == b and len(a) > 0


def test_mixture_sample_validates_weights(spark, sf_dir):
    from siddhi_io_cdc_spark.functions.export import mixture_sample

    docs = _docs(spark, sf_dir)
    with pytest.raises(ValueError):
        mixture_sample(docs, {})
    with pytest.raises(ValueError):
        mixture_sample(docs, {"a": -1.0})
    with pytest.raises(ValueError):
        mixture_sample(docs, {"a": 0.0})


def test_chunk_tokens_reconstructs_and_overlaps(spark):
    from siddhi_io_cdc_spark.functions.export import chunk_documents_tokens

    docs = spark.createDataFrame(
        [(1, " ".join("abcdefghij"[i] * 2 for i in range(10))), (2, ""), (3, "solo")],
        "doc_id long, text string",
    )
    out = chunk_documents_tokens(docs, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text, r.chunk_tokens))
    # doc 1: stride 3 → starts 0,3,6,9 → ceil((10-1)/3)=3 chunks
    c1 = sorted(by_doc[1])
    assert [t for _, t, _ in c1] == [
        "aa bb cc dd", "dd ee ff gg", "gg hh ii jj",
    ]
    assert [n for _, _, n in c1] == [4, 4, 4]
    # overlap: last token of chunk i == first token of chunk i+1
    assert c1[0][1].split()[-1] == c1[1][1].split()[0]
    # empty doc → one empty chunk; single-token doc → one chunk
    assert by_doc[2] == [(0, "", 0)]
    assert by_doc[3] == [(0, "solo", 1)]


def test_chunk_tokens_validates_params(spark):
    from siddhi_io_cdc_spark.functions.export import chunk_documents_tokens

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents_tokens(docs, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents_tokens(docs, chunk_tokens=4, overlap=4)


def test_bigram_logprob_matches_hand_computation(spark):
    from siddhi_io_cdc_spark.functions.export import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "c"), (3, "a c")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.bigram_nll, r.n_bigrams) for r in bigram_logprob(docs).collect()}
    # corpus bigrams: (a,b)x2, (b,a)x1, (a,c)x1 -> c(a,.)=3, c(b,.)=1
    d1 = -(math.log(2 / 3) + math.log(1 / 1) + math.log(2 / 3)) / 3
    assert got[1] == (round(d1, 6), 3)
    assert got[2] == (None, None)  # single token: no bigram positions
    assert got[3] == (round(-math.log(1 / 3), 6), 1)


def test_bigram_logprob_shuffle_fallback_matches_broadcast(spark, sf_dir):
    from siddhi_io_cdc_spark.functions.export import bigram_logprob

    docs = _docs(spark, sf_dir).limit(40)
    a = sorted(map(tuple, bigram_logprob(docs).collect()))
    b = sorted(map(tuple, bigram_logprob(docs, broadcast_vocab_max=1).collect()))
    assert a == b and len(a) == 40


def test_ngram_logprob_hand_computed_and_generalizes(spark):
    """ngram_logprob(n=3) against a hand trigram MLE; n=2 agrees with the
    dedicated bigram_logprob (same pairs, same MLE — only column names
    differ); n<2 and short-document NULLs validated."""
    from siddhi_io_cdc_spark.functions.export import bigram_logprob, ngram_logprob

    docs = spark.createDataFrame(
        [(1, "a b c a b d"), (2, "c d"), (3, "a b c")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.ngram_nll, r.n_ngrams) for r in ngram_logprob(docs, n=3).collect()}
    # corpus trigrams: (a,b,c)x2, (b,c,a)x1, (c,a,b)x1, (a,b,d)x1
    # -> c(a,b,.)=3 (c twice, d once); (b,c,.) and (c,a,.) deterministic
    d1 = -(math.log(2 / 3) + math.log(1) + math.log(1) + math.log(1 / 3)) / 4
    assert got[1] == (round(d1, 6), 4)
    assert got[2] == (None, None)  # 2 tokens < n=3
    assert got[3] == (round(-math.log(2 / 3), 6), 1)

    two = {r.doc_id: (r.ngram_nll, r.n_ngrams) for r in ngram_logprob(docs, n=2).collect()}
    big = {r.doc_id: (r.bigram_nll, r.n_bigrams) for r in bigram_logprob(docs).collect()}
    assert two == big

    with pytest.raises(ValueError, match="unigram_logprob"):
        ngram_logprob(docs, n=1)


def test_ngram_logprob_shuffle_fallback_matches_broadcast(spark, sf_dir):
    """The vocab-size guard: at n=5 with broadcast_vocab_max=1 the lookup
    must take the shuffle-join branch (an n-gram vocabulary approaches one
    entry per corpus position — the expected branch at 100 TB) and produce
    byte-identical results to the broadcast path."""
    from siddhi_io_cdc_spark.functions.export import ngram_logprob

    docs = _docs(spark, sf_dir).limit(40)
    a = sorted(map(tuple, ngram_logprob(docs, n=5).collect()))
    b = sorted(map(tuple, ngram_logprob(docs, n=5, broadcast_vocab_max=1).collect()))
    assert a == b and len(a) == 40


def test_quantile_buckets_hand_computed(spark):
    from siddhi_io_cdc_spark.functions.export import quantile_buckets

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 10)] + [(10, None)],
        "id long, s double",
    )
    got = {r.id: r.bucket for r in quantile_buckets(df, "s").collect()}
    # exact percentile over 1..9: tercile cutoffs at (1/3, 2/3) -> 3.666, 6.333
    assert {i for i in got if got[i] == "head"} == {1, 2, 3}
    assert {i for i in got if got[i] == "middle"} == {4, 5, 6}
    assert {i for i in got if got[i] == "tail"} == {7, 8, 9}
    assert got[10] is None  # NULL score -> NULL bucket


def test_quantile_buckets_grouped_and_validation(spark):
    from siddhi_io_cdc_spark.functions.export import quantile_buckets

    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(1, 10)]
        + [("b", 100 + i, float(100 + i)) for i in range(1, 10)],
        "g string, id long, s double",
    )
    got = {r.id: r.bucket for r in quantile_buckets(df, "s", group_col="g").collect()}
    # per-group terciles: group b's small values are still "head" IN b
    assert got[1] == "head" and got[101] == "head"
    assert got[9] == "tail" and got[109] == "tail"
    with pytest.raises(ValueError):
        quantile_buckets(df, "s", cuts=(0.5,), labels=("a", "b", "c"))
    with pytest.raises(ValueError):
        quantile_buckets(df, "s", cuts=(0.9, 0.1))


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    weights=st.dictionaries(
        st.sampled_from([f"src{i}" for i in range(6)]),
        st.floats(min_value=0.05, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=4,
    ),
    seed=st.integers(min_value=0, max_value=3),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mixture_sample_invariants(spark, sf_dir, weights, seed):
    """Property: for any weight dict — output is a subset of the input
    restricted to weighted domains, the binding domain (min n_d/w_d) is
    kept in full, and every domain's keep count never exceeds its
    available rows."""
    from siddhi_io_cdc_spark.functions.export import mixture_sample

    docs = _docs(spark, sf_dir)
    n = {r.source: r.cnt for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    kept = mixture_sample(docs, weights, seed=seed).select("doc_id", "source").collect()
    by_dom = Counter(r.source for r in kept)
    assert set(by_dom) <= set(weights)
    present = {d: w for d, w in weights.items() if d in n}
    if present:
        binding = min(present, key=lambda d: n[d] / present[d])
        assert by_dom[binding] == n[binding]
    for d, c in by_dom.items():
        assert c <= n[d]


@given(
    chunk_tokens=st.integers(min_value=1, max_value=12),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
    n_toks=st.integers(min_value=0, max_value=30),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunk_tokens_invariants(spark, chunk_tokens, overlap_frac, n_toks):
    """Property: every chunk carries at most chunk_tokens tokens; with the
    declared stride, re-splitting chunk i's text yields exactly the token
    slice [i*stride, i*stride+chunk_tokens) of the source."""
    from siddhi_io_cdc_spark.functions.export import chunk_documents_tokens

    overlap = min(int(chunk_tokens * overlap_frac), chunk_tokens - 1)
    stride = chunk_tokens - overlap
    toks = ["w" + "abcdefghij"[i % 10] * (i % 3 + 1) for i in range(n_toks)]
    docs = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    out = sorted(
        (r.chunk_idx, r.chunk_text, r.chunk_tokens)
        for r in chunk_documents_tokens(
            docs, chunk_tokens=chunk_tokens, overlap=overlap
        ).collect()
    )
    assert out, "at least one chunk always emitted"
    for idx, text, ct in out:
        want = toks[idx * stride : idx * stride + chunk_tokens]
        assert text == " ".join(want)
        assert ct == len(want) <= chunk_tokens


def test_duplicate_spans_finds_planted_run(spark):
    """A verbatim 40-token run shared by two docs is caught by stride-15
    width-30 sampling (run >= width + stride - 1 guarantees a sampled
    window inside BOTH copies); unique text yields nothing."""
    from siddhi_io_cdc_spark.functions.dedup import duplicate_spans

    shared = " ".join(f"tok{i}" for i in range(44))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma"),
            (2, "start " + shared + " end of the other document here"),
            (3, " ".join(f"unique{i}" for i in range(60))),
        ],
        "doc_id long, text string",
    )
    rows = duplicate_spans(docs, width=30, stride=15).collect()
    assert {r.doc_id for r in rows} == {1, 2}
    assert all(r.n_copies >= 2 for r in rows)
    # shuffle-fallback parity for the dup-hash join
    a = sorted(map(tuple, rows))
    b = sorted(map(tuple, duplicate_spans(docs, width=30, stride=15,
                                          broadcast_dups_max=0).collect()))
    assert a == b

    import pytest
    with pytest.raises(ValueError, match="stride"):
        duplicate_spans(docs, width=30, stride=31)


def test_duplicate_spans_max_windows_guard(spark):
    """The candidate-volume guard: a bound above the measured window count
    passes through unchanged; a bound below it raises instead of launching
    the aggregation (the adversarial-anchor-density escape hatch)."""
    import pytest

    from siddhi_io_cdc_spark.functions.dedup import duplicate_spans

    shared = " ".join(f"tok{i}" for i in range(44))
    docs = spark.createDataFrame(
        [(1, "alpha beta " + shared + " gamma"), (2, "start " + shared + " end")],
        "doc_id long, text string",
    )
    ok = duplicate_spans(docs, width=30, stride=15, max_windows=10_000).collect()
    assert ok == duplicate_spans(docs, width=30, stride=15).collect()
    with pytest.raises(ValueError, match="max_windows"):
        duplicate_spans(docs, width=30, stride=1, max_windows=1).collect()


def test_temperature_mixture_upsamples_small_domains(spark):
    """alpha=0 equalizes: the kept set has (approximately) equal per-domain
    counts bounded by the smallest domain; alpha=1 keeps everything (the
    natural distribution is already the target)."""
    from siddhi_io_cdc_spark.functions.export import temperature_mixture

    rows = [(i, "big") for i in range(400)] + [(i + 1000, "small") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    kept1 = temperature_mixture(df, alpha=1.0).groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in kept1} == {"big": 400, "small": 50}

    kept0 = {r["source"]: r["count"] for r in
             temperature_mixture(df, alpha=0.0).groupBy("source").count().collect()}
    assert kept0["small"] == 50  # binding domain kept in full
    # big downsampled toward the small domain's size (hash-binomial noise)
    assert kept0["big"] < 120

    import pytest
    with pytest.raises(ValueError, match="alpha"):
        temperature_mixture(df, alpha=1.5)


class TestUL2Denoisers:
    def test_routing_and_branch_parity(self, spark, sf_dir):
        from siddhi_io_cdc_spark.functions.export import (
            span_corruption,
            stable_hash,
            ul2_denoisers,
        )

        docs_df = _docs(spark, sf_dir)
        out = ul2_denoisers(docs_df).collect()
        routes = {
            r.doc_id: r.denoiser for r in out
        }
        # routing is the portable hash % 3, so every family appears
        assert set(routes.values()) == {"r", "x", "s"}
        # R-routed docs must equal the standalone T5 span corruption (3/20)
        r_ids = [i for i, d in routes.items() if d == "r"]
        t5 = {
            r.doc_id: (r.input_text, r.target_text)
            for r in span_corruption(docs_df).collect()
        }
        got = {r.doc_id: (r.input_text, r.target_text) for r in out}
        for i in r_ids:
            assert got[i] == t5[i]

    def test_s_branch_splits_reconstruct(self, spark):
        from pyspark.sql import functions as F

        from siddhi_io_cdc_spark.functions.export import ul2_denoisers

        # enough docs that some hash-route to 's'
        rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(30)]
        rows.append((100, ""))  # degenerate: no tokens
        rows.append((101, "single"))
        df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        out = {r.doc_id: r for r in ul2_denoisers(df).collect()}
        s_rows = [r for r in out.values() if r.denoiser == "s" and r.doc_id < 100]
        assert s_rows, "no doc routed to the S family"
        for r in s_rows:
            assert r.input_text.endswith(" <extra_id_0>")
            assert r.target_text.startswith("<extra_id_0> ")
            prefix = r.input_text[: -len(" <extra_id_0>")]
            suffix = r.target_text[len("<extra_id_0> "):]
            assert prefix and suffix  # both sides non-empty for n >= 2
            assert f"{prefix} {suffix}" == "alpha beta gamma delta epsilon zeta"
        # degenerate docs don't crash; empty doc yields bare sentinels
        for i in (100, 101):
            assert out[i].denoiser in {"r", "x", "s"}

    def test_x_branch_rate(self, spark):
        from siddhi_io_cdc_spark.functions.export import ul2_denoisers

        text = " ".join(f"tok{i}" for i in range(64))  # tokenizes to 128 TOKEN_RE tokens
        df = spark.createDataFrame(
            [(i, text) for i in range(30)], "doc_id LONG, text STRING"
        )
        out = [r for r in ul2_denoisers(df).collect() if r.denoiser == "x"]
        assert out
        for r in out:
            # span 8 / block 16 -> exactly half the tokens masked
            n_target_tokens = len(r.target_text.split()) - r.target_text.count(
                "<extra_id_"
            )
            assert n_target_tokens == 64


def test_kneser_ney_matches_pure_python_reference(spark):
    from siddhi_io_cdc_spark.functions.export import kneser_ney_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "b c a"), (3, "a"), (4, "c a b")],
        "doc_id long, text string",
    )
    # pure-Python interpolated-KN reference over the same corpus
    corpus = {1: "a b a b c".split(), 2: "b c a".split(), 4: "c a b".split()}
    from collections import Counter

    c12 = Counter()
    for toks in corpus.values():
        for w1, w2 in zip(toks, toks[1:]):
            c12[(w1, w2)] += 1
    c1 = Counter()
    n1p_l = Counter()
    n1p_r = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1p_l[w1] += 1
        n1p_r[w2] += 1
    n_types = len(c12)
    D = 0.75

    def p(w1, w2):
        return (max(c12[(w1, w2)] - D, 0.0) / c1[w1]) + (
            D * n1p_l[w1] / c1[w1]
        ) * (n1p_r[w2] / n_types)

    expect = {}
    for doc, toks in corpus.items():
        vals = [-math.log(p(w1, w2)) for w1, w2 in zip(toks, toks[1:])]
        expect[doc] = (round(sum(vals) / len(vals), 6), len(vals))
    expect[3] = (None, None)  # single token: no bigram positions

    got = {
        r.doc_id: (r.kn_nll, r.n_bigrams)
        for r in kneser_ney_logprob(docs).collect()
    }
    assert got == expect


def test_kneser_ney_smooths_unseen_bigrams(spark):
    # the defining KN property the MLE ladder lacks: an UNSEEN bigram made
    # of seen words still gets positive probability mass
    from siddhi_io_cdc_spark.functions.export import kneser_ney_logprob

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "b c b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r.kn_nll for r in kneser_ney_logprob(train).collect()}
    assert all(v is not None and v > 0 for v in out.values())
    with pytest.raises(ValueError):
        kneser_ney_logprob(train, discount=1.5)


def test_kneser_ney_shuffle_fallback_matches_broadcast(spark, sf_dir):
    from siddhi_io_cdc_spark.functions.export import kneser_ney_logprob

    docs = _docs(spark, sf_dir).limit(40)
    a = sorted(map(tuple, kneser_ney_logprob(docs).collect()))
    b = sorted(
        map(tuple, kneser_ney_logprob(docs, broadcast_vocab_max=1).collect())
    )
    assert a == b and len(a) == 40


def test_duplicate_spans_maximal_exact_boundaries(spark):
    """Planted duplications: maximal runs report EXACT start/len; disjoint
    duplications in one document stay separate runs; sub-threshold
    duplications (< seed_width tokens) never appear."""
    from siddhi_io_cdc_spark.functions.dedup import duplicate_spans_maximal

    run_a = " ".join(f"alpha{i:02d}" for i in range(20))  # 20 tokens
    run_b = " ".join(f"bravo{i:02d}" for i in range(16))  # exactly seed_width
    short = " ".join(f"mini{i}" for i in range(7))        # 14 toks < 16
    docs = [
        (1, "one two " + run_a + " three " + run_b + " four five"),
        (2, "x " + run_a + " y"),
        (3, "p q r " + run_b),
        (4, "noise " + short + " more noise"),
        (5, "other " + short + " trailing words here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_len)
        for r in duplicate_spans_maximal(df, seed_width=16).collect()
    }
    # tokens: alphaNN/bravoNN are single TOKEN_RE tokens? TOKEN_RE splits
    # letter/digit boundaries -> each planted word is 2 tokens, runs double
    assert (1, 3, 40) in got            # doc1: one,two then 40-token run_a
    assert (1, 3 + 40 + 1, 32) in got   # doc1: 'three' then 32-token run_b
    assert (2, 2, 40) in got            # doc2: 'x' then run_a
    assert (3, 4, 32) in got            # doc3: p,q,r then run_b
    assert all(d not in (4, 5) for d, _, _ in got)  # 14-token dup: below bar
    assert len(got) == 4


def test_duplicate_spans_maximal_overlapping_duplications_merge(spark):
    """Two different duplicated substrings overlapping in one document merge
    into one maximal covered run (the Lee et al. removal semantics)."""
    from siddhi_io_cdc_spark.functions.dedup import duplicate_spans_maximal

    seg1 = " ".join(f"left{i:02d}" for i in range(12))    # 24 tokens
    seg2 = " ".join(f"right{i:02d}" for i in range(12))   # 24 tokens
    docs = [
        (1, seg1 + " " + seg2),      # covered by both partners
        (2, "aa bb " + seg1),        # shares seg1 with doc1
        (3, seg2 + " zz"),           # shares seg2 with doc1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_len)
        for r in duplicate_spans_maximal(df, seed_width=16).collect()
    }
    assert (1, 1, 48) in got  # one merged maximal run covering the document


def test_duplicate_spans_maximal_guards(spark):
    from siddhi_io_cdc_spark.functions.dedup import duplicate_spans_maximal

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="seed_width"):
        duplicate_spans_maximal(df, seed_width=1)
    with _pytest.raises(ValueError, match="min_copies"):
        duplicate_spans_maximal(df, min_copies=1)


def test_remove_duplicate_spans_rewrites_and_passthrough(spark):
    from siddhi_io_cdc_spark.functions.dedup import remove_duplicate_spans

    shared = " ".join(f"tok{i}" for i in range(12))  # 24 TOKEN_RE tokens
    df = spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma"),
            (2, "x " + shared + " y z"),
            (3, "clean document nothing here repeats"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text_out, r.n_removed_tokens)
        for r in remove_duplicate_spans(df, seed_width=16).collect()
    }
    assert got[1] == ("alpha beta gamma", 24)
    assert got[2] == ("x y z", 24)
    assert got[3] == ("clean document nothing here repeats", 0)
    assert got[4] == ("", 0)  # empty docs pass through


def test_remove_duplicate_spans_keep_first_copy(spark):
    from siddhi_io_cdc_spark.functions.dedup import remove_duplicate_spans

    shared = " ".join(f"tok{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, "alpha beta " + shared), (2, "x " + shared + " y")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text_out, r.n_removed_tokens)
        for r in remove_duplicate_spans(
            df, seed_width=16, keep_first_copy=True
        ).collect()
    }
    # smallest (doc_id, span_start) occurrence survives; the other is excised
    assert got[1][1] == 0 and got[1][0].startswith("alpha beta tok 0")
    assert got[2] == ("x y", 24)


def test_maximal_spans_screen_consistency(spark):
    """Two-stage form: every run the screen catches is reported with the
    same exact boundaries as the single-stage form (the anchor is content-
    derived, so a run survives the screen in ALL copies or none)."""
    from siddhi_io_cdc_spark.functions.dedup import duplicate_spans_maximal

    run_a = " ".join(f"alpha{i:02d}" for i in range(30))  # long run: screened
    docs = [
        (1, "one two " + run_a + " three"),
        (2, "x " + run_a + " y"),
        (3, "clean text with nothing repeated in it"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exact = {
        (r.doc_id, r.span_start, r.span_len)
        for r in duplicate_spans_maximal(df, seed_width=16).collect()
    }
    screened = {
        (r.doc_id, r.span_start, r.span_len)
        for r in duplicate_spans_maximal(
            df, seed_width=16, screen_stride=2
        ).collect()
    }
    # the screen can only lose whole runs, never shift boundaries
    assert screened <= exact
    # a 60-token run, 45 anchor chances at stride 2: P(miss) = 2^-45 — the
    # planted run is always screened
    assert any(d == 1 for d, _, _ in screened) and any(d == 2 for d, _, _ in screened)
    assert screened == exact  # on this fixture nothing else exists

    import pytest as _pytest

    with _pytest.raises(ValueError, match="screen_stride"):
        duplicate_spans_maximal(df, seed_width=16, screen_stride=32)


def test_decontaminate_spans_exact_boundaries(spark):
    from siddhi_io_cdc_spark.functions.dedup import (
        decontaminate_spans,
        remove_contaminated_spans,
    )

    leak = " ".join(f"bench{i:02d}" for i in range(12))  # 24 TOKEN_RE tokens
    train = spark.createDataFrame(
        [
            (1, "intro words " + leak + " outro"),
            (2, "totally clean training document here"),
            (3, leak),  # the whole document is the leaked text
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "question preamble " + leak + " answer choices")],
        "doc_id long, text string",
    )
    runs = {
        (r.doc_id, r.span_start, r.span_len)
        for r in decontaminate_spans(train, bench, seed_width=16).collect()
    }
    assert runs == {(1, 3, 24), (3, 1, 24)}

    removed = {
        r.doc_id: (r.text_out, r.n_removed_tokens)
        for r in remove_contaminated_spans(train, bench, seed_width=16).collect()
    }
    assert removed[1] == ("intro words outro", 24)
    assert removed[2][1] == 0
    assert removed[3] == ("", 24)

    # duplication WITHIN the corpus alone never flags (only bench overlap)
    dup = " ".join(f"traindup{i:02d}" for i in range(12))
    train2 = spark.createDataFrame(
        [(1, dup), (2, dup + " extra")], "doc_id long, text string"
    )
    assert decontaminate_spans(train2, bench, seed_width=16).count() == 0


def test_kneser_ney_ngram_matches_bruteforce(spark):
    """Interpolated KN at n=2..5 against an independent Python reference
    implementing the Chen & Goodman recursion over KenLM-style adjusted
    counts directly; n=2 must also be bit-equal to the dedicated bigram
    implementation (same recursion, two-table shape)."""
    import math
    import re
    from collections import Counter, defaultdict

    from siddhi_io_cdc_spark.functions.export import (
        kneser_ney_logprob,
        kneser_ney_ngram_logprob,
    )
    from siddhi_io_cdc_spark.functions.text import TOKEN_RE

    docs = {
        1: "the cat sat on the mat and the cat ran off the mat",
        2: "the dog sat on the log and the dog ran off the log quickly",
        3: "a cat and a dog sat on a mat together in peace",
        4: "short one",
        5: "the cat sat on the mat and the cat sat on the mat again",
    }

    def brute(n, D=0.75):
        toks = {d: re.findall(TOKEN_RE, t.lower()) for d, t in docs.items()}
        grams = [
            tuple(ts[i:i + n]) for ts in toks.values()
            for i in range(len(ts) - n + 1)
        ]
        a = {n: Counter(grams)}
        for k in range(n - 1, 0, -1):
            a[k] = Counter(g[-k:] for g in a[k + 1])
        s, t = {}, {}
        for k in range(n, 1, -1):
            s[k] = defaultdict(int)
            t[k] = defaultdict(int)
            for g, c in a[k].items():
                s[k][g[:-1]] += c
                t[k][g[:-1]] += 1
        S1 = sum(a[1].values())

        def P(g):
            p = a[1][g[-1:]] / S1
            for k in range(2, n + 1):
                gk = g[-k:]
                p = (
                    max(a[k][gk] - D, 0.0) / s[k][gk[:-1]]
                    + (D * t[k][gk[:-1]] / s[k][gk[:-1]]) * p
                )
            return p

        out = {}
        for d, ts in toks.items():
            gs = [tuple(ts[i:i + n]) for i in range(len(ts) - n + 1)]
            out[d] = (
                (round(sum(-math.log(P(g)) for g in gs) / len(gs), 6), len(gs))
                if gs else (None, None)
            )
        return out

    df = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    for n in (2, 3, 5):
        got = {
            r["doc_id"]: (r["kn_nll"], r["n_ngrams"])
            for r in kneser_ney_ngram_logprob(df, n=n).collect()
        }
        assert got == brute(n), f"n={n}"
    g2 = {
        r["doc_id"]: (r["kn_nll"], r["n_bigrams"])
        for r in kneser_ney_logprob(df).collect()
    }
    gn = {
        r["doc_id"]: (r["kn_nll"], r["n_ngrams"])
        for r in kneser_ney_ngram_logprob(df, n=2).collect()
    }
    assert g2 == gn

    with pytest.raises(ValueError, match="n must be"):
        kneser_ney_ngram_logprob(df, n=1)
    with pytest.raises(ValueError, match="discount"):
        kneser_ney_ngram_logprob(df, discount=1.5)


def test_modified_kneser_ney_matches_bruteforce(spark):
    """Modified KN (three count-of-count discounts per order, KenLM's
    default) against an independent Python reference at n=2 and n=3 on a
    corpus rich enough that every order has nonzero n1..n4."""
    import math
    import random
    import re
    from collections import Counter, defaultdict

    from siddhi_io_cdc_spark.functions.export import (
        modified_kn_discounts,
        modified_kneser_ney_logprob,
    )
    from siddhi_io_cdc_spark.functions.text import TOKEN_RE

    rng = random.Random(13)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    docs = {
        d: " ".join(rng.choice(words) for _ in range(rng.randint(15, 40)))
        for d in range(1, 13)
    }

    def brute(n):
        toks = {d: re.findall(TOKEN_RE, t.lower()) for d, t in docs.items()}
        grams = [
            tuple(ts[i:i + n]) for ts in toks.values()
            for i in range(len(ts) - n + 1)
        ]
        a = {n: Counter(grams)}
        for k in range(n - 1, 0, -1):
            a[k] = Counter(g[-k:] for g in a[k + 1])
        disc = {}
        for k in range(2, n + 1):
            cc = Counter(min(c, 5) for c in a[k].values())
            disc[k] = modified_kn_discounts(cc[1], cc[2], cc[3], cc[4])
        s = {}
        t123 = {}
        for k in range(n, 1, -1):
            s[k] = defaultdict(int)
            t123[k] = defaultdict(lambda: [0, 0, 0])
            for g, c in a[k].items():
                s[k][g[:-1]] += c
                t123[k][g[:-1]][min(c, 3) - 1] += 1
        S1 = sum(a[1].values())

        def P(g):
            p = a[1][g[-1:]] / S1
            for k in range(2, n + 1):
                gk = g[-k:]
                d1, d2, d3 = disc[k]
                c = a[k][gk]
                D = d1 if c == 1 else d2 if c == 2 else d3
                t1, t2, t3 = t123[k][gk[:-1]]
                gamma = d1 * t1 + d2 * t2 + d3 * t3
                p = max(c - D, 0.0) / s[k][gk[:-1]] + (gamma / s[k][gk[:-1]]) * p
            return p

        out = {}
        for d, ts in toks.items():
            gs = [tuple(ts[i:i + n]) for i in range(len(ts) - n + 1)]
            out[d] = (
                (round(sum(-math.log(P(g)) for g in gs) / len(gs), 6), len(gs))
                if gs else (None, None)
            )
        return out

    df = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    for n in (2, 3):
        got = {
            r["doc_id"]: (r["mkn_nll"], r["n_ngrams"])
            for r in modified_kneser_ney_logprob(df, n=n).collect()
        }
        assert got == brute(n), f"n={n}"

    with pytest.raises(ValueError, match="count-of-counts"):
        modified_kn_discounts(5, 3, 0, 1)
    # KenLM's --discount_fallback escape hatch for degenerate orders
    assert modified_kn_discounts(5, 3, 0, 1, fallback=(0.5, 1.0, 1.5)) == (
        0.5, 1.0, 1.5,
    )
    # KenLM's range check (each Dj in [0, j]): all-nonzero but skewed
    # count-of-counts (n3 >> n2 here gives D2 = 2 - 3*y*n3/n2 < 0) must
    # refuse rather than hand a negative discount (=> gamma < 0 => negative
    # probability => silent NaN NLL) to the scorer.
    with pytest.raises(ValueError, match=r"outside \[0, 2\]"):
        modified_kn_discounts(10, 1, 50, 1)
    assert modified_kn_discounts(10, 1, 50, 1, fallback=(0.5, 1.0, 1.5)) == (
        0.5, 1.0, 1.5,
    )
