"""BPE trainer/encoder: exact semantics vs a hand-computed reference,
tie-breaks, early stop, and the map-only encode plan."""

import pytest
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.tokenizer import bpe_encode, bpe_train


def _train(spark, texts, n):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train(df, n_merges=n).orderBy("merge_rank").collect()
    ]


def test_bpe_train_matches_hand_computed(spark):
    # vocab: low(2) lower(1) lowest(1) -> pairs round 1:
    #   (l,o)=4 (o,w)=4 (w,e)=2 (e,r)=1 (e,s)=1 (s,t)=1
    # tie (l,o) vs (o,w) -> lexicographic: (l,o) wins; round 2 merges
    # (lo,w)=4, round 3 (low,e)=2; round 4's pairs are (lowe,r)=1,
    # (lowe,s)=1, (s,t)=1 -> lexicographic tie-break picks (lowe,r).
    got = _train(spark, ["low low lower lowest"], 4)
    assert got == [
        (1, "l", "o", 4),
        (2, "lo", "w", 4),
        (3, "low", "e", 2),
        (4, "lowe", "r", 1),
    ]


def test_bpe_train_early_stop_when_fully_merged(spark):
    # single 2-letter word: one merge exhausts every pair
    got = _train(spark, ["ab ab ab"], 5)
    assert got == [(1, "a", "b", 3)]


def test_bpe_train_counts_weight_by_word_frequency(spark):
    # 'aa' x3 contributes (a,a)=3; 'aaa' x1 contributes (a,a)=2
    got = _train(spark, ["aa aa aa aaa"], 1)
    assert got == [(1, "a", "a", 5)]


def test_bpe_train_rejects_nonpositive_merges(spark):
    df = spark.createDataFrame([("x y",)], "text string")
    with pytest.raises(ValueError):
        bpe_train(df, n_merges=0)


def test_bpe_encode_applies_merges_in_rank_order(spark):
    df = spark.createDataFrame([("the them theme",)], "text string")
    out = bpe_encode(df, [("t", "h"), ("th", "e")]).first()
    assert out.bpe_tokens == ["the", "the", "m", "the", "m", "e"]
    assert out.n_bpe_tokens == 6


def test_bpe_encode_accepts_trained_merges_dataframe(spark):
    df = spark.createDataFrame([("low low lower lowest",)], "text string")
    merges = bpe_train(df, n_merges=3)
    out = bpe_encode(df, merges).first()
    # merges: l+o, lo+w, low+e -> 'lower' = lowe|r, 'lowest' = lowe|s|t
    assert out.bpe_tokens == ["low", "low", "lowe", "r", "lowe", "s", "t"]


def test_bpe_encode_concatenation_recovers_words(spark):
    # lossless-ness: per document, joining the tokens gives back exactly
    # the lowercased alphabetic words in order
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["The Cat-sat; ON a", "banana band ana"])],
        "doc_id bigint, text string",
    )
    merges = bpe_train(df, n_merges=5)
    enc = bpe_encode(df, merges).select(
        "text", F.array_join("bpe_tokens", "").alias("joined")
    )
    import re

    for r in enc.collect():
        assert r.joined == "".join(re.findall("[a-z]+", r.text.lower()))


def test_bpe_encode_plan_is_map_only(spark):
    df = spark.createDataFrame([("some text here",)], "text string")
    plan = bpe_encode(df, [("t", "e"), ("te", "x")])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_bpe_train_one_round_agrees_with_pair_counts(spark, sf_dir):
    # the first learned merge must be the argmax of text.bpe_pair_counts
    from siddhi_io_cdc_spark.functions.text import bpe_pair_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    top = bpe_pair_counts(docs, top_n=1).first()
    first = bpe_train(docs, n_merges=1).first()
    assert (first.left, first.right, first.pair_count) == (
        top.left,
        top.right,
        top.pair_count,
    )


# --- span corruption (export.py) -------------------------------------------


def test_span_corruption_matches_reference(spark):
    import hashlib
    import re

    from siddhi_io_cdc_spark.functions.export import span_corruption
    from siddhi_io_cdc_spark.functions.text import TOKEN_RE

    def ref(doc_id, text, L=3, B=20, seed=0):
        toks = re.findall(TOKEN_RE, text.lower())
        inp, tgt = [], []
        for b in range((len(toks) + B - 1) // B if toks else 0):
            bt = toks[b * B : (b + 1) * B]
            if len(bt) >= L:
                pre = f"{seed}\x1f{doc_id}\x1f{b}"
                h = int(hashlib.md5(pre.encode()).hexdigest()[:15], 16)
                start = h % (len(bt) - L + 1)
                s = f"<extra_id_{b}>"
                inp += bt[:start] + [s] + bt[start + L :]
                tgt += [s] + bt[start : start + L]
            else:
                inp += bt
        return " ".join(inp), " ".join(tgt)

    texts = [
        (0, "the quick brown fox jumps over the lazy dog and then runs far "
            "away into the woods again today for fun and profit with friends"),
        (1, "short text here"),
        (2, ""),
        (3, " ".join(f"w{i}" for i in range(47))),
    ]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    out = {
        r.doc_id: (r.input_text, r.target_text)
        for r in span_corruption(df).collect()
    }
    for i, t in texts:
        assert out[i] == ref(i, t), f"doc {i}"


def test_span_corruption_rate_and_lossless_outside_spans(spark):
    from siddhi_io_cdc_spark.functions.export import span_corruption

    # alphabetic-only words: TOKEN_RE splits letter runs and digit runs
    # into separate tokens, so "tok7" would count as TWO tokens
    words = [
        "tok" + chr(97 + i % 26) + chr(97 + (i // 26) % 26) for i in range(200)
    ]
    df = spark.createDataFrame(
        [(7, " ".join(words))], "doc_id bigint, text string"
    )
    r = span_corruption(df).first()
    # 200 tokens / block 20 -> 10 blocks, each masks exactly one 3-span
    assert r.n_masked == 10
    kept = [t for t in r.input_text.split(" ") if not t.startswith("<extra_id_")]
    masked = [t for t in r.target_text.split(" ") if not t.startswith("<extra_id_")]
    assert len(kept) == 200 - 30 and len(masked) == 30
    # every token survives exactly once, in input or target
    assert sorted(kept + masked) == sorted(words)


def test_span_corruption_guards(spark):
    from siddhi_io_cdc_spark.functions.export import span_corruption

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        span_corruption(df, span_len=0)
    with _pytest.raises(ValueError):
        span_corruption(df, span_len=5, block_len=4)


def test_span_corruption_plan_is_map_only(spark):
    from siddhi_io_cdc_spark.functions.export import span_corruption

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    plan = span_corruption(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_bpe_train_checkpointing_is_semantically_invisible(spark):
    """Lineage truncation every K merges must not change the learned table:
    checkpoint_every=1 (truncate after every merge), =2, and =1000 (never
    truncates within 6 rounds) all produce identical merges."""
    texts = ["low low lower lowest", "newer newest new", "wide wider widest"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")

    def table(ck):
        return [
            (r.merge_rank, r.left, r.right, r.pair_count)
            for r in bpe_train(df, n_merges=6, checkpoint_every=ck)
            .orderBy("merge_rank").collect()
        ]

    base = table(1000)
    assert len(base) == 6
    assert table(1) == base
    assert table(2) == base


def test_bpe_train_sampled_corpus_path(spark):
    """sample_rate trains on the deterministic hash-sample: the merge table
    equals training directly on the pre-filtered slice, and the full corpus
    encodes with it (the standard train-on-sample / encode-everything
    split)."""
    from siddhi_io_cdc_spark.functions.text import deterministic_sample

    rows = [(i, f"pattern pattern patter pat word{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train(df, n_merges=4, sample_rate=0.5)
        .orderBy("merge_rank").collect()
    ]
    manual = deterministic_sample(df, 0.5)
    assert 0 < manual.count() < 40
    want = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train(manual, n_merges=4).orderBy("merge_rank").collect()
    ]
    assert got == want

    encoded = bpe_encode(df, bpe_train(df, n_merges=4, sample_rate=0.5))
    assert encoded.count() == 40  # full corpus encoded with the sampled model
    assert "bpe_tokens" in encoded.columns


def test_bpe_train_rejects_bad_checkpoint_every(spark):
    df = spark.createDataFrame([("ab ab",)], "text string")
    with pytest.raises(ValueError, match="checkpoint_every"):
        bpe_train(df, n_merges=2, checkpoint_every=0)


def test_bpe_model_save_load_roundtrip(spark, tmp_path):
    from siddhi_io_cdc_spark.functions.tokenizer import (
        load_bpe_model,
        save_bpe_model,
    )

    df = spark.createDataFrame(
        [("low low lower lowest",), ("newer newest new",)], "text string"
    )
    merges = bpe_train(df, n_merges=4)
    path = str(tmp_path / "bpe_model.json")
    save_bpe_model(spark, merges, path)
    loaded = load_bpe_model(spark, path)
    want = [(r.left, r.right) for r in merges.orderBy("merge_rank").collect()]
    assert loaded == want
    # encode parity through the reloaded artifact
    a = bpe_encode(df, merges).select("bpe_tokens").collect()
    b = bpe_encode(df, loaded).select("bpe_tokens").collect()
    assert [r.bpe_tokens for r in a] == [r.bpe_tokens for r in b]

    import pytest as _pytest

    from siddhi_io_cdc_spark.functions.similarity import _hadoop_write_text

    _hadoop_write_text(spark, str(tmp_path / "junk.json"), '{"kind": "x"}')
    with _pytest.raises(ValueError, match="BPE model"):
        load_bpe_model(spark, str(tmp_path / "junk.json"))
