"""Unigram-LM tokenizer: pure-Python EM/Viterbi reference parity + encode."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.unigram_lm import (
    seed_pieces,
    unigram_lm_encode,
    unigram_lm_train,
    viterbi_segment,
    word_frequencies,
)

TEXTS = [
    "the cat sat on the mat",
    "the hat of the cat",
    "a cat and a hat and a mat",
    "catamaran hats matter",
    "extraordinarily long considerations",  # >12-char words: dropped in train
]


def _ref_words(texts, max_word_len):
    return Counter(
        w
        for t in texts
        for w in re.findall("[a-z]+", t.lower())
        if len(w) <= max_word_len
    )


def _ref_viterbi(w, lps, P):
    s = [0.0] + [None] * len(w)
    g = [[]] + [None] * len(w)
    for i in range(1, len(w) + 1):
        best = None
        for l in range(min(i, P), 0, -1):  # longest first; strict > keeps it
            piece = w[i - l : i]
            cand_s = s[i - l] + lps.get(piece, -1e9)
            if best is None or cand_s > best[0]:
                best = (cand_s, g[i - l] + [piece])
        s[i], g[i] = best
    return g[len(w)]


def _ref_train(texts, vocab_size, P, L, iters):
    words = _ref_words(texts, L)
    seeds = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for l in range(1, P + 1):
                if i + l <= len(w):
                    seeds[w[i : i + l]] += f
    chars = {p: c for p, c in seeds.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in seeds.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )
    budget = max(vocab_size - len(chars), 0)
    counts = dict(chars)
    counts.update(dict(multi[:budget]))

    def norm(cc):
        tot = sum(cc.values())
        return {p: math.log(c / tot) for p, c in cc.items()}

    lps = {p: round(v, 9) for p, v in norm(counts).items()}
    for _ in range(iters):
        new = Counter()
        for w, f in words.items():
            for p in _ref_viterbi(w, lps, P):
                new[p] += f
        counts = dict(new)
        lps = {p: round(v, 9) for p, v in norm(counts).items()}
    return counts, lps


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_word_frequencies_drop_long_words(spark, docs):
    got = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert got == dict(_ref_words(TEXTS, 12))
    assert "extraordinarily" not in got and "considerations" not in got


def test_seed_pieces_cover_alphabet_and_rank_ties(spark, docs):
    words = word_frequencies(docs)
    got = {
        r["piece"]: r["piece_count"]
        for r in seed_pieces(words, vocab_size=30, max_piece_len=3).collect()
    }
    ref_words = _ref_words(TEXTS, 12)
    seeds = Counter()
    for w, f in ref_words.items():
        for i in range(len(w)):
            for l in range(1, 4):
                if i + l <= len(w):
                    seeds[w[i : i + l]] += f
    chars = {p: c for p, c in seeds.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in seeds.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[: max(30 - len(chars), 0)]
    expect = dict(chars)
    expect.update(dict(multi))
    assert got == expect
    # every character appearing in any kept word is present
    assert all(len(p) == 1 for p in set(expect) - set(got) | set(got) - set(expect)) or got == expect


def test_train_matches_pure_python_reference(spark, docs):
    out = unigram_lm_train(
        docs, vocab_size=30, max_piece_len=3, max_word_len=12, n_iters=2
    ).collect()
    counts, lps = _ref_train(TEXTS, 30, 3, 12, 2)
    got_counts = {r["piece"]: r["piece_count"] for r in out}
    assert got_counts == counts
    for r in out:
        assert abs(r["logprob"] - lps[r["piece"]]) < 2e-9, r["piece"]


def test_viterbi_prefers_longer_piece_on_ties(spark):
    # vocab engineered so 'ab' and a->b paths tie exactly: lp(ab) = lp(a)+lp(b)
    words = spark.createDataFrame([("ab",)], "word string")
    vocab = [("a", -1.0), ("b", -1.0), ("ab", -2.0)]
    seg = viterbi_segment(words, vocab, max_word_len=4, max_piece_len=2).collect()
    assert seg[0]["seg"] == "(ab)"


def test_encode_roundtrip_and_oov_passthrough(spark, docs):
    vocab = unigram_lm_train(
        docs, vocab_size=30, max_piece_len=3, max_word_len=12, n_iters=2
    )
    enc = unigram_lm_encode(docs, vocab).collect()
    by_id = {r["doc_id"]: r for r in enc}
    counts, lps = _ref_train(TEXTS, 30, 3, 12, 2)
    # reference encode of doc 0
    words0 = re.findall("[a-z]+", TEXTS[0].lower())
    ref_pieces = []
    for w in words0:
        ref_pieces.extend(
            _ref_viterbi(w, lps, 3) if len(w) <= 12 else [w]
        )
    assert by_id[0]["pieces"].split(" ") == ref_pieces
    assert by_id[0]["n_pieces"] == len(ref_pieces)
    # doc 4's two >12-char words pass through as single OOV pieces
    ref4 = []
    for w in re.findall("[a-z]+", TEXTS[4].lower()):
        ref4.extend(_ref_viterbi(w, lps, 3) if len(w) <= 12 else [w])
    assert by_id[4]["pieces"].split(" ") == ref4
    assert "extraordinarily" in ref4 and "considerations" in ref4
    assert by_id[4]["n_pieces"] == len(ref4)


def test_encode_concatenation_reconstructs_words(spark, docs):
    vocab = unigram_lm_train(docs, vocab_size=30, n_iters=1)
    enc = unigram_lm_encode(docs, vocab)
    joined = docs.join(enc, "doc_id").collect()
    for r in joined:
        rebuilt = r["pieces"].replace(" ", "")
        original = "".join(re.findall("[a-z]+", r["text"].lower()))
        assert rebuilt == original


def test_train_validates(spark, docs):
    with pytest.raises(ValueError):
        unigram_lm_train(docs, n_iters=0)
    with pytest.raises(ValueError):
        unigram_lm_train(docs, max_piece_len=5, max_word_len=4)


def test_broadcast_vocab_dp_parity_with_literal(spark):
    """The data-derived per-word lookup map (the ≥8k-piece codegen path)
    must segment identically to the literal map: same pieces, same counts,
    for every document — including OOV-substring words (NULL map rows)."""
    from siddhi_io_cdc_spark.functions.unigram_lm import (
        unigram_lm_encode,
        unigram_lm_train,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "pack my box with five dozen jugs"),
            (3, "zzzzqqqq xxxx"),  # substrings mostly absent from the vocab
            (4, ""),
        ],
        "doc_id long, text string",
    )
    vocab = unigram_lm_train(docs, vocab_size=48, max_piece_len=3, n_iters=2)
    lit = {
        (r.doc_id): (r.pieces, r.n_pieces)
        for r in unigram_lm_encode(docs, vocab).collect()
    }
    bc = {
        (r.doc_id): (r.pieces, r.n_pieces)
        for r in unigram_lm_encode(docs, vocab, broadcast_vocab=True).collect()
    }
    assert bc == lit


def test_broadcast_vocab_requires_dataframe(spark):
    from siddhi_io_cdc_spark.functions.unigram_lm import unigram_lm_encode

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="broadcast_vocab"):
        unigram_lm_encode(docs, [("a", -1.0)], broadcast_vocab=True)


def test_train_broadcast_vocab_parity(spark):
    """EM rounds driven by the distributed piece table (broadcast DP maps)
    must learn exactly the literal-path model."""
    from siddhi_io_cdc_spark.functions.unigram_lm import unigram_lm_train

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "sphinx of black quartz judge my vow"),
        ],
        "doc_id long, text string",
    )
    lit = sorted(
        (r.piece, r.piece_count, r.logprob)
        for r in unigram_lm_train(docs, vocab_size=48, n_iters=2).collect()
    )
    bc = sorted(
        (r.piece, r.piece_count, r.logprob)
        for r in unigram_lm_train(
            docs, vocab_size=48, n_iters=2, broadcast_vocab=True
        ).collect()
    )
    assert bc == lit


def test_unigram_model_save_load_roundtrip(spark, tmp_path):
    from siddhi_io_cdc_spark.functions.unigram_lm import (
        load_unigram_model,
        save_unigram_model,
        unigram_lm_encode,
        unigram_lm_train,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "pack my box with jugs")],
        "doc_id long, text string",
    )
    pieces = unigram_lm_train(docs, vocab_size=48, n_iters=1)
    path = str(tmp_path / "uni_model.json")
    save_unigram_model(spark, pieces, path)
    loaded = load_unigram_model(spark, path)
    want = sorted((r.piece, r.logprob) for r in pieces.collect())
    assert sorted(loaded) == want
    a = {(r.doc_id): r.pieces for r in unigram_lm_encode(docs, pieces).collect()}
    b = {(r.doc_id): r.pieces for r in unigram_lm_encode(docs, loaded).collect()}
    assert a == b
    # DataFrame form feeds the broadcast_vocab scale path
    as_df = load_unigram_model(spark, path, as_dataframe=True)
    c = {
        (r.doc_id): r.pieces
        for r in unigram_lm_encode(docs, as_df, broadcast_vocab=True).collect()
    }
    assert c == a


def test_literal_map_forms_segment_identically(spark):
    """The from_json one-string literal map (stable codegen source across
    EM rounds) must segment exactly like the create_map fallback the
    non-finite/duplicate guard keeps — same pieces for every word,
    including OOV-substring words (map misses)."""
    import math as _math

    # "" pins the empty-word guard: length 0 must take the OOV branch (the
    # aggregate's sequence(1, 0) would be DESCENDING and hit
    # element_at(acc, 0) → INVALID_INDEX_OF_ZERO), returning '()' exactly
    # like the pre-aggregate ladder did.
    words = spark.createDataFrame(
        [("hello",), ("catamaran",), ("zzzz",), ("a",), ("",)], "word string"
    )
    vocab = [
        ("a", -1.25), ("at", -2.5), ("cat", -0.875), ("h", -3.0),
        ("he", -2.0), ("llo", -1.5), ("m", -2.75), ("ran", -1.0),
        ("z", -0.5),
    ]
    via_json = {
        r["word"]: r["seg"]
        for r in viterbi_segment(words, vocab, 12, 3).collect()
    }
    # force the create_map fallback through the documented non-finite
    # guard (values patched back to the same finite doubles afterwards)
    real_isfinite = _math.isfinite
    _math.isfinite = lambda x: False
    try:
        fell_back = viterbi_segment(words, vocab, 12, 3)
        # non-vacuity: the guard really took the create_map branch
        assert "from_json" not in fell_back._jdf.queryExecution().analyzed().toString()
        via_create_map = {r["word"]: r["seg"] for r in fell_back.collect()}
    finally:
        _math.isfinite = real_isfinite
    assert via_json == via_create_map
    assert via_json[""] == "()"
    assert via_json["zzzz"] == "(z)(z)(z)(z)"
