"""Property-based exactness pin for maximal duplicated-substring detection.

The brute-force reference here implements the COVERAGE SEMANTICS directly
(union of covered token intervals over every duplicated window, then
maximal intervals) — a deliberately different algorithm from the shipped
islands-plus-interval-merge Spark plan, so agreement on random corpora is
independent evidence, not a restatement. Random corpora are built from a
tiny alphabet so duplicated windows arise organically, plus planted
verbatim runs shared across documents.
"""

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from siddhi_io_cdc_spark.functions.dedup import (
    duplicate_spans_maximal,
    remove_duplicate_spans,
)
from siddhi_io_cdc_spark.functions.text import TOKEN_RE

SEED_W = 4  # small seed width so short random docs participate


def _brute_maximal(docs: dict[int, str], w: int, min_copies: int = 2):
    """Reference: covered positions = union of [i, i+w-1] over every window
    whose text occurs >= min_copies times corpus-wide; output = maximal
    covered intervals per doc (1-based)."""
    toks = {d: re.findall(TOKEN_RE, t.lower()) for d, t in docs.items()}
    from collections import Counter

    cnt = Counter()
    for t in toks.values():
        for i in range(len(t) - w + 1):
            cnt[" ".join(t[i:i + w])] += 1
    out = set()
    covered_by_doc = {}
    for d, t in toks.items():
        covered = set()
        for i in range(len(t) - w + 1):
            if cnt[" ".join(t[i:i + w])] >= min_copies:
                covered.update(range(i + 1, i + w + 1))
        covered_by_doc[d] = covered
        for p in sorted(covered):
            if p - 1 not in covered:  # interval start
                q = p
                while q + 1 in covered:
                    q += 1
                out.add((d, p, q - p + 1))
    return out, covered_by_doc, toks


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(min_value=2, max_value=5))
    words = ["aa", "bb", "cc", "dd"]
    docs = {}
    for d in range(n_docs):
        n = draw(st.integers(min_value=0, max_value=14))
        docs[d] = " ".join(
            words[draw(st.integers(min_value=0, max_value=3))] for _ in range(n)
        )
    # plant a verbatim run across two documents sometimes
    if draw(st.booleans()) and n_docs >= 2:
        run = " ".join(
            words[draw(st.integers(min_value=0, max_value=3))]
            for _ in range(draw(st.integers(min_value=SEED_W, max_value=8)))
        )
        docs[0] = (docs[0] + " " + run).strip()
        docs[1] = (run + " " + docs[1]).strip()
    return docs


@given(docs=corpora())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_maximal_spans_match_bruteforce_coverage(spark, docs):
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_len)
        for r in duplicate_spans_maximal(df, seed_width=SEED_W).collect()
    }
    want, covered, toks = _brute_maximal(docs, SEED_W)
    assert got == want

    removed = {
        r.doc_id: (r.text_out, r.n_removed_tokens)
        for r in remove_duplicate_spans(df, seed_width=SEED_W).collect()
    }
    for d, t in toks.items():
        keep = [tok for i, tok in enumerate(t, start=1) if i not in covered[d]]
        assert removed[d] == (" ".join(keep), len(covered[d]))


def test_excise_runs_overlapping_and_adjacent_intervals(spark):
    """_excise_runs must handle OVERLAPPING and adjacent run intervals
    (shared removal tail; the interval-merge rewrite replaced a per-position
    covered-array scan). Reference excision computed independently."""
    from siddhi_io_cdc_spark.functions.dedup import _excise_runs

    tok = lambda i: chr(96 + i) * 2  # aa..tt (alpha-only under TOKEN_RE)
    text = " ".join(tok(i) for i in range(1, 21))
    df = spark.createDataFrame([(1, text), (2, "short doc")],
                               "doc_id bigint, text string")
    # overlap (2-6, 4-9), adjacency (11-12, 13-14), isolated (17-17)
    runs = spark.createDataFrame(
        [(1, 2, 5), (1, 4, 6), (1, 11, 2), (1, 13, 2), (1, 17, 1)],
        "doc_id bigint, span_start int, span_len bigint",
    )
    out = {r.doc_id: r for r in _excise_runs(df, runs, "doc_id", "text").collect()}
    covered = set(range(2, 10)) | set(range(11, 15)) | {17}
    expect = " ".join(tok(i) for i in range(1, 21) if i not in covered)
    assert out[1].text_out == expect
    assert out[1].n_removed_tokens == len(covered)
    assert out[2].text_out == "short doc" and out[2].n_removed_tokens == 0


def test_removers_propagate_cache_tags(spark):
    """remove_duplicate_spans / remove_contaminated_spans must carry the
    persisted-intermediate tags of their span finders so
    release_caches(result) frees them (round-8 advisory: the excision
    wrapper dropped the tags)."""
    from siddhi_io_cdc_spark.functions.dedup import (
        remove_contaminated_spans,
        remove_duplicate_spans,
    )
    from siddhi_io_cdc_spark.util import _CACHE_TAG, release_caches

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "alpha beta gamma delta epsilon zeta iota kappa")],
        "doc_id bigint, text string",
    )
    # build each case only after the previous release: identical plans
    # share a CacheManager entry, so eager construction would cross-talk
    for build in (
        lambda: remove_duplicate_spans(df, seed_width=4),
        lambda: remove_duplicate_spans(df, seed_width=4, keep_first_copy=True),
    ):
        result = build()
        deps = getattr(result, _CACHE_TAG, [])
        assert deps, "result must carry its finder's persisted deps"
        result.count()
        assert any(d.storageLevel.useMemory or d.storageLevel.useDisk
                   for d in deps)
        release_caches(result)
        assert all(not d.storageLevel.useMemory and not d.storageLevel.useDisk
                   for d in deps)
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "bench_id bigint, text string"
    )
    result = remove_contaminated_spans(df, bench, seed_width=4)
    deps = getattr(result, _CACHE_TAG, [])
    assert deps
    result.count()
    release_caches(result)
    assert all(not d.storageLevel.useMemory and not d.storageLevel.useDisk
               for d in deps)
