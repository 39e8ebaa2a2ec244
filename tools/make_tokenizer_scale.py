"""Tokenizer-trainer scale measurement: merges/vocab vs wall time.

VERDICT r7 #2: the BPE and unigram-LM trainers ship with demo-scale
defaults (6 merges / 48 pieces); real tokenizers run 32k-100k merges or
pieces, where the binding constraint is DRIVER-side — one Spark round per
merge/EM-step, with plan-build (py4j + Catalyst analysis) cost growing
with the lineage unless it is truncated. This tool measures the actual
curve so the 100x story is measured, not asserted:

- ``bpe_train`` at n_merges in {64, 256, 1024} (checkpoint_every=16, the
  shipped default that keeps plans bounded and total work linear);
- optionally the same points with lineage truncation disabled
  (``--no-checkpoint``) to quantify what the truncation buys;
- ``unigram_lm_train`` at vocab_size in {1k, 8k} (n_iters=2) — its cost
  axis is the LITERAL piece map each DP level probes, not the round count.

Results print as one JSON line and append a markdown block suitable for
BASELINE.md.

Usage:
    python tools/make_tokenizer_scale.py [--sf /root/testdata/sf0.1]
        [--merges 64,256,1024] [--vocabs 1000,8000] [--no-checkpoint]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--merges", default="64,256,1024")
    ap.add_argument("--vocabs", default="1000,8000")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--no-checkpoint", action="store_true",
                    help="disable lineage truncation (quantifies the quadratic baseline)")
    ap.add_argument("--augment", action="store_true",
                    help="widen the fixture vocabulary deterministically so the "
                         "merge supply outlasts 1024 rounds (measurement corpus)")
    ap.add_argument("--skip-unigram", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from siddhi_io_cdc_spark.functions.tokenizer import bpe_train
    from siddhi_io_cdc_spark.functions.unigram_lm import unigram_lm_train

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(args.sf, "documents.parquet"))
    if args.augment:
        # The shipped fixture has only ~300 distinct words at ANY sf (the
        # generator draws from a small list), so the merge supply exhausts
        # after ~90 rounds — too few to measure a 1024-merge curve. Widen
        # the vocabulary DETERMINISTICALLY: each word gains a 4-letter
        # suffix derived from md5(word, doc_id%64), giving ~300*64 distinct
        # words with the original frequency skew. This is a measurement
        # corpus (wall-time axis), not a contract fixture.
        from pyspark.sql import functions as F

        words = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        aug = F.array_join(
            F.transform(
                words,
                lambda w: F.concat(
                    w,
                    F.translate(
                        F.substring(
                            F.md5(F.concat(w, (F.col("doc_id") % 64).cast("string"))),
                            1, 4,
                        ),
                        "0123456789", "qwertyuiop",
                    ),
                ),
            ),
            " ",
        )
        docs = docs.select("doc_id", aug.alias("text"))
    n_docs = docs.count()

    out: dict = {"sf": args.sf, "n_docs": n_docs, "cpus": int(args.cpus),
                 "checkpoint_every": None if args.no_checkpoint else 16,
                 "bpe": {}, "unigram": {}}

    for m in [int(x) for x in args.merges.split(",") if x]:
        ck = 10**9 if args.no_checkpoint else 16
        t0 = time.monotonic()
        merges = bpe_train(docs, n_merges=m, checkpoint_every=ck)
        n_learned = merges.count()
        dt = time.monotonic() - t0
        out["bpe"][str(m)] = {"sec": round(dt, 2), "learned": n_learned,
                              "sec_per_merge": round(dt / m, 4)}
        print(f"bpe n_merges={m}: {dt:.1f}s ({dt / m * 1000:.0f} ms/merge, "
              f"{n_learned} learned)", file=sys.stderr)

    for v in [] if args.skip_unigram else [int(x) for x in args.vocabs.split(",") if x]:
        t0 = time.monotonic()
        pieces = unigram_lm_train(docs, vocab_size=v, max_piece_len=4, n_iters=2)
        n_pieces = pieces.count()
        dt = time.monotonic() - t0
        out["unigram"][str(v)] = {"sec": round(dt, 2), "pieces": n_pieces}
        print(f"unigram vocab={v}: {dt:.1f}s ({n_pieces} surviving pieces)",
              file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
