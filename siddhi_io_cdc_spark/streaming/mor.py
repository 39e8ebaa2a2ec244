"""Merge-on-read (MOR) state layout for the CDC-maintained indexes.

Why this exists — the O(batch) bound the appliers claim. The original
copy-on-write (COW) layout rewrites every *touched* hash-bucket partition
per micro-batch. That bound is honest for the IVF index (a batch touches
at most ``2 * |batch|`` cells), but for token-level state it collapses:
a ~100-document batch holds thousands of distinct terms / 5-grams, whose
hashes land in essentially **all** ``nbuckets`` partitions — measured at
sf0.1 the n-gram applier touches 64/64 buckets for a 100-doc batch, so
the "touched-bucket" rewrite is a full O(corpus) rewrite and the
per-batch cost grows linearly with corpus size (see BASELINE.md round 12
for the measured curve).

MOR makes the apply path O(batch) by construction, the same way Delta
Lake / Iceberg / Hudi merge-on-read tables do:

- **apply** appends two bounded artifacts and never reads base state:
  ``_delta/<table>/__seq=<k>/`` (the batch's new rows, partitioned by the
  table's hash bucket so probes still prune) and
  ``_tomb/<table>/__seq=<k>/`` (the batch's key ids — every pre-batch row
  of a batch key is shadowed, covering update-moves, deletes, and
  intra-batch chains without needing any before-image bucket math).
- **read** reconstructs the live view: ``base ∪ deltas`` anti-shadowed by
  tombstones — a row written at sequence ``s`` survives iff no tombstone
  for its id carries a sequence ``> s``. One narrow join against the
  (small, AQE-broadcastable) tombstone table.
- **compact** folds the live view into a fresh versioned base directory
  and commits by rewriting the single ``_mor.json`` pointer file — the
  Iceberg-style swap: a crash before the pointer write leaves the old
  view intact; after it, the superseded directories are garbage whose
  deletion is DEFERRED one full compaction cycle (recorded in the
  pointer's ``gc_deferred`` list, deleted at the start of the next
  compaction). That deferral is reader snapshot isolation: an in-flight
  probe whose plan was built just before the swap still references the
  old base and the swept delta dirs — Iceberg keeps them via snapshot
  retention; we keep them one cycle. Compaction runs automatically every
  ``compact_every`` batches (default 16), amortizing the rewrite the COW
  layout paid on every batch.
- **minor compact** (:func:`mor_minor_compact`, size-tiered): folds the
  pending deltas into ONE delta without rewriting the base — the fold
  wall of a major compaction is dominated by the corpus-sized base
  rewrite (measured flat in pending count, BASELINE.md r13), so
  ingest-dominant states run a large ``compact_every`` and bound the
  reader's delta-union width with minor folds in between. Committed via
  a ``fold`` record in ``_mor.json`` (declare-uncommitted → write →
  commit); readers ignore an uncommitted fold's dir and a committed
  fold's superseded source dirs. GC ordering is the correctness point:
  the ONLY site that deletes a fold's leftovers is the NEXT fold (or a
  major compaction), and it does so BEFORE its declare replaces the old
  record — deleting dirs the current record already makes readers ignore
  is safe in every interleaving, whereas the old declare-then-GC order
  let a double crash (fold A commits, crashes pre-GC; fold B declares,
  crashes pre-GC) resurface A's absorbed source dirs as pending and
  silently double-count. The deferral doubles as one fold cycle of
  reader snapshot isolation, mirroring the major path. At commit the
  fold also prunes ``batch_seqs`` entries its range covers: a covered
  streamed batch that still replays (marker never landed) re-allocates
  ABOVE the fold seq and its tombstones shadow the folded partial rows —
  without the prune the replay would write into a reader-ignored dir and
  be silently lost.

Exactly-once: the appliers' ``_batches/<id>`` markers still gate replay;
additionally each delta/tombstone write is keyed by the batch id and
written with overwrite, so a crash-and-replay of batch ``k`` lands
byte-equivalent state. AD-HOC applies (no batch id) have no engine
replay: one that crashes between its per-table appends leaves
table-inconsistent deltas at its seq — the recovery procedure is simply
to RE-RUN the apply, whose fresh-seq tombstones shadow every partial row
by id (pinned by test); an abandoned partial ad-hoc apply, by contrast,
stays inconsistent until the next successful apply of those keys.

Single-writer model — ENFORCED by writer-epoch fencing (not assumed):
``_mor.json`` carries a ``writer_epoch`` counter. Every apply begins by
claiming writership (:func:`mor_begin_apply` bumps the epoch) and every
mutation (:func:`mor_append`, :func:`mor_allocate_seq`,
:func:`mor_compact`'s pointer swap) re-reads the pointer file and raises
:class:`MorWriterFenced` if the epoch moved — so a second maintainer, or
an out-of-band ``mor_compact`` racing a crashed-but-unreplayed batch,
fails LOUDLY instead of silently folding partial state. Takeover
procedure: stop the old maintainer, run any wanted ``mor_compact``
(which claims writership itself), then start the new maintainer — its
first batch's claim permanently fences the old one. The check is
read-validate-write on a single small file (no CAS primitive exists on
generic Hadoop filesystems), the same best-effort class as Hadoop's
rename-based commit: it catches every writer that overlaps by more than
one pointer-file round-trip, which is the operational race that matters.
It does NOT fence two maintainers whose applies interleave at whole-batch
granularity (each re-claims the epoch per batch and never observes the
other mid-batch) — running two maintainers against one state remains an
operational error; :func:`mor_fsck` surfaces the damage it leaves.

The pointer file itself commits ATOMICALLY: ``_write_mor`` writes the
full content to ``_mor.json.tmp`` and renames it over ``_mor.json``
(never truncate-in-place, which a crash mid-write would turn into a
destroyed pointer). A crash between the delete and the rename leaves the
complete new content in the tmp; the next ``_read_mor`` finishes the
rename — equivalent to "the write succeeded, then the process crashed".

Sequence allocation is collision-free across mixed apply styles:
``_mor.json`` records a ``high_water`` sequence plus a ``batch_seqs``
map (batch id -> its allocated seq, pruned at compaction). A streamed
batch reuses its recorded seq on crash-and-replay (byte-idempotent
overwrite); an ad-hoc apply (no batch id) allocates above the high
water; a streamed batch arriving AFTER an ad-hoc apply allocates above
both instead of silently overwriting the ad-hoc delta.

Before-image note: MOR does not need before images to bound its work
(tombstones shadow by id), but the appliers still validate them for
parity with the COW contract — and the BM25 stats delta genuinely needs
``before_<text>`` to adjust ``total_tokens`` without a corpus scan.

Reference anchor: the changelog event shape this consumes restates the
reference's update/delete envelope (RdbmsChangeDataCapture.java:86-126);
the MOR layout itself is the Spark-first answer to keeping derived state
current at 100 TB.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.similarity import (
    _hadoop_read_text,
    _hadoop_write_text,
)
from siddhi_io_cdc_spark.streaming.ivf_index import (
    _fs,
    _hadoop_delete,
    _hadoop_exists,
    _hadoop_list_dirs,
)

MOR_META = "_mor.json"
SEQ_COL = "__seq"

__all__ = [
    "MorWriterFenced",
    "is_mor",
    "latest_per_key",
    "mor_allocate_seq",
    "mor_append",
    "mor_begin_apply",
    "mor_compact",
    "mor_fsck",
    "mor_init",
    "mor_live",
    "mor_minor_compact",
    "mor_pending_seqs",
    "mor_take_writer",
    "next_seq",
    "require_before_images",
]


class MorWriterFenced(RuntimeError):
    """Another writer claimed the MOR state since this writer's claim.

    Raised by the epoch check in :func:`mor_append` /
    :func:`mor_allocate_seq` / :func:`mor_compact` — the loud failure
    that replaces silent state corruption under concurrent writers. The
    fenced writer must stop; see the module docstring's takeover
    procedure."""


def _read_mor(spark, root: str) -> dict:
    final = root.rstrip("/") + "/" + MOR_META
    if not _hadoop_exists(spark, final):
        # a writer crashed between deleting the pointer and renaming its
        # fully-written replacement over it (see _write_mor): the .tmp IS
        # the committed content — finish the rename, then read. Every
        # mutation path reads the pointer first, so recovery happens
        # before any further write.
        tmp = final + ".tmp"
        if _hadoop_exists(spark, tmp):
            fs, fpath, jvm = _fs(spark, final)
            fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), fpath)
    return json.loads(_hadoop_read_text(spark, final))


def _write_mor(spark, root: str, meta: dict) -> None:
    """Atomically replace the ``_mor.json`` pointer (the commit point for
    every MOR protocol step). A bare ``fs.create(overwrite=True)`` is a
    truncate-then-write — a crash mid-write would destroy the WHOLE
    pointer, not just the in-flight commit (r13 ADVICE). Instead: write
    the full content to ``_mor.json.tmp``, delete the old pointer, rename
    the tmp over it. Crash windows: before the delete the old pointer is
    intact (the commit simply didn't happen); between delete and rename
    the tmp holds the complete new content and :func:`_read_mor` finishes
    the rename on the next read — equivalent to "the write succeeded,
    then the process crashed", an interleaving every protocol step
    already handles."""
    final = root.rstrip("/") + "/" + MOR_META
    tmp = final + ".tmp"
    text = json.dumps(meta)
    _hadoop_write_text(spark, tmp, text)
    fs, fpath, jvm = _fs(spark, final)
    tpath = jvm.org.apache.hadoop.fs.Path(tmp)
    fs.delete(fpath, False)
    if not fs.rename(tpath, fpath):
        # single-writer fencing means no second writer races this; a
        # concurrent READER may have finished the rename for us (its
        # recovery path) — accept iff the pointer now holds our content
        if (
            not _hadoop_exists(spark, final)
            or _hadoop_read_text(spark, final) != text
        ):
            raise IOError(f"failed to commit {final}")


def is_mor(spark, root: str) -> bool:
    base = root.rstrip("/") + "/" + MOR_META
    # a state whose pointer write crashed mid-commit is still a MOR state
    # (_read_mor finishes the rename)
    return _hadoop_exists(spark, base) or _hadoop_exists(spark, base + ".tmp")


def _has_parquet(spark, path: str) -> bool:
    """True if any .parquet leaf exists under ``path`` (an all-empty delta
    area would otherwise fail schema inference)."""
    fs, hpath, _ = _fs(spark, path)
    if not fs.exists(hpath):
        return False
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            return True
    return False


def mor_init(
    spark,
    root: str,
    tables: dict[str, dict],
    compact_every: int = 16,
    minor_every: int = 0,
) -> None:
    """Stamp ``root`` as a MOR state. ``tables`` maps table name ->
    ``{"id_col": ..., "part_col": ...}``; the base directory starts as the
    table name itself and moves to ``<table>__v<k>`` on compaction.

    ``compact_every`` triggers a MAJOR compaction every that many applied
    batches (counted by ``batches_since_compact``, reset at each major).
    ``minor_every`` (0 = off) additionally folds the pending deltas into
    one (:func:`mor_minor_compact`) whenever that many accumulate — the
    ingest-dominant wiring the round-13 curve recommends: a large
    ``compact_every`` (the major fold is corpus-bound) with cheap minor
    folds bounding the reader's delta union in between."""
    meta = {
        "tables": {
            t: {**spec, "base_dir": t} for t, spec in tables.items()
        },
        "compacted_through": 0,
        "base_version": 0,
        "compact_every": compact_every,
        "minor_every": minor_every,
        "batches_since_compact": 0,
        "writer_epoch": 0,
        "high_water": 0,
        "batch_seqs": {},
    }
    # a re-init starts a new lineage: drop stale deltas/tombstones and any
    # versioned base dirs a previous lineage's compaction left behind
    base = root.rstrip("/")
    _hadoop_delete(spark, base + "/_delta")
    _hadoop_delete(spark, base + "/_tomb")
    for d in _hadoop_list_dirs(spark, base):
        if any(d.startswith(t + "__v") for t in tables):
            _hadoop_delete(spark, base + "/" + d)
    _write_mor(spark, root, meta)


def _fold_drop_seqs(meta: dict) -> set[int]:
    """Sequences every reader must ignore because of the (single) minor-
    compaction fold record: an UNCOMMITTED fold's own seq (its dirs may be
    partial), a COMMITTED fold's covered seqs (their rows now live in the
    fold's dir — reading both would double-count)."""
    fold = meta.get("fold")
    if not fold:
        return set()
    if fold.get("committed"):
        return {int(s) for s in fold["covers"]}
    return {int(fold["seq"])}


def mor_pending_seqs(spark, root: str) -> list[int]:
    """Delta sequences newer than the compaction horizon, ascending —
    minus the sequences the minor-compaction fold record supersedes."""
    meta = _read_mor(spark, root)
    ct = meta["compacted_through"]
    drop = _fold_drop_seqs(meta)
    seqs: set[int] = set()
    for t in meta["tables"]:
        for d in _hadoop_list_dirs(spark, root.rstrip("/") + f"/_delta/{t}"):
            if d.startswith(SEQ_COL + "="):
                s = int(d.split("=", 1)[1])
                if s > ct and s not in drop:
                    seqs.add(s)
    return sorted(seqs)


def _seq_floor(meta: dict, pend: list[int]) -> int:
    """Highest sequence any prior apply could have used: the recorded
    high water, the compaction horizon, and (for states written before
    the high-water field existed) the directory-derived pending tail."""
    return max(
        int(meta.get("high_water", 0)),
        int(meta["compacted_through"]),
        pend[-1] if pend else 0,
    )


def next_seq(spark, root: str) -> int:
    """Read-only preview of the next ad-hoc sequence (no allocation —
    appliers go through :func:`mor_allocate_seq` / :func:`mor_begin_apply`,
    which PERSIST the allocation so concurrent styles cannot collide)."""
    meta = _read_mor(spark, root)
    return _seq_floor(meta, mor_pending_seqs(spark, root)) + 1


def _check_epoch(meta: dict, epoch: int | None, what: str) -> None:
    if epoch is not None and int(meta.get("writer_epoch", 0)) != int(epoch):
        raise MorWriterFenced(
            f"{what}: writer epoch moved {epoch} -> "
            f"{meta.get('writer_epoch', 0)} — another maintainer or an "
            "out-of-band compaction claimed this MOR state. This writer "
            "must stop (see streaming/mor.py takeover procedure)."
        )


def mor_take_writer(spark, root: str) -> int:
    """Claim writership: bump ``writer_epoch`` and return the new token.
    Every later mutation passes the token back and fails loudly if any
    other claim happened in between."""
    meta = _read_mor(spark, root)
    epoch = int(meta.get("writer_epoch", 0)) + 1
    meta["writer_epoch"] = epoch
    _write_mor(spark, root, meta)
    return epoch


def mor_allocate_seq(
    spark, root: str, batch_id: int | None = None, epoch: int | None = None
) -> int:
    """Allocate (and PERSIST) the sequence for one apply.

    - streamed apply (``batch_id`` given): crash-and-replay of the same
      batch id returns its recorded seq, so the ``__seq`` overwrite stays
      byte-idempotent; a FIRST apply allocates ``max(batch_id, floor)+1``
      — equal to ``batch_id + 1`` when no ad-hoc apply interleaved, and
      above any interleaved ad-hoc seq otherwise (the silent-overwrite
      collision the r12 review found).
    - ad-hoc apply: ``floor + 1`` where floor covers the recorded high
      water, so it never lands on a seq a streamed batch already used.
    """
    meta = _read_mor(spark, root)
    _check_epoch(meta, epoch, "mor_allocate_seq")
    floor = _seq_floor(meta, mor_pending_seqs(spark, root))
    if batch_id is not None:
        seqs = meta.setdefault("batch_seqs", {})
        key = str(int(batch_id))
        if key in seqs:
            return int(seqs[key])
        seq = max(int(batch_id), floor) + 1
        seqs[key] = seq
    else:
        seq = floor + 1
    meta["high_water"] = seq
    meta["batches_since_compact"] = int(meta.get("batches_since_compact", 0)) + 1
    _write_mor(spark, root, meta)
    return seq


def mor_begin_apply(
    spark, root: str, batch_id: int | None = None,
    expect_epoch: int | None = None,
) -> tuple[int, int]:
    """One pointer-file round-trip that starts an apply: claim writership
    (epoch bump) AND allocate the batch's sequence. Returns
    ``(seq, epoch)``; thread ``epoch`` through every append/compact of
    the apply.

    ``expect_epoch`` closes the fencing gap the per-batch epoch re-claim
    leaves open (two maintainers ALTERNATING at whole-batch granularity
    never overlap mid-batch, so per-mutation checks cannot see each
    other): a long-lived maintainer passes the epoch its PREVIOUS apply
    returned, and if any other writer claimed the state in between —
    an alternating second maintainer, an out-of-band compaction — this
    raises :class:`MorWriterFenced` before touching anything. Nothing in
    a single maintainer's own loop moves the epoch between its batches
    (auto-compactions run under the batch's token), so a mismatch always
    means a foreign writer. Pass ``None`` on the first batch after a
    (re)start, where no expectation exists. The ``foreach_batch_*``
    adapters wire this automatically."""
    meta = _read_mor(spark, root)
    if expect_epoch is not None and int(
        meta.get("writer_epoch", 0)
    ) != int(expect_epoch):
        raise MorWriterFenced(
            f"mor_begin_apply: writer epoch moved {expect_epoch} -> "
            f"{meta.get('writer_epoch', 0)} between this maintainer's "
            "batches — another maintainer or an out-of-band operation "
            "claimed this MOR state. This writer must stop (see "
            "streaming/mor.py takeover procedure)."
        )
    epoch = int(meta.get("writer_epoch", 0)) + 1
    meta["writer_epoch"] = epoch
    floor = _seq_floor(meta, mor_pending_seqs(spark, root))
    if batch_id is not None:
        seqs = meta.setdefault("batch_seqs", {})
        key = str(int(batch_id))
        if key in seqs:
            # crash-replay of a recorded batch: same seq, and NOT a new
            # batch for the compaction cadence
            seq = int(seqs[key])
            _write_mor(spark, root, meta)  # epoch bump still commits
            return seq, epoch
        seq = max(int(batch_id), floor) + 1
        seqs[key] = seq
    else:
        seq = floor + 1
    meta["high_water"] = seq
    meta["batches_since_compact"] = int(meta.get("batches_since_compact", 0)) + 1
    _write_mor(spark, root, meta)
    return seq, epoch


def mor_append(
    spark,
    root: str,
    table: str,
    rows: DataFrame,
    tomb_ids: DataFrame,
    seq: int,
    extra_json: dict | None = None,
    epoch: int | None = None,
) -> None:
    """Append one batch's rows + tombstones for ``table`` at ``seq``.

    ``rows`` must carry the table's ``part_col``; ``tomb_ids`` is the
    (deduped) id column only. Both writes overwrite their ``__seq=<k>``
    directory, so replaying a batch id is byte-idempotent. O(batch) I/O:
    nothing here reads base state. With ``epoch`` (from
    :func:`mor_begin_apply`) the append re-validates writership first
    and raises :class:`MorWriterFenced` if another writer claimed the
    state since.
    """
    meta = _read_mor(spark, root)
    _check_epoch(meta, epoch, f"mor_append({table}, seq={seq})")
    spec = meta["tables"][table]
    base = root.rstrip("/")
    dpath = base + f"/_delta/{table}/{SEQ_COL}={seq}"
    tpath = base + f"/_tomb/{table}/{SEQ_COL}={seq}"
    rows.write.mode("overwrite").partitionBy(spec["part_col"]).parquet(dpath)
    tomb_ids.select(spec["id_col"]).distinct().write.mode("overwrite").parquet(tpath)
    if extra_json:
        _hadoop_write_text(spark, dpath + "/_extra.json", json.dumps(extra_json))


def mor_extras(spark, root: str, table: str) -> list[tuple[int, dict]]:
    """``(seq, extra_json)`` for every pending delta, ascending by sequence
    (used for the BM25 incremental corpus-stats deltas — the stats cache is
    stamped with a ``through_seq`` horizon so a reader can add exactly the
    extras it hasn't absorbed, in any crash interleaving)."""
    base = root.rstrip("/")
    out = []
    for s in mor_pending_seqs(spark, root):
        p = base + f"/_delta/{table}/{SEQ_COL}={s}/_extra.json"
        if _hadoop_exists(spark, p):
            out.append((s, json.loads(_hadoop_read_text(spark, p))))
    return out


def mor_live(spark, root: str, table: str) -> DataFrame:
    """The live view of ``table``: base ∪ pending deltas, shadowed by
    tombstones. A row at sequence ``s`` survives iff no tombstone for its
    id has sequence ``> s``; base rows carry the compaction horizon as
    their sequence, so later tombstones shadow them and compaction-time
    rows never re-shadow themselves.

    Predicates on the table's ``part_col`` prune both the base partitions
    and each delta's partitions (the delta is partitioned by
    ``__seq/part_col``); the tombstone join is against a table bounded by
    the ids changed since the last compaction — small, and AQE broadcasts
    it.
    """
    meta = _read_mor(spark, root)
    spec = meta["tables"][table]
    base_dir = root.rstrip("/") + "/" + spec["base_dir"]
    ct = meta["compacted_through"]
    drop = sorted(_fold_drop_seqs(meta))
    idc = spec["id_col"]

    rows = spark.read.parquet(base_dir).withColumn(
        SEQ_COL, F.lit(ct).cast("long")
    )
    delta_root = root.rstrip("/") + f"/_delta/{table}"
    if _has_parquet(spark, delta_root):
        delta = (
            spark.read.parquet(delta_root)
            .where(F.col(SEQ_COL) > ct)
            .withColumn(SEQ_COL, F.col(SEQ_COL).cast("long"))
        )
        if drop:
            # minor-compaction fold record: skip an uncommitted fold's own
            # dir / a committed fold's superseded source dirs
            delta = delta.where(~F.col(SEQ_COL).isin(drop))
        # _extra.json sidecars are invisible to the parquet reader; column
        # order can differ between base and partition-discovered delta.
        # MOR tables are FIXED-SCHEMA: a delta whose column set drifted
        # from the base (e.g. an applier evolved its projection) must fail
        # loudly, not silently truncate the new column. Additive evolution,
        # if ever needed, belongs at compaction: fold to the new schema in
        # a fresh base version, then re-init deltas — not in the live view.
        if set(delta.columns) != set(rows.columns):
            extra = sorted(set(delta.columns) - set(rows.columns))
            missing = sorted(set(rows.columns) - set(delta.columns))
            raise ValueError(
                f"MOR table '{table}': delta schema drifted from base "
                f"(delta-only columns {extra}, base-only columns "
                f"{missing}). MOR state is fixed-schema; evolve by "
                "compacting to a new base version, not by appending "
                "mismatched deltas."
            )
        rows = rows.unionByName(delta.select(*rows.columns))

    tomb_root = root.rstrip("/") + f"/_tomb/{table}"
    if _has_parquet(spark, tomb_root):
        tomb = spark.read.parquet(tomb_root).where(F.col(SEQ_COL) > ct)
        if drop:
            tomb = tomb.where(~F.col(SEQ_COL).isin(drop))
        tmax = tomb.groupBy(idc).agg(
            F.max(SEQ_COL).cast("long").alias("__tmax")
        )
        rows = (
            rows.join(tmax, idc, "left")
            .where(F.col("__tmax").isNull() | (F.col("__tmax") <= F.col(SEQ_COL)))
            .drop("__tmax")
        )
    return rows.drop(SEQ_COL)


def mor_compact(spark, root: str, epoch: int | None = None) -> bool:
    """Fold pending deltas into fresh versioned base directories and commit
    via the ``_mor.json`` pointer swap. Returns True if anything was
    compacted. Crash-safe: before the pointer write the old view is fully
    intact (new dirs are orphans a later pass deletes); after it, new
    readers ignore the superseded dirs, whose deletion is deferred one
    compaction cycle (``gc_deferred``) so in-flight readers holding the
    pre-swap plan finish cleanly — reader snapshot isolation.

    Fencing: called without ``epoch`` (the out-of-band ops path) it
    CLAIMS writership first — a concurrently running maintainer's next
    mutation then fails loudly instead of racing the fold. With
    ``epoch`` (the maintainer's own auto-compaction) it validates the
    token, and re-validates right before the pointer swap so a takeover
    mid-fold aborts before committing."""
    if epoch is None:
        epoch = mor_take_writer(spark, root)
    meta = _read_mor(spark, root)
    _check_epoch(meta, epoch, "mor_compact")
    pend = mor_pending_seqs(spark, root)
    if not pend:
        return False
    base = root.rstrip("/")
    # delete what the PREVIOUS compaction deferred (see the gc_deferred
    # comment below) — its readers have had a full compaction cycle to
    # finish. Done BEFORE this pass writes anything: a crash mid-delete
    # leaves the list in the pointer and the retry re-deletes, so no
    # garbage is ever orphaned untracked.
    for rel in meta.get("gc_deferred", []):
        _hadoop_delete(spark, base + "/" + rel)
    new_ver = meta["base_version"] + 1
    old_dirs = []
    new_meta = json.loads(json.dumps(meta))  # deep copy
    for t, spec in meta["tables"].items():
        live = mor_live(spark, root, t)
        new_dir = f"{t}__v{new_ver}"
        # GC a stale same-name orphan from a crashed earlier attempt
        _hadoop_delete(spark, base + "/" + new_dir)
        live.write.partitionBy(spec["part_col"]).parquet(base + "/" + new_dir)
        if not _has_parquet(spark, base + "/" + new_dir):
            # the table emptied out entirely: a partitioned write of an
            # empty frame leaves no data files, and a later read would
            # fail schema inference — write one schema-bearing empty file
            # (part_col rides along as a regular column; readers only
            # filter on it)
            live.limit(0).coalesce(1).write.mode("overwrite").parquet(
                base + "/" + new_dir
            )
        old_dirs.append(spec["base_dir"])
        new_meta["tables"][t]["base_dir"] = new_dir
    new_meta["base_version"] = new_ver
    new_meta["compacted_through"] = pend[-1]
    # batch_seqs entries at or below the new horizon can never be
    # replayed into the live view again — prune so the map stays bounded
    # by compact_every
    new_meta["batch_seqs"] = {
        k: s
        for k, s in new_meta.get("batch_seqs", {}).items()
        if int(s) > pend[-1]
    }
    # a COMMITTED fold is fully absorbed by the major compaction (its dir
    # is in pend, its covered dirs sort <= the new horizon for the sweep);
    # a crashed UNCOMMITTED fold's orphan dir can sort ABOVE the new
    # horizon (its seq was allocated past the pending tail), so dropping
    # the record without deleting the dir would resurface it as pending —
    # delete it explicitly before the record goes away
    stale_fold = new_meta.pop("fold", None)
    if stale_fold and not stale_fold.get("committed"):
        for t in meta["tables"]:
            s = int(stale_fold["seq"])
            _hadoop_delete(spark, base + f"/_delta/{t}/{SEQ_COL}={s}")
            _hadoop_delete(spark, base + f"/_tomb/{t}/{SEQ_COL}={s}")
    new_meta["batches_since_compact"] = 0  # the major-compaction cadence
    # DEFERRED GC (r13 review: reader snapshot isolation). This pass's
    # garbage — the superseded base dirs plus EVERY seq dir at or below
    # the new horizon (not just the seqs pending at this pass, so dirs
    # orphaned by a crash of an earlier cycle are collected too) — is
    # recorded in the pointer and deleted by the NEXT compaction, one full
    # cycle later. An in-flight probe whose plan was built just before
    # this swap still references the old base and the swept delta dirs;
    # retaining them one cycle lets it finish instead of hitting
    # FileNotFound mid-job. New readers never see them: the old base is
    # unreferenced and the seq dirs sort <= the new horizon.
    deferred = list(old_dirs)
    for t in meta["tables"]:
        for area in ("_delta", "_tomb"):
            for d in _hadoop_list_dirs(spark, base + f"/{area}/{t}"):
                if d.startswith(SEQ_COL + "="):
                    if int(d.split("=", 1)[1]) <= pend[-1]:
                        deferred.append(f"{area}/{t}/{d}")
    new_meta["gc_deferred"] = sorted(set(deferred))
    _check_epoch(_read_mor(spark, root), epoch, "mor_compact pointer swap")
    _write_mor(spark, root, new_meta)  # commit point
    return True


def mor_minor_compact(
    spark, root: str, epoch: int | None = None, allow_drop_extras: bool = False
) -> bool:
    """Size-tiered MINOR compaction: fold every pending delta (and its
    tombstones) into ONE delta at a freshly allocated sequence — bounding
    the reader's delta-union width WITHOUT the corpus-sized base rewrite
    a major :func:`mor_compact` pays. The measured trade (BASELINE.md
    round 13): the major fold's wall is flat in pending count because it
    is dominated by the base rewrite, so ingest-dominant states want a
    large ``compact_every``; this keeps their read tax bounded in between.

    Shadow-correct by construction: within the folded range the live-view
    rule (a row at ``s`` survives unless a tombstone for its id carries a
    sequence ``> s``) is resolved eagerly, survivors land at the fold
    sequence ``f`` (> every folded seq), and the union of the range's
    tombstone ids lands at ``f`` too — it still shadows base rows
    (``ct < f``) and later deltas are untouched (their seqs are > ``f``
    only after this fold, since ``f`` is allocated above the high water
    under the writer epoch).

    Commit protocol (no pointer-file swap needed for the base): the fold
    is DECLARED uncommitted in ``_mor.json`` before any data write
    (readers ignore the fold seq), data is written, then one meta write
    flips ``committed`` (readers switch to the fold and ignore the
    covered seqs). A crash in between leaves the old view intact plus an
    ignored orphan dir that the next fold or major compaction sweeps.

    ``_extra.json`` sidecars (the BM25 stats deltas) are NOT merged by
    this generic fold — callers must absorb them into their derived cache
    first (``minor_compact_bm25_index`` does) and pass
    ``allow_drop_extras=True``; otherwise a fold over deltas carrying
    extras raises instead of silently dropping corpus-stats adjustments.
    """
    if epoch is None:
        epoch = mor_take_writer(spark, root)
    meta = _read_mor(spark, root)
    _check_epoch(meta, epoch, "mor_minor_compact")
    pend = mor_pending_seqs(spark, root)
    if len(pend) < 2:
        return False
    base = root.rstrip("/")
    if not allow_drop_extras:
        for t in meta["tables"]:
            for s in pend:
                if _hadoop_exists(
                    spark, base + f"/_delta/{t}/{SEQ_COL}={s}/_extra.json"
                ):
                    raise ValueError(
                        f"pending delta {t}/{SEQ_COL}={s} carries an "
                        "_extra.json sidecar; fold the derived cache first "
                        "(e.g. minor_compact_bm25_index) or pass "
                        "allow_drop_extras=True."
                    )
    old_fold = meta.get("fold")
    if old_fold:
        # GC the old fold record's ignored dirs BEFORE the declare replaces
        # it (r13 review: the old order — declare first, GC after — opened
        # a double-crash window: fold A commits and crashes before its GC,
        # fold B's declare then erases the record telling readers to drop
        # A's covered dirs, and a crash before B's GC loop resurfaces them
        # as pending, silently double-counting with A's fold dir that
        # already absorbed them). Deleting dirs the CURRENT record already
        # makes readers ignore — a committed fold's superseded source
        # dirs, or a crashed fold's orphan dir — is safe in every
        # interleaving: a crash mid-loop leaves the record intact and the
        # survivors still ignored. This is also where the previous fold's
        # source dirs are collected at all (the fold itself no longer GCs
        # at commit, giving in-flight readers one fold cycle of snapshot
        # isolation — see the commit point below).
        gc_seqs = (
            [int(s) for s in old_fold["covers"]]
            if old_fold.get("committed")
            else [int(old_fold["seq"])]
        )
        for t in meta["tables"]:
            for s in gc_seqs:
                _hadoop_delete(spark, base + f"/_delta/{t}/{SEQ_COL}={s}")
                _hadoop_delete(spark, base + f"/_tomb/{t}/{SEQ_COL}={s}")
    f = _seq_floor(meta, pend) + 1
    meta["high_water"] = f
    meta["fold"] = {"seq": f, "covers": pend, "committed": False}
    _write_mor(spark, root, meta)  # declare: readers ignore seq f
    for t, spec in meta["tables"].items():
        idc = spec["id_col"]
        delta_root = base + f"/_delta/{t}"
        tomb_root = base + f"/_tomb/{t}"
        surv = None
        if _has_parquet(spark, delta_root):
            rows = (
                spark.read.parquet(delta_root)
                .where(F.col(SEQ_COL).isin(pend))
                .withColumn(SEQ_COL, F.col(SEQ_COL).cast("long"))
            )
            surv = rows
            if _has_parquet(spark, tomb_root):
                tmax = (
                    spark.read.parquet(tomb_root)
                    .where(F.col(SEQ_COL).isin(pend))
                    .groupBy(idc)
                    .agg(F.max(SEQ_COL).cast("long").alias("__tmax"))
                )
                surv = (
                    rows.join(tmax, idc, "left")
                    .where(
                        F.col("__tmax").isNull()
                        | (F.col("__tmax") <= F.col(SEQ_COL))
                    )
                    .drop("__tmax")
                )
            out_cols = [c for c in rows.columns if c != SEQ_COL]
            # fold dir was GC'd above if it's a crashed attempt's name; an
            # overwrite keeps this idempotent either way
            surv.select(*out_cols).write.mode("overwrite").partitionBy(
                spec["part_col"]
            ).parquet(delta_root + f"/{SEQ_COL}={f}")
        if _has_parquet(spark, tomb_root):
            (
                spark.read.parquet(tomb_root)
                .where(F.col(SEQ_COL).isin(pend))
                .select(idc)
                .distinct()
                .write.mode("overwrite")
                .parquet(tomb_root + f"/{SEQ_COL}={f}")
            )
    cur = _read_mor(spark, root)
    _check_epoch(cur, epoch, "mor_minor_compact commit")
    cur["fold"] = {"seq": f, "covers": pend, "committed": True}
    # r13 ADVICE: a streamed batch whose seq this fold covers may still
    # REPLAY (its applier crashed before writing the _batches marker) —
    # its recorded seq now points into a reader-ignored, next-fold-swept
    # dir, so honoring the recording would silently lose the batch. Prune
    # the covered entries: the replay re-allocates ABOVE the fold seq and
    # its tombstones shadow the folded partial rows by id — the same
    # rerun-heals recovery as ad-hoc applies, and the same pruning
    # mor_compact does at the major horizon.
    covered = {int(s) for s in pend}
    cur["batch_seqs"] = {
        k: s
        for k, s in cur.get("batch_seqs", {}).items()
        if int(s) not in covered
    }
    _write_mor(spark, root, cur)  # commit point
    # NO source-dir GC here: the covered dirs stay on disk (readers ignore
    # them via the committed record) until the NEXT fold or major
    # compaction deletes them — one fold cycle of reader snapshot
    # isolation, and the reason the pre-declare GC above is the only
    # deletion site (no double-crash interleaving can resurface a dir a
    # committed fold absorbed).
    return True


def mor_fsck(spark, root: str) -> dict:
    """Offline consistency check for a MOR state root (the ops runbook's
    "did that crash leave anything behind?" tool). READ-ONLY — reports,
    never repairs. Returns ``{"errors": [...], "warnings": [...],
    "info": [...]}``; empty ``errors`` means every reader-visible
    invariant holds.

    - **errors** — reader-visible inconsistencies needing action:
      * a pending seq present for SOME tables but not others — the
        signature of an ABANDONED partial ad-hoc apply (the module
        docstring's recovery: re-run the apply; its fresh-seq tombstones
        shadow every partial row by id);
      * a ``batch_seqs`` entry pointing at or below the compaction
        horizon or into a committed fold's covered range (the replay
        would write into a reader-ignored dir — both sites prune these,
        so a surviving entry means a pre-fix state or manual edit);
      * ``high_water`` below the compaction horizon.
    - **warnings** — crash leftovers the next fold/compaction heals:
      an uncommitted fold's orphan dirs, a ``_mor.json.tmp`` orphan.
    - **info** — expected deferred-GC garbage: a committed fold's
      still-on-disk covered dirs, ``gc_deferred`` entries, ignored seq
      dirs at or below the horizon.
    """
    base = root.rstrip("/")
    out: dict[str, list[str]] = {"errors": [], "warnings": [], "info": []}
    if _hadoop_exists(spark, base + "/" + MOR_META + ".tmp"):
        out["warnings"].append(
            "_mor.json.tmp present (a pointer write crashed mid-commit; "
            "the next read finishes or discards it)"
        )
    meta = _read_mor(spark, root)
    ct = int(meta["compacted_through"])
    hw = int(meta.get("high_water", 0))
    if hw < ct:
        out["errors"].append(
            f"high_water {hw} below compaction horizon {ct} — sequence "
            "allocation could collide with compacted state"
        )
    fold = meta.get("fold")
    fold_covers = (
        {int(s) for s in fold["covers"]}
        if fold and fold.get("committed")
        else set()
    )
    # per-table seq-dir census over the delta area
    seqs_by_table: dict[str, set[int]] = {}
    for t in meta["tables"]:
        seqs_by_table[t] = {
            int(d.split("=", 1)[1])
            for d in _hadoop_list_dirs(spark, base + f"/_delta/{t}")
            if d.startswith(SEQ_COL + "=")
        }
    all_seqs = set().union(*seqs_by_table.values()) if seqs_by_table else set()
    drop = _fold_drop_seqs(meta)
    for s in sorted(all_seqs):
        holders = sorted(t for t, ss in seqs_by_table.items() if s in ss)
        if s <= ct or s in fold_covers:
            out["info"].append(
                f"seq {s} ({','.join(holders)}): ignored garbage "
                f"({'<= horizon' if s <= ct else 'covered by committed fold'}), "
                "swept by the next fold/compaction"
            )
        elif fold and not fold.get("committed") and s == int(fold["seq"]):
            out["warnings"].append(
                f"seq {s}: uncommitted fold orphan (a fold crashed between "
                "declare and commit; the next fold/compaction collects it)"
            )
        elif len(holders) < len(seqs_by_table):
            missing = sorted(set(seqs_by_table) - set(holders))
            out["errors"].append(
                f"seq {s} present for table(s) {holders} but missing for "
                f"{missing} — abandoned partial ad-hoc apply; re-run the "
                "apply to heal (fresh-seq tombstones shadow the partial rows)"
            )
    for k, s in sorted(meta.get("batch_seqs", {}).items()):
        s = int(s)
        if s <= ct or s in fold_covers:
            out["errors"].append(
                f"batch_seqs[{k}]={s} points {'at/below the horizon' if s <= ct else 'into a committed fold'} "
                "— a replay of that batch would be silently lost; prune the "
                "entry (mor_compact/mor_minor_compact do this on commit)"
            )
    for rel in meta.get("gc_deferred", []):
        if _hadoop_exists(spark, base + "/" + rel):
            out["info"].append(
                f"gc_deferred: {rel} retained for in-flight readers; the "
                "next major compaction deletes it"
            )
    return out


def maybe_autocompact(spark, root: str, epoch: int | None = None) -> bool:
    """The appliers' end-of-batch compaction hook: MAJOR every
    ``compact_every`` applied batches (counted, reset at each major —
    pending COUNT can no longer drive it because minor folds collapse
    pending to one), MINOR whenever ``minor_every`` (if set) deltas
    accumulate in between. Pre-r13 states without the counter fall back
    to the pending-count trigger they were written under."""
    meta = _read_mor(spark, root)
    every = meta.get("compact_every") or 0
    pend_n = len(mor_pending_seqs(spark, root))
    since = meta.get("batches_since_compact")
    majored = since if since is not None else pend_n
    if every and majored >= every:
        return mor_compact(spark, root, epoch=epoch)
    minor = meta.get("minor_every") or 0
    if minor and pend_n >= minor:
        return mor_minor_compact(spark, root, epoch=epoch)
    return False


def latest_per_key(
    batch_df: DataFrame, id_col: str, seq_col: str
) -> DataFrame:
    """Final state per key in a batch: latest event by ``seq_col`` wins
    (``apply_changelog`` semantics, shared by every applier)."""
    return (
        batch_df.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.col(seq_col).desc())
            ),
        )
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def require_before_images(
    batch_df: DataFrame, op_col: str, before_col: str, why: str
) -> None:
    """Fail fast when update/delete rows lack a usable before image —
    shared validation wording across the appliers."""
    movers = batch_df.where(F.col(op_col).isin("update", "delete"))
    if before_col not in batch_df.columns:
        if movers.limit(1).count():
            raise ValueError(
                f"batch contains update/delete ops but no '{before_col}' "
                f"column: {why}. Flatten the stream with the update "
                "projection."
            )
    elif movers.where(F.col(before_col).isNull()).limit(1).count():
        raise ValueError(
            f"batch contains update/delete rows with a NULL '{before_col}' "
            f"before image: {why}. Emit whole before images."
        )
