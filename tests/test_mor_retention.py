"""Round-15 MOR refinements: configurable reader snapshot retention
(``retain_cycles``), generational GC aged by BOTH major compactions and
minor folds, the explicit :func:`mor_gc` reclaim for idle states, and
``mor_fsck``'s widened census (per-seq delta/tomb pairing) plus its
``repair=True`` mode for the mechanically-safe recoveries.

These close the r14 review's three operational refinements: reader
retention was exactly one cycle (a probe slower than a full cycle hit
FileNotFound), ``gc_deferred`` was swept only by the next MAJOR
compaction (minor-only cadences accumulated a cycle of garbage
indefinitely, and idle states kept it forever), and fsck censused only
the delta area (a crash inside ``mor_append`` between its rows write
and its tombstone write reported clean while the live view served
duplicate rows).
"""

import json
import os

from siddhi_io_cdc_spark.streaming.mor import (
    _read_mor,
    _write_mor,
    mor_begin_apply,
    mor_append,
    mor_compact,
    mor_fsck,
    mor_gc,
    mor_init,
    mor_live,
    mor_minor_compact,
    mor_pending_seqs,
)


def _rows(spark, items):
    return spark.createDataFrame(items, "id LONG, b INT, v STRING")


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id LONG")


def _state(spark, tmp_path, name="plain", **kw):
    root = str(tmp_path / name)
    spark.createDataFrame(
        [(i, i % 4, f"v{i}") for i in range(8)], "id LONG, b INT, v STRING"
    ).write.partitionBy("b").parquet(root + "/t")
    mor_init(spark, root, {"t": {"id_col": "id", "part_col": "b"}}, **kw)
    return root


def _apply(spark, root, batch_id, row):
    seq, epoch = mor_begin_apply(spark, root, batch_id=batch_id)
    mor_append(spark, root, "t", _rows(spark, [row]),
               _ids(spark, [row[0]]), seq, epoch=epoch)
    return seq


def _live(spark, root):
    return {(r.id, r.v) for r in mor_live(spark, root, "t").collect()}


# ----------------------------------------------------- retention depth


def test_retention_two_reader_plan_built_two_compactions_ago_executes(
    spark, tmp_path
):
    """VERDICT r14 ask #4's Done criterion: with ``retain_cycles=2`` a
    reader plan built TWO major compactions ago still executes (its dirs
    survive two cycles), and dies only after the third."""
    root = _state(spark, tmp_path, retain_cycles=2)
    _apply(spark, root, 0, (100, 0, "x"))
    plan = mor_live(spark, root, "t")  # bound to base v0 + seq-1 delta
    expect = {(r.id, r.v) for r in plan.collect()}
    assert mor_compact(spark, root)  # cycle 1: dirs become a generation
    _apply(spark, root, 1, (101, 1, "y"))
    assert mor_compact(spark, root)  # cycle 2: generation RETAINED
    assert {(r.id, r.v) for r in plan.collect()} == expect
    _apply(spark, root, 2, (102, 2, "z"))
    assert mor_compact(spark, root)  # cycle 3: generation aged out
    assert not os.path.exists(os.path.join(root, "t"))  # original base gone
    # new readers were never affected
    assert _live(spark, root) == expect | {(101, "y"), (102, "z")}


def test_retention_default_one_matches_r14_behavior(spark, tmp_path):
    """``retain_cycles`` defaults to 1: the superseded dirs survive
    exactly one cycle — the r14 contract, unchanged."""
    root = _state(spark, tmp_path)
    _apply(spark, root, 0, (100, 0, "x"))
    assert mor_compact(spark, root)
    assert os.path.exists(os.path.join(root, "t"))
    _apply(spark, root, 1, (101, 1, "y"))
    assert mor_compact(spark, root)
    assert not os.path.exists(os.path.join(root, "t"))


def test_retention_two_across_minor_folds(spark, tmp_path):
    """Minor-path retention: with ``retain_cycles=2`` a committed fold's
    covered source dirs survive the NEXT fold (reader-ignored via the gc
    generation list, which is how the r13 double-crash resurfacing stays
    impossible) and are deleted by the one after."""
    root = _state(spark, tmp_path, name="minor", retain_cycles=2)
    _apply(spark, root, 0, (100, 0, "x"))
    _apply(spark, root, 1, (101, 1, "y"))
    pre_fold = mor_live(spark, root, "t")
    expect = {(r.id, r.v) for r in pre_fold.collect()}
    assert mor_minor_compact(spark, root)  # fold A covers seqs 1,2
    d1 = os.path.join(root, "_delta", "t", "__seq=1")
    assert os.path.exists(d1)
    _apply(spark, root, 2, (102, 2, "z"))
    _apply(spark, root, 3, (103, 3, "w"))
    assert mor_minor_compact(spark, root)  # fold B: A's covers RETAINED
    assert os.path.exists(d1)
    # the retained dirs are ignored by new readers (no double count)...
    assert _live(spark, root) == expect | {(102, "z"), (103, "w")}
    # ...and the pre-fold-A plan still executes
    assert {(r.id, r.v) for r in pre_fold.collect()} == expect
    _apply(spark, root, 4, (104, 0, "q"))
    _apply(spark, root, 5, (105, 1, "r"))
    assert mor_minor_compact(spark, root)  # fold C ages A's generation out
    assert not os.path.exists(d1)
    assert _live(spark, root) == expect | {
        (102, "z"), (103, "w"), (104, "q"), (105, "r")
    }


# ------------------------------------------ gc aging under minor cadence


def test_minor_folds_sweep_prior_major_garbage(spark, tmp_path):
    """VERDICT r14 ask #6: a major-starved cadence (minor folds only after
    one major) must still reclaim the major's deferred garbage — minor
    folds age the SAME generation list."""
    root = _state(spark, tmp_path, name="starved")
    _apply(spark, root, 0, (100, 0, "x"))
    assert mor_compact(spark, root)  # defers old base "t" + seq dirs
    old_base = os.path.join(root, "t")
    assert os.path.exists(old_base)
    _apply(spark, root, 1, (101, 1, "y"))
    _apply(spark, root, 2, (102, 2, "z"))
    assert mor_minor_compact(spark, root)  # the FOLD sweeps the major's gen
    assert not os.path.exists(old_base)
    assert _live(spark, root) == {(100, "x"), (101, "y"), (102, "z")} | {
        (i, f"v{i}") for i in range(8)
    }


def test_mor_gc_reclaims_idle_state(spark, tmp_path):
    """r14 ADVICE: a state idle after its last compaction retains the
    superseded full-corpus base indefinitely; the explicit mor_gc pass
    reclaims it (with the documented no-in-flight-readers caveat)."""
    root = _state(spark, tmp_path, name="idle")
    _apply(spark, root, 0, (100, 0, "x"))
    assert mor_compact(spark, root)
    old_base = os.path.join(root, "t")
    old_delta = os.path.join(root, "_delta", "t", "__seq=1")
    assert os.path.exists(old_base) and os.path.exists(old_delta)
    before = _live(spark, root)
    assert mor_gc(spark, root) > 0
    assert not os.path.exists(old_base) and not os.path.exists(old_delta)
    assert _read_mor(spark, root)["gc"] == []
    assert _live(spark, root) == before  # readers unaffected
    assert mor_gc(spark, root) == 0  # idempotent


def test_legacy_gc_deferred_pointer_upgrades_in_place(spark, tmp_path):
    """A pre-r15 pointer carries a flat ``gc_deferred`` list; the next
    compaction treats it as one generation (sweeps it under the default
    retention) and rewrites the pointer in the generational form."""
    root = _state(spark, tmp_path, name="legacy")
    _apply(spark, root, 0, (100, 0, "x"))
    assert mor_compact(spark, root)
    meta = _read_mor(spark, root)
    gen = [rel for g in meta["gc"] for rel in g]
    meta["gc_deferred"] = gen  # downgrade to the r14 shape
    del meta["gc"]
    _write_mor(spark, root, meta)
    _apply(spark, root, 1, (101, 1, "y"))
    assert mor_compact(spark, root)
    assert not os.path.exists(os.path.join(root, "t"))  # legacy gen swept
    meta = _read_mor(spark, root)
    assert "gc_deferred" not in meta and len(meta["gc"]) == 1
    assert _live(spark, root) >= {(100, "x"), (101, "y")}


# --------------------------------------------------------- fsck census


def test_fsck_flags_half_append_delta_without_tomb(spark, tmp_path):
    """r14 ADVICE (medium): a crash inside mor_append between the rows
    write and the tombstone write leaves a LIVE delta dir with no
    matching tomb dir — the old delta-only census reported clean while
    the live view double-served the batch's updated ids."""
    root = _state(spark, tmp_path, name="half")
    seq, epoch = mor_begin_apply(spark, root, batch_id=0)
    # simulate the mid-append crash: rows land, tombstones never do
    _rows(spark, [(0, 0, "updated")]).write.partitionBy("b").parquet(
        os.path.join(root, "_delta", "t", f"__seq={seq}")
    )
    rep = mor_fsck(spark, root)
    assert any("_tomb dir missing" in e for e in rep["errors"])
    # the reverse orientation (tomb without delta — manual damage) too
    root2 = _state(spark, tmp_path, name="half2")
    seq2, _ = mor_begin_apply(spark, root2, batch_id=0)
    _ids(spark, [0]).write.parquet(
        os.path.join(root2, "_tomb", "t", f"__seq={seq2}")
    )
    rep2 = mor_fsck(spark, root2)
    assert any("_delta dir missing" in e for e in rep2["errors"])


def test_fsck_repair_cleans_corrupted_root_and_preserves_view(
    spark, tmp_path
):
    """VERDICT r14 ask #5's Done criterion: fsck a synthetically
    corrupted root, repair, re-fsck CLEAN (errors, warnings AND info all
    empty), and the live view equals the pre-corruption truth."""
    root = _state(spark, tmp_path, name="repairme")
    _apply(spark, root, 0, (100, 0, "x"))
    assert mor_compact(spark, root)  # leaves a retained generation
    _apply(spark, root, 1, (101, 1, "y"))
    truth = _live(spark, root)
    meta = _read_mor(spark, root)
    # corrupt: uncommitted fold orphan + stale batch_seqs + stale tmp
    orphan = int(meta["high_water"]) + 1
    meta["fold"] = {"seq": orphan, "covers": [2], "committed": False}
    meta["batch_seqs"]["99"] = 1  # at/below the horizon (ct=1)
    _write_mor(spark, root, meta)
    _rows(spark, [(999, 0, "partial")]).write.partitionBy("b").parquet(
        os.path.join(root, "_delta", "t", f"__seq={orphan}")
    )
    with open(os.path.join(root, "_mor.json.tmp"), "w") as f:
        f.write("{}")
    rep = mor_fsck(spark, root)
    assert rep["errors"] and rep["warnings"] and rep["info"]
    assert _live(spark, root) == truth  # corruption was reader-invisible
    fixed = mor_fsck(spark, root, repair=True)
    assert fixed["repaired"]
    assert fixed["errors"] == [] and fixed["warnings"] == []
    assert fixed["info"] == []  # even the retained garbage is reclaimed
    again = mor_fsck(spark, root)
    assert again["errors"] == [] and again["warnings"] == []
    assert again["info"] == [] and again["repaired"] == []
    assert _live(spark, root) == truth
    # the state still works: apply + compact + serve
    _apply(spark, root, 7, (102, 2, "z"))
    assert mor_compact(spark, root)
    assert _live(spark, root) == truth | {(102, "z")}


def test_fsck_repair_leaves_partial_adhoc_apply_to_rerun(spark, tmp_path):
    """The judgment-call case stays manual: an abandoned partial ad-hoc
    apply (seq present for one table, missing for the other) is NOT
    auto-deleted — the heal is to RE-RUN the apply with the original
    batch, which fsck cannot reconstruct."""
    root = str(tmp_path / "two")
    for t in ("a", "b"):
        spark.createDataFrame(
            [(i, i % 2, f"{t}{i}") for i in range(4)],
            "id LONG, b INT, v STRING",
        ).write.partitionBy("b").parquet(f"{root}/{t}")
    mor_init(spark, root, {
        "a": {"id_col": "id", "part_col": "b"},
        "b": {"id_col": "id", "part_col": "b"},
    })
    seq, epoch = mor_begin_apply(spark, root)
    mor_append(spark, root, "a", _rows(spark, [(10, 0, "n")]),
               _ids(spark, [10]), seq, epoch=epoch)  # crash before table b
    rep = mor_fsck(spark, root, repair=True)
    assert any("abandoned partial ad-hoc apply" in e for e in rep["errors"])
    assert os.path.exists(os.path.join(root, "_delta", "a", f"__seq={seq}"))
    # the documented recovery really heals: re-run BOTH tables' appends
    seq2, epoch2 = mor_begin_apply(spark, root)
    mor_append(spark, root, "a", _rows(spark, [(10, 0, "n")]),
               _ids(spark, [10]), seq2, epoch=epoch2)
    mor_append(spark, root, "b", _rows(spark, [(10, 0, "n")]),
               _ids(spark, [10]), seq2, epoch=epoch2)
    assert {(r.id, r.v) for r in mor_live(spark, root, "a").collect()} == {
        (0, "a0"), (1, "a1"), (2, "a2"), (3, "a3"), (10, "n")
    }


def test_fsck_repair_noop_on_clean_state(spark, tmp_path):
    root = _state(spark, tmp_path, name="clean")
    _apply(spark, root, 0, (100, 0, "x"))
    epoch_before = _read_mor(spark, root)["writer_epoch"]
    rep = mor_fsck(spark, root, repair=True)
    assert rep == {"errors": [], "warnings": [], "info": [], "repaired": []}
    # nothing actionable -> repair takes no writership, mutates nothing
    assert _read_mor(spark, root)["writer_epoch"] == epoch_before


def test_fsck_read_only_without_repair(spark, tmp_path):
    """Plain fsck stays strictly read-only even on a dirty root."""
    root = _state(spark, tmp_path, name="ro")
    _apply(spark, root, 0, (100, 0, "x"))
    assert mor_compact(spark, root)
    before = json.dumps(_read_mor(spark, root), sort_keys=True)
    rep = mor_fsck(spark, root)
    assert rep["info"]  # the retained generation is visible
    assert json.dumps(_read_mor(spark, root), sort_keys=True) == before
    assert os.path.exists(os.path.join(root, "t"))  # nothing deleted
