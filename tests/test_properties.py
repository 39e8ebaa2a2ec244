"""Property-based tests (hypothesis) for the pure offset/partition logic.

These pin the algebraic invariants the streaming source depends on:
- range_predicates exactly partitions (low, high] — every key claimed by
  exactly one predicate (verified by executing the SQL through DuckDB);
- gap admission advances to exactly the end of the contiguous run.
"""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from siddhi_io_cdc_spark.sources.jdbc import range_predicates
from siddhi_io_cdc_spark.sources.polling import CDCPollStreamReader


@given(
    low=st.integers(min_value=-1, max_value=1000),
    span=st.integers(min_value=0, max_value=500),
    n=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=60, deadline=None)
def test_range_predicates_partition_exactly(low, span, n):
    high = low + span
    preds = range_predicates("id", low, high, n)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT range AS id FROM range(%d, %d)" % (low - 2, high + 3)
    )
    total = 0
    claimed = set()
    for p in preds:
        rows = {r[0] for r in con.execute(f"SELECT id FROM t WHERE {p}").fetchall()}
        assert not (rows & claimed), "overlapping predicates"
        claimed |= rows
        total += len(rows)
    expected = {v for v in range(low - 2, high + 3) if (low == -1 or v > low) and v <= high}
    # low == -1 is the EMPTY_SENTINEL: unbounded below.
    assert claimed == expected, (preds, claimed, expected)
    con.close()


@given(
    present=st.sets(st.integers(min_value=1, max_value=60), min_size=1, max_size=40),
    last=st.integers(min_value=0, max_value=20),
)
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gap_admission_stops_at_first_gap(tmp_path_factory, present, last):
    tmp = tmp_path_factory.mktemp("gap")
    path = str(tmp / "tbl")
    os.makedirs(path)
    pq.write_table(pa.table({"id": sorted(present)}), f"{path}/p.parquet")

    reader = CDCPollStreamReader.__new__(CDCPollStreamReader)
    reader.path = path
    reader.column = "id"
    reader.wait_on_missed = True
    reader.missed_timeout = 1e9  # wait forever: admission only
    reader.max_keys_per_trigger = 1_000_000

    off = reader._advance({"last": last})
    # Expected: walk forward from `last` through consecutive present ints.
    expected = last
    while expected + 1 in present:
        expected += 1
    above = {v for v in present if v > last}
    if not above:
        assert off.get("last") == last
    else:
        assert off["last"] == expected, (sorted(present), last, off)
        if expected < max(above):
            assert off["gap_next"] == expected + 1  # held at the first gap
