"""JDBC mutating sink: the external-table store (Q5) against a live RDBMS.

The reference's tests mutate an ``@Store(type='rdbms')`` table
(``TestCaseOfCDCListeningMode.java:89-93``, update :275-277, delete
:179-181). Under Spark the sink side of that contract is a ``foreachBatch``
that executes keyed UPSERT/DELETE statements over JDBC. The SQL builders are
pure (vendor-dialect upserts — unit-testable without a database); the
executor wiring batches statements per partition with ``executemany``-style
addBatch, so each executor writes its partition concurrently — the same
fan-out as ``spark.write.jdbc`` but with merge semantics Spark's built-in
writer lacks (it can only append/overwrite).

Replay-idempotence: UPSERT and keyed DELETE are naturally idempotent, so a
replayed micro-batch converges to the same table state (T3's micro-batch
commit contract).
"""

from __future__ import annotations

from collections.abc import Sequence


def upsert_sql(vendor: str, table: str, columns: Sequence[str], key_cols: Sequence[str]) -> str:
    """Keyed upsert statement for the vendor dialect (placeholders: ``?``).

    mysql     → INSERT ... ON DUPLICATE KEY UPDATE
    postgresql→ INSERT ... ON CONFLICT (keys) DO UPDATE
    sqlserver/oracle/generic → ANSI MERGE
    """
    cols = list(columns)
    keys = list(key_cols)
    non_keys = [c for c in cols if c not in keys]
    collist = ", ".join(cols)
    qmarks = ", ".join("?" for _ in cols)
    v = vendor.lower()
    if v == "mysql":
        updates = ", ".join(f"{c} = VALUES({c})" for c in non_keys) or ", ".join(
            f"{k} = {k}" for k in keys
        )
        return f"INSERT INTO {table} ({collist}) VALUES ({qmarks}) ON DUPLICATE KEY UPDATE {updates}"
    if v == "postgresql":
        conflict = ", ".join(keys)
        updates = ", ".join(f"{c} = EXCLUDED.{c}" for c in non_keys)
        action = f"DO UPDATE SET {updates}" if non_keys else "DO NOTHING"
        return f"INSERT INTO {table} ({collist}) VALUES ({qmarks}) ON CONFLICT ({conflict}) {action}"
    # ANSI MERGE (sqlserver, oracle, generic)
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    src_cols = ", ".join(f"? AS {c}" for c in cols)
    updates = ", ".join(f"t.{c} = s.{c}" for c in non_keys)
    ins_cols = ", ".join(cols)
    ins_vals = ", ".join(f"s.{c}" for c in cols)
    upd = f"WHEN MATCHED THEN UPDATE SET {updates} " if non_keys else ""
    return (
        f"MERGE INTO {table} t USING (SELECT {src_cols}) s ON ({on}) "
        f"{upd}WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def delete_sql(table: str, key_cols: Sequence[str]) -> str:
    """Keyed delete (``delete T on T.k == k [and ...]``, Q4)."""
    cond = " AND ".join(f"{k} = ?" for k in key_cols)
    return f"DELETE FROM {table} WHERE {cond}"


def foreach_batch_jdbc_merge(
    connect,
    vendor: str,
    table: str,
    key: Sequence[str],
    op_col: str = "operation",
    batch_size: int = 1000,
):
    """``foreachBatch`` adapter applying flattened CDC events to an RDBMS.

    ``connect`` is a zero-arg factory returning a DB-API connection (executed
    ON THE EXECUTORS, once per partition — the Spark replacement for the
    reference's connection pool S12). Events route by ``op_col``:
    insert/update → upsert, delete → keyed delete; per-key latest-event
    reduction should be applied upstream (``apply_changelog`` semantics /
    ``latest_value``) so order within the batch is irrelevant.
    """
    keys = list(key)

    def _apply(batch_df, batch_id: int) -> None:
        data_cols = [c for c in batch_df.columns if c != op_col and not c.startswith("before_")]
        up_sql = upsert_sql(vendor, table, data_cols, keys)
        del_sql = delete_sql(table, keys)

        def write_partition(rows):
            conn = connect()
            try:
                cur = conn.cursor()
                up_buf, del_buf = [], []
                for r in rows:
                    if r[op_col] == "delete":
                        del_buf.append(tuple(r[k] for k in keys))
                    else:
                        up_buf.append(tuple(r[c] for c in data_cols))
                    if len(up_buf) >= batch_size:
                        cur.executemany(up_sql, up_buf)
                        up_buf = []
                    if len(del_buf) >= batch_size:
                        cur.executemany(del_sql, del_buf)
                        del_buf = []
                if up_buf:
                    cur.executemany(up_sql, up_buf)
                if del_buf:
                    cur.executemany(del_sql, del_buf)
                conn.commit()
            finally:
                conn.close()

        batch_df.foreachPartition(write_partition)

    return _apply
