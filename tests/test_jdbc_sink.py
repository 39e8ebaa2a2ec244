"""JDBC mutating sink (Q5): vendor upsert SQL + live merge against DuckDB as
the DB-API store (postgresql ON CONFLICT dialect)."""

import os

from siddhi_io_cdc_spark.operators.jdbc_sink import (
    delete_sql,
    foreach_batch_jdbc_merge,
    upsert_sql,
)


def test_upsert_sql_dialects():
    cols, keys = ["id", "name", "score"], ["id"]
    assert upsert_sql("mysql", "login", cols, keys) == (
        "INSERT INTO login (id, name, score) VALUES (?, ?, ?) "
        "ON DUPLICATE KEY UPDATE name = VALUES(name), score = VALUES(score)"
    )
    assert upsert_sql("postgresql", "login", cols, keys) == (
        "INSERT INTO login (id, name, score) VALUES (?, ?, ?) "
        "ON CONFLICT (id) DO UPDATE SET name = EXCLUDED.name, score = EXCLUDED.score"
    )
    merge = upsert_sql("sqlserver", "login", cols, keys)
    assert merge.startswith("MERGE INTO login t USING (SELECT ? AS id, ? AS name, ? AS score) s")
    assert "WHEN MATCHED THEN UPDATE SET t.name = s.name, t.score = s.score" in merge
    assert "WHEN NOT MATCHED THEN INSERT (id, name, score) VALUES (s.id, s.name, s.score)" in merge


def test_delete_sql_composite_key():
    assert delete_sql("login", ["id", "name"]) == "DELETE FROM login WHERE id = ? AND name = ?"


def test_foreach_batch_merge_against_duckdb(spark, tmp_path):
    import duckdb

    db = str(tmp_path / "store.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE login (id VARCHAR PRIMARY KEY, name VARCHAR)")
    con.execute("INSERT INTO login VALUES ('e1', 'old'), ('e2', 'bob')")
    con.close()

    batch = spark.createDataFrame(
        [
            ("e1", "updated", "update"),
            ("e2", None, "delete"),
            ("e3", "new", "insert"),
        ],
        "id string, name string, operation string",
    ).coalesce(1)  # single writer for the file-backed test store

    apply_fn = foreach_batch_jdbc_merge(
        connect=lambda: duckdb.connect(db), vendor="postgresql", table="login", key=["id"]
    )
    apply_fn(batch, 0)
    # Idempotence: replaying the same batch converges to the same state.
    apply_fn(batch, 0)

    con = duckdb.connect(db)
    rows = dict(con.execute("SELECT id, name FROM login ORDER BY id").fetchall())
    con.close()
    assert rows == {"e1": "updated", "e3": "new"}
