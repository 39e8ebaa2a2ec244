"""Connector URL parsing (S3-S7), config overrides (T12), validation (T13),
and the JDBC polling plan builders — mirrors CDCSourceUtil.java:36-278,
CDCSource.java:784-823, TestCaseOfCDCSourceValidation.java:57-425."""

import pytest

from siddhi_io_cdc_spark.sources.connectors import (
    WrongConfigurationError,
    build_capture_config,
    parse_connection_url,
    parse_connector_properties,
    resolve_config_overrides,
    validate_source_options,
)
from siddhi_io_cdc_spark.sources.jdbc import (
    incremental_query,
    max_offset_query,
    range_predicates,
)


# -- URL parsing (S3-S7) ----------------------------------------------------


def test_parse_mysql():
    c = parse_connection_url("jdbc:mysql://db-host.example.com:3306/shop")
    assert (c.vendor, c.host, c.port, c.database) == ("mysql", "db-host.example.com", 3306, "shop")


def test_parse_postgresql():
    c = parse_connection_url("jdbc:postgresql://pg:5432/inventory")
    assert (c.vendor, c.host, c.port, c.database) == ("postgresql", "pg", 5432, "inventory")


def test_parse_sqlserver():
    c = parse_connection_url("jdbc:sqlserver://mssql:1433;databaseName=prod")
    assert (c.vendor, c.host, c.port, c.database) == ("sqlserver", "mssql", 1433, "prod")


def test_parse_oracle():
    c = parse_connection_url("jdbc:oracle:thin:@//ora:1521/XE")
    assert (c.vendor, c.host, c.port, c.database, c.driver) == ("oracle", "ora", 1521, "XE", "thin")


def test_parse_mongodb_with_replica_set():
    c = parse_connection_url("jdbc:mongodb://rs0/mongo:27017/appdb")
    assert (c.vendor, c.host, c.port, c.database, c.replica_set) == (
        "mongodb", "mongo", 27017, "appdb", "rs0",
    )


def test_parse_bad_shape_and_unknown_vendor():
    with pytest.raises(WrongConfigurationError, match="expected jdbc:mysql"):
        parse_connection_url("jdbc:mysql://justhost/db")
    with pytest.raises(WrongConfigurationError, match="unsupported schema"):
        parse_connection_url("jdbc:db2://h:50000/x")


# -- capture config + overrides (T12) ---------------------------------------


def test_capture_config_mysql_include_list():
    cfg = build_capture_config("jdbc:mysql://h:3306/shop", "orders", "u", "p")
    assert cfg["table.include.list"] == "shop.orders"
    assert cfg["connector.class"].endswith("MySqlConnector")


def test_capture_config_oracle_requires_outserver():
    with pytest.raises(WrongConfigurationError, match="database.out.server.name"):
        build_capture_config("jdbc:oracle:thin:@//h:1521/XE", "t")
    cfg = build_capture_config(
        "jdbc:oracle:thin:@//h:1521/XE", "t",
        connector_properties="database.out.server.name=xout",
    )
    assert cfg["database.out.server.name"] == "xout"


def test_capture_config_mongodb_connection_string():
    cfg = build_capture_config("jdbc:mongodb://rs0/m:27017/appdb", "users")
    assert cfg["mongodb.connection.string"] == "mongodb://m:27017/?replicaSet=rs0"
    assert cfg["collection.include.list"] == "appdb.users"


def test_connector_properties_override_generated_values():
    # User pairs are applied LAST (CDCSourceUtil.java:253-256).
    cfg = build_capture_config(
        "jdbc:mysql://h:3306/shop", "orders",
        connector_properties="table.include.list=shop.custom,snapshot.mode=never",
    )
    assert cfg["table.include.list"] == "shop.custom"
    assert cfg["snapshot.mode"] == "never"


def test_connector_properties_malformed_pair():
    with pytest.raises(WrongConfigurationError, match="invalid"):
        parse_connector_properties("a=1,b")


def test_config_reader_overrides_params():
    merged = resolve_config_overrides(
        {"url": "jdbc:mysql://h:3306/a", "username": "u1"},
        {"url": "jdbc:mysql://other:3306/b"},
    )
    assert merged["url"] == "jdbc:mysql://other:3306/b"
    assert merged["username"] == "u1"


# -- validation (T13): the reference's 10 negative scenarios ----------------


def _polling(**kw):
    base = {"mode": "polling", "url": "jdbc:mysql://h:3306/d", "table.name": "t",
            "polling.column": "id"}
    base.update(kw)
    return base


def test_v1_missing_url():
    with pytest.raises(WrongConfigurationError, match="url"):
        validate_source_options({"mode": "listening", "table.name": "t"})


def test_v2_missing_table_name():
    with pytest.raises(WrongConfigurationError, match="table.name"):
        validate_source_options({"mode": "listening", "url": "jdbc:mysql://h:3306/d"})


def test_v3_invalid_mode():
    with pytest.raises(WrongConfigurationError, match="unsupported mode"):
        validate_source_options(_polling(mode="streaming"))


def test_v4_invalid_operation():
    with pytest.raises(WrongConfigurationError, match="operation"):
        validate_source_options(_polling(operation="insert,upsert"))


def test_v5_datasource_in_listening():
    with pytest.raises(WrongConfigurationError, match="datasource.name"):
        validate_source_options(
            {"mode": "listening", "url": "jdbc:mysql://h:3306/d", "table.name": "t",
             "datasource.name": "ds"}
        )


def test_v6_cron_in_listening():
    with pytest.raises(WrongConfigurationError, match="cron"):
        validate_source_options(
            {"mode": "listening", "url": "jdbc:mysql://h:3306/d", "table.name": "t",
             "cron.expression": "*/5 * * * * ?"}
        )


def test_v7_cron_with_wait_on_missed():
    with pytest.raises(WrongConfigurationError, match="cannot be used with"):
        validate_source_options(
            _polling(**{"cron.expression": "*/5 * * * * ?", "wait.on.missed.record": "true"})
        )


def test_v8_invalid_cron_syntax():
    with pytest.raises(WrongConfigurationError, match="invalid cron"):
        validate_source_options(_polling(**{"cron.expression": "every five seconds"}))


def test_v9_negative_polling_interval():
    with pytest.raises(WrongConfigurationError, match="polling.interval"):
        validate_source_options(_polling(**{"polling.interval": "-1"}))


def test_v10_missing_polling_column():
    opts = _polling()
    del opts["polling.column"]
    with pytest.raises(WrongConfigurationError, match="polling.column"):
        validate_source_options(opts)


def test_valid_options_normalize():
    out = validate_source_options(_polling(operation="insert , update"))
    assert out["operation"] == ["insert", "update"]


def test_polling_column_rejected_in_listening():
    with pytest.raises(WrongConfigurationError, match="polling.column"):
        validate_source_options(
            {"mode": "listening", "url": "jdbc:mysql://h:3306/d", "table.name": "t",
             "polling.column": "id"}
        )


# -- JDBC plan builders ------------------------------------------------------


def test_max_offset_query_shape():
    assert max_offset_query("shop.orders", "id") == \
        "(SELECT MAX(id) AS max_off FROM shop.orders) AS seed"


def test_incremental_query_column_pruning():
    q = incremental_query("t", "id", ["id", "name"])
    assert q == "(SELECT id, name FROM t) AS incr"


def test_range_predicates_split_and_cover():
    preds = range_predicates("id", 100, 500, num_partitions=4)
    assert preds == [
        "id > 100 AND id <= 200",
        "id > 200 AND id <= 300",
        "id > 300 AND id <= 400",
        "id > 400 AND id <= 500",
    ]


def test_range_predicates_sentinel_and_small_ranges():
    assert range_predicates("id", -1, 10, 4) == ["id <= 10"]       # unbounded low
    assert range_predicates("id", 8, 10, 4) == ["id > 8 AND id <= 10"]  # tiny span
    assert range_predicates("id", 10, 10, 4) == ["id IS NULL AND 1=0"]  # empty
    assert range_predicates("id", None, None, 4) == ["id IS NULL AND 1=0"]


def test_range_predicates_non_integer_single():
    preds = range_predicates("ts", "2024-01-01", "2024-02-01", 4)
    assert preds == ["ts > '2024-01-01' AND ts <= '2024-02-01'"]
