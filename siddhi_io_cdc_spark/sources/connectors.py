"""Connector configuration: URL parsing (S3-S7), Debezium config-map build,
``connector.properties`` overrides (T12), and parameter validation (T13).

Re-expresses ``util/CDCSourceUtil.java:36-278`` and the validation rules of
``CDCSource.java:784-823``. In a Spark deployment these settings configure
the EXTERNAL capture tier (Debezium Server / Kafka Connect feeding a Kafka
topic that ``readStream.format("kafka")`` consumes) or the JDBC polling
backend (``sources/jdbc.py``) — Spark itself never embeds Debezium, so the
output here is a plain config dict, not a live engine.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

#: Debezium connector classes per vendor (CDCSourceConstants.java).
CONNECTOR_CLASSES = {
    "mysql": "io.debezium.connector.mysql.MySqlConnector",
    "postgresql": "io.debezium.connector.postgresql.PostgresConnector",
    "sqlserver": "io.debezium.connector.sqlserver.SqlServerConnector",
    "oracle": "io.debezium.connector.oracle.OracleConnector",
    "mongodb": "io.debezium.connector.mongodb.MongoDbConnector",
}

ORACLE_OUTSERVER_PROPERTY = "database.out.server.name"  # CDCSourceUtil.java:160-166

_URL_PATTERNS = {
    # CDCSourceUtil.java:59 / :85 / :117 / :146 / :178 — same shapes.
    "mysql": re.compile(r"jdbc:mysql://([a-zA-Z0-9-_.]+):(\d+)/(\w*)"),
    "postgresql": re.compile(r"jdbc:postgresql://([a-zA-Z0-9-_.]+):(\d+)/(\w*)"),
    "sqlserver": re.compile(r"jdbc:sqlserver://([a-zA-Z0-9-_.]+):(\d+);databaseName=(\w*)"),
    "oracle": re.compile(r"jdbc:oracle:(\w*):@?/?/?([a-zA-Z0-9-_.]+):(\d+)(/?)([a-zA-Z0-9-_.]*)"),
    "mongodb": re.compile(r"jdbc:mongodb://(\w*|(\w*)/[a-zA-Z0-9-_.]+):(\d+)/(\w*)"),
}


class WrongConfigurationError(ValueError):
    """Mirror of the reference's WrongConfigurationException."""


@dataclass
class ConnectionConfig:
    vendor: str
    host: str
    port: int
    database: str
    replica_set: str | None = None
    driver: str | None = None  # oracle sub-driver (thin/oci)
    extras: dict = field(default_factory=dict)


def parse_connection_url(url: str) -> ConnectionConfig:
    """Parse the reference's five JDBC-style URL shapes (S3-S7)."""
    parts = url.split(":", 2)
    if len(parts) < 3 or parts[0] != "jdbc":
        raise WrongConfigurationError(f"invalid JDBC url: {url!r} (expected jdbc:<vendor>:...)")
    vendor = parts[1]
    pattern = _URL_PATTERNS.get(vendor)
    if pattern is None:
        raise WrongConfigurationError(
            f"unsupported schema {vendor!r}; expected one of {sorted(_URL_PATTERNS)}"
        )
    m = pattern.search(url)
    if not m:
        expected = {
            "mysql": "jdbc:mysql://<host>:<port>/<database>",
            "postgresql": "jdbc:postgresql://<host>:<port>/<database>",
            "sqlserver": "jdbc:sqlserver://<host>:<port>;databaseName=<database>",
            "oracle": "jdbc:oracle:<driver>:@//<host>:<port>/<sid>",
            "mongodb": "jdbc:mongodb://<replica_set>/<host>:<port>/<database>",
        }[vendor]
        raise WrongConfigurationError(f"invalid JDBC url: {url!r}; expected {expected}")
    if vendor == "oracle":
        return ConnectionConfig(vendor, m.group(2), int(m.group(3)), m.group(5), driver=m.group(1))
    if vendor == "mongodb":
        host, replica = m.group(1), m.group(2)
        if replica:
            host = host.split("/", 1)[1]
        return ConnectionConfig(vendor, host, int(m.group(3)), m.group(4), replica_set=replica or None)
    return ConnectionConfig(vendor, m.group(1), int(m.group(2)), m.group(3))


def parse_connector_properties(connector_properties: str) -> dict[str, str]:
    """``"k1=v1,k2=v2"`` → dict; malformed pair → error
    (CDCSourceUtil.java:261-278)."""
    out: dict[str, str] = {}
    if not connector_properties:
        return out
    for pair in connector_properties.split(","):
        kv = pair.split("=")
        if len(kv) != 2:
            raise WrongConfigurationError(f"connector.properties input is invalid. Check near: {pair!r}")
        out[kv[0]] = kv[1]
    return out


def resolve_config_overrides(params: dict, config_reader: dict | None = None) -> dict:
    """Deployment-config hierarchy (T12, CDCSource.java:466-502): values in
    the deployment config reader override query parameters for
    url/username/password/driver."""
    merged = dict(params)
    for key in ("url", "username", "password", "jdbc.driver.name"):
        if config_reader and config_reader.get(key):
            merged[key] = config_reader[key]
    return merged


def build_capture_config(
    url: str,
    table_name: str,
    username: str | None = None,
    password: str | None = None,
    plugin_name: str = "decoderbufs",
    connector_properties: str = "",
) -> dict:
    """Debezium-style capture config for the external listening tier.

    Mirrors ``CDCSourceUtil.getConfigMap`` (:36-259): vendor dispatch on the
    URL, include-list construction, connector class selection, and the
    ``connector.properties`` override merge applied LAST (T12 — user pairs
    win over generated values, :253-256).
    """
    cfg = parse_connection_url(url)
    props = parse_connector_properties(connector_properties)
    out: dict[str, object] = {
        "connector.class": CONNECTOR_CLASSES[cfg.vendor],
        "database.hostname": cfg.host,
        "database.port": cfg.port,
    }
    if username is not None:
        out["database.user"] = username
    if password is not None:
        out["database.password"] = password
    if cfg.vendor == "mysql":
        out["table.include.list"] = f"{cfg.database}.{table_name}"
    elif cfg.vendor == "postgresql":
        out["database.dbname"] = cfg.database
        out["table.include.list"] = table_name
        out["plugin.name"] = plugin_name
    elif cfg.vendor == "sqlserver":
        out["database.names"] = cfg.database
        out["table.include.list"] = table_name
    elif cfg.vendor == "oracle":
        if ORACLE_OUTSERVER_PROPERTY not in props:
            # CDCSourceUtil.java:160-166: XStream out-server name is required.
            raise WrongConfigurationError(
                f"required property {ORACLE_OUTSERVER_PROPERTY} is missing in connector.properties"
            )
        out["database.dbname"] = cfg.database
        out["table.include.list"] = table_name
    elif cfg.vendor == "mongodb":
        conn = f"mongodb://{cfg.host}:{cfg.port}/"
        if cfg.replica_set:
            conn += f"?replicaSet={cfg.replica_set}"
        out["mongodb.connection.string"] = conn
        out["collection.include.list"] = f"{cfg.database}.{table_name}"
        del out["database.hostname"], out["database.port"]
    out.update(props)  # user overrides win (T12)
    return out


# -- validation (T13, CDCSource.java:784-823 +
#    TestCaseOfCDCSourceValidation.java:57-425) ------------------------------

_VALID_OPS = ("insert", "update", "delete")
_CRON_FIELD = re.compile(r"^[\d*/,\-?LW#A-Za-z]+$")


def validate_cron_expression(expr: str) -> None:
    """Structural Quartz-cron check (6 or 7 fields of legal characters) —
    mirrors the validity gate at CDCSource.java:569-573."""
    fields = expr.split()
    if not (6 <= len(fields) <= 7) or not all(_CRON_FIELD.match(f) for f in fields):
        raise WrongConfigurationError(f"invalid cron expression: {expr!r}")


def validate_source_options(options: dict) -> dict:
    """Validate a full ``cdc`` source option set; returns normalized options.

    Scenario coverage (TestCaseOfCDCSourceValidation.java):
    1 missing url · 2 missing table name · 3 invalid mode · 4 invalid
    operation · 5 datasource.name in listening mode · 6 cron.expression in
    listening mode · 7 cron + wait-on-missed conflict · 8 invalid cron
    syntax · 9 negative polling interval · 10 missing polling column in
    polling mode.
    """
    opts = dict(options)
    mode = str(opts.get("mode", "listening")).lower()
    if mode not in ("listening", "polling"):
        raise WrongConfigurationError(f"unsupported mode {mode!r}; expected listening or polling")

    if not opts.get("url") and not opts.get("datasource.name") and not opts.get("path"):
        raise WrongConfigurationError("one of url / datasource.name / path is required")
    if not opts.get("table.name") and not opts.get("path"):
        raise WrongConfigurationError("table.name is required")

    ops = [o.strip().lower() for o in str(opts.get("operation", "insert")).split(",")]
    bad = [o for o in ops if o not in _VALID_OPS]
    if bad:
        # CDCSource.java:791-796.
        raise WrongConfigurationError(f"unsupported operation(s) {bad}; expected subset of {_VALID_OPS}")

    cron = opts.get("cron.expression")
    if mode == "listening":
        # CDCSource.java:784-808: polling-only params are rejected.
        if opts.get("datasource.name"):
            raise WrongConfigurationError("datasource.name is not supported in listening mode")
        if cron:
            raise WrongConfigurationError("cron.expression is not supported in listening mode")
        if opts.get("polling.column"):
            raise WrongConfigurationError("polling.column is not supported in listening mode")
    else:
        if not opts.get("polling.column"):
            raise WrongConfigurationError("polling.column is required in polling mode")
        interval = float(opts.get("polling.interval", 1))
        if interval < 0:
            raise WrongConfigurationError("polling.interval must be >= 0")
        wait = str(opts.get("wait.on.missed.record", "false")).lower() == "true"
        if cron:
            validate_cron_expression(str(cron))
            if wait:
                # CDCSource.java:804-807.
                raise WrongConfigurationError(
                    "cron.expression cannot be used with wait.on.missed.record"
                )
    opts["mode"] = mode
    opts["operation"] = ops
    return opts
