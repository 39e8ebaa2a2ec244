"""siddhi_io_cdc_spark — a PySpark-native change-data-capture engine.

A from-scratch re-expression of the capabilities of siddhi-io/siddhi-io-cdc
(reference: /root/reference, v2.1.2-SNAPSHOT) on Apache Spark:

- ``sources``    — the ``cdc-poll`` micro-batch streaming source (polling mode,
                   reference ``source/polling/CDCPoller.java``) and the Debezium
                   envelope reader (listening mode, reference
                   ``source/listening/ChangeDataCapture.java``).
- ``operators``  — event-shaping (op filter, before_/after flattening, type
                   defaults; reference ``listening/RdbmsChangeDataCapture.java``)
                   and mutating-sink helpers (insert/update/delete-on-table).
- ``functions``  — large-scale training-data pipeline operators: dedup
                   (exact/MinHash-LSH/SimHash/n-gram-Jaccard), similarity search,
                   text analysis, multimodal column plumbing.
- ``streaming``  — triggers, metrics listener, checkpoint/resume conventions.
- ``plans``      — headline relational queries exercising the Catalyst-native
                   query surface (SURVEY.md §2.5).

Everything is declarative DataFrame/SQL first; Python UDFs appear only where
Spark built-ins genuinely cannot express the semantics, and then only as
Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"


def register_cdc_poll(spark) -> None:
    """Register the ``cdc-poll`` streaming DataSource on ``spark``.

    Root-level convenience re-export of
    :func:`siddhi_io_cdc_spark.sources.polling.register_cdc_poll` — lazy so
    that importing the package never pays for (or requires) the polling
    module's pyarrow machinery.
    """
    from siddhi_io_cdc_spark.sources.polling import register_cdc_poll as _reg

    _reg(spark)
