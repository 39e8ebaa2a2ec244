"""Headline relational query plans (Catalyst-native surface, SURVEY.md §2.5)."""

from siddhi_io_cdc_spark.plans.relational import (
    distinct_parts_per_flag,
    local_supplier_volume,
    nations_except,
    nations_intersect,
    order_priority_counts,
    pricing_summary,
    returnflag_rollup,
    shipping_priority,
    top_orders_per_customer,
)

__all__ = [
    "distinct_parts_per_flag",
    "local_supplier_volume",
    "nations_except",
    "nations_intersect",
    "order_priority_counts",
    "pricing_summary",
    "returnflag_rollup",
    "shipping_priority",
    "top_orders_per_customer",
]
