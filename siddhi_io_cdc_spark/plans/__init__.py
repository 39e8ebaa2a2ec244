"""Headline relational query plans (Catalyst-native surface, SURVEY.md §2.5)."""

from siddhi_io_cdc_spark.plans.rollup import incremental_rollup, rollup_single_pass
from siddhi_io_cdc_spark.plans.relational import (
    customer_order_distribution,
    customers_without_orders,
    distinct_parts_per_flag,
    local_supplier_volume,
    nations_except,
    nations_intersect,
    order_priority_counts,
    pricing_summary,
    returnflag_rollup,
    shipping_priority,
    small_quantity_revenue,
    top_orders_per_customer,
)

__all__ = [
    "customer_order_distribution",
    "incremental_rollup",
    "rollup_single_pass",
    "customers_without_orders",
    "distinct_parts_per_flag",
    "local_supplier_volume",
    "nations_except",
    "nations_intersect",
    "order_priority_counts",
    "pricing_summary",
    "returnflag_rollup",
    "shipping_priority",
    "small_quantity_revenue",
    "top_orders_per_customer",
]
