"""Shared data-quality validation rules.

The batch (graph_quarantine_split) and streaming
(stream_quarantine_routing) quarantine topologies are documented as
siblings — their routing must stay in lockstep, so the rule chain
lives HERE once: first failing rule wins, reasons are stable strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The event-type enum both quarantine keys enforce.
OK_EVENT_TYPES = ["view", "purchase", "error", "click", "signup"]


def event_reject_reason(
    value_lo: float,
    value_hi: float = 1_000_000.0,
    check_user: bool = False,
) -> Column:
    """First-failing-rule reject reason for an events-shaped row
    (NULL when the row is clean): optional null-user gate, null
    value, [value_lo, value_hi] range, event-type enum membership.
    Keep rule ORDER stable — downstream counts group by reason."""
    chain = F.when(F.lit(False), F.lit(None).cast("string"))
    if check_user:
        chain = chain.when(F.col("user_id").isNull(), "null_user")
    return (
        chain.when(F.col("value").isNull(), "null_value")
        .when(
            (F.col("value") < value_lo) | (F.col("value") > value_hi),
            "value_range",
        )
        .when(~F.col("event_type").isin(OK_EVENT_TYPES), "unknown_type")
    )
