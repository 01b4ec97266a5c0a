"""Physical-plan inspection helpers.

``plan_of`` captures ``explain("formatted")`` text; the predicates below
encode the plan properties that matter at 100 TB: did the dim broadcast,
did the filter reach the scan, how many shuffles, did top-k avoid a
global sort, how narrow is the scan schema.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_of(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_nodes(plan: str, op: str) -> int:
    """Count physical operators by their detail header ``(N) Op`` —
    formatted explain prints every node twice (tree + detail section)."""
    return len(re.findall(rf"^\(\d+\) {op}\b", plan, flags=re.MULTILINE))


def n_broadcast_joins(plan: str) -> int:
    return _n_nodes(plan, "BroadcastHashJoin")


def n_sortmerge_joins(plan: str) -> int:
    return _n_nodes(plan, "SortMergeJoin")


def n_shuffles(plan: str) -> int:
    """Data shuffles (Exchange) excluding broadcast exchanges."""
    return _n_nodes(plan, "Exchange") - _n_nodes(plan, "BroadcastExchange")


def has_take_ordered(plan: str) -> bool:
    """Top-k executed as per-partition heap + driver merge, not a global
    sort-then-limit."""
    return "TakeOrderedAndProject" in plan


def pushed_filters(plan: str) -> list[str]:
    """All non-empty PushedFilters entries on parquet scans."""
    return [
        line.strip()
        for line in plan.splitlines()
        if "PushedFilters" in line and "[]" not in line
    ]


def read_schemas(plan: str) -> list[str]:
    """ReadSchema entries — shows column pruning reached the scan."""
    return [line.strip() for line in plan.splitlines() if "ReadSchema" in line]


def scan_columns(plan: str) -> list[set[str]]:
    """Column-name sets per parquet scan (pruning check)."""
    out = []
    for line in read_schemas(plan):
        m = re.search(r"struct<(.*)>", line)
        if m:
            out.append(
                {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
            )
    return out
