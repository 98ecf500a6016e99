"""Capture and summarize Spark physical plans as strings."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

#: Plan markers of interest → human label.
_MARKERS = {
    "PushedFilters: \\[(?!\\])": "parquet filter pushdown",
    "BroadcastHashJoin": "broadcast hash join",
    "BroadcastNestedLoopJoin": "broadcast nested-loop join",
    "SortMergeJoin": "sort-merge join",
    "TakeOrderedAndProject": "top-N without global sort",
    "HashAggregate": "hash aggregate (map-side partials)",
    "Exchange hashpartitioning": "hash shuffle",
    "MapInPandas": "Arrow pandas exchange",
    "ArrowEvalPython": "Arrow pandas UDF",
    "BatchEvalPythonUDTF": "Python UDTF",
}


def plan_of(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (mode: simple|formatted|codegen|
    extended|cost)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_report(df: DataFrame) -> str:
    """One-line-per-property summary: which scale-relevant plan
    features are present, plus the shuffle count."""
    plan = plan_of(df, "formatted")
    lines = []
    for pattern, label in _MARKERS.items():
        hits = len(re.findall(pattern, plan))
        if hits:
            lines.append(f"{label}: {hits}")
    # row-Python is a defect, flag loudly
    if re.search(r"BatchEvalPython(?!UDTF)", plan):
        lines.append("!! row-at-a-time Python UDF present")
    return "\n".join(lines) or "(no notable markers)"
