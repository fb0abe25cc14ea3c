"""Inspect physical plans programmatically.

The optimization loop the brief prescribes — "explain('formatted') the
plan and iterate until it's the plan you'd want" — needs assertions,
not eyeballs: these helpers let tests pin plan properties (an exchange
count, a pushed filter, a bucketed scan) so regressions in Catalyst
interaction fail loudly.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (excludes broadcasts)."""
    plan = explain_str(df)
    return len(re.findall(r"^\(\d+\) Exchange$", plan, flags=re.M))


def scan_info(df: DataFrame) -> list[dict]:
    """Per-scan details: pushed filters, read schema, bucketing."""
    plan = explain_str(df)
    scans = []
    for block in re.split(r"\n\n", plan):
        if ") Scan " not in block:
            continue
        info = {"bucketed": "Bucketed: true" in block}
        m = re.search(r"PushedFilters: \[(.*?)\]", block)
        info["pushed_filters"] = m.group(1) if m else ""
        m = re.search(r"ReadSchema: (.*)", block)
        info["read_schema"] = m.group(1).strip() if m else ""
        scans.append(info)
    return scans
