"""Physical-plan inspection helpers."""

from essentials_spark.plans.inspect import explain_str, count_exchanges, scan_info  # noqa: F401
