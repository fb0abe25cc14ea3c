"""Superstep driver, checkpointing/resume, metrics, skew mitigation."""

from essentials_spark.engine.superstep import SuperstepRunner  # noqa: F401
from essentials_spark.engine.skew import salted_join  # noqa: F401
