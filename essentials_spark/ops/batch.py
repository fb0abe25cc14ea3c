"""batch: run whole algorithm instances concurrently.

Reference: include/gunrock/framework/operators/batch/batch.hxx:62-80
forks one std::thread per job (e.g. multi-source BC/PPR). Spark
analogue: concurrent actions on one SparkSession from a thread pool —
the scheduler interleaves their jobs. For vectorizable cases prefer
folding the source dimension into the DataFrame instead (multi-source
BFS carries a ``source`` column); batch_execute covers the general
case.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Sequence, TypeVar

T = TypeVar("T")


def batch_execute(jobs: Sequence[Callable[[], T]], max_workers: int = 4) -> tuple[list[T], float]:
    """Run jobs concurrently; return (results in order, elapsed_sec)."""
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = [pool.submit(j) for j in jobs]
        results = [f.result() for f in futures]
    return results, time.perf_counter() - t0
