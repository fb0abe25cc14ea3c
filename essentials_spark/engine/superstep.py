"""Bulk-synchronous superstep driver.

The Spark-native enactor (reference include/gunrock/framework/
enactor.hxx:243-254):

    prepare_frontier(); while (!is_converged()) { loop(); ++iteration; }
    finalize();

becomes a driver-side Python loop where each superstep is one Spark
job and convergence is a tiny aggregate collect. This module owns the
three concerns GPU loops never face but 10^12-edge iteration chains
must (SURVEY.md §7.3):

1. **lineage truncation** — iterative DataFrames grow an unbounded
   plan; every ``checkpoint_every`` iterations the state is written to
   parquet (Iceberg on a real cluster) and re-read, otherwise
   ``localCheckpoint`` truncates in memory;
2. **resumability** — durable checkpoints are tagged with the
   iteration number; ``latest()`` restores the newest one so a killed
   run restarts mid-loop and reproduces identical output;
3. **metrics/lineage logging** — per-iteration rows (iteration,
   frontier size / delta, wall-clock, edges processed, per-partition
   row counts) appended to a metrics table.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
from contextlib import contextmanager
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --- scoped AQE suppression for superstep loops ---------------------
# AQE re-optimizes the remaining plan at every shuffle/broadcast stage
# boundary. A fused superstep block is a DEEP plan with many tiny
# exchanges, every join already explicitly hinted from KNOWN row
# counts (hint_state_join) against bucketed static layouts — there is
# nothing left for AQE to decide, but its per-stage replanning is
# driver CPU paid once per exchange per superstep. Measured (round 7,
# sf0.1, local[32], bench_extra.py isolate): pagerank 13.6 s -> 6.5 s
# (94 -> 25 Spark jobs), cc 11.2 -> 7.3 s (142 -> 59 jobs) with AQE
# off; one-shot join pipelines (triangle_count) run ~2x FASTER with
# AQE on (runtime broadcast conversion), so the suppression is scoped
# to the iterative loops only, never session-global. The cost is
# plan-depth-driven, not data-driven, so the win holds at any scale;
# set SPARK_GRAFT_SUPERSTEP_AQE=1 to keep AQE on inside loops (e.g.
# to let AQE skew-split an unhinted state join on a new cluster).
_AQE_LOCK = threading.Lock()
_AQE_STATE: dict[int, list] = {}  # id(session) -> [depth, saved_value]


@contextmanager
def superstep_conf(spark: SparkSession, work_rows: int | None = None):
    """Disable AQE for the duration of a superstep loop (reentrant,
    thread-safe, restores the previous value on exit).

    ``work_rows``: the loop's per-superstep edge-scale row bound (the
    edge count). The suppression is SIZE-GATED: it only fires when
    every exchange a superstep can issue is broadcast-scale
    (work_rows <= 4 x STATE_BROADCAST_MAX_ROWS, the same mass bound
    the shape ladders use) — there AQE's per-stage replanning is pure
    driver overhead (measured 2.1x on pagerank at sf0.1) while any
    skew straggler it could fix is bounded by broadcast-scale work.
    Above the bound AQE stays on: its runtime skew-split of hub-rooted
    joins is a real win (measured: CC at 3.3M vertices runs 26 s with
    AQE vs 40 s without). Env knobs: SPARK_GRAFT_SUPERSTEP_AQE=1
    never suppresses; SPARK_GRAFT_SUPERSTEP_AQE_MAX_ROWS overrides the
    bound (0 never suppresses, for cluster A/B)."""
    if os.environ.get("SPARK_GRAFT_SUPERSTEP_AQE") == "1":
        yield
        return
    from essentials_spark.engine.static_table import STATE_BROADCAST_MAX_ROWS

    bound = int(
        os.environ.get(
            "SPARK_GRAFT_SUPERSTEP_AQE_MAX_ROWS", 4 * STATE_BROADCAST_MAX_ROWS
        )
    )
    if work_rows is not None and work_rows > bound:
        yield
        return
    # With AQE suppressed nothing coalesces post-shuffle partitions, so
    # every tiny superstep stage schedules shuffle.partitions tasks and
    # the serial broadcast-job chain pays ~100 task launches per job
    # (profiled round 7: pagerank spent 7.8 of 8.7 s inside broadcast
    # jobs at sf0.1). Derive the partition count from the KNOWN work
    # size instead — the deterministic stand-in for AQE's coalescing
    # (guide §2.2), scale-symmetric: above the row bound AQE stays on
    # and coalesces adaptively; below it we coalesce by known size.
    rows_per_part = int(
        os.environ.get("SPARK_GRAFT_SUPERSTEP_ROWS_PER_PARTITION", 65536)
    )
    parallelism = spark.sparkContext.defaultParallelism
    n_parts = max(1, min(parallelism, (work_rows or bound) // rows_per_part + 1))
    key = id(spark)
    with _AQE_LOCK:
        st = _AQE_STATE.get(key)
        if st is None:
            saved = {
                "spark.sql.adaptive.enabled": spark.conf.get(
                    "spark.sql.adaptive.enabled", "true"
                ),
                "spark.sql.shuffle.partitions": spark.conf.get(
                    "spark.sql.shuffle.partitions", str(parallelism)
                ),
            }
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
            st = _AQE_STATE[key] = [0, saved]
        st[0] += 1
    try:
        yield
    finally:
        with _AQE_LOCK:
            st = _AQE_STATE.get(key)
            if st is not None:
                st[0] -= 1
                if st[0] <= 0:
                    try:
                        for k, v in st[1].items():
                            spark.conf.set(k, v)
                    finally:
                        del _AQE_STATE[key]


def superstep_fast_regime(work_rows: int | None) -> bool:
    """True when a loop over ``work_rows`` edge-scale rows runs in the
    suppressed-AQE fast regime (same gate as :func:`superstep_conf`):
    fixed per-job driver latency dominates there, so loops may trade
    plan fusion for fewer serial (broadcast) jobs per superstep."""
    if os.environ.get("SPARK_GRAFT_SUPERSTEP_AQE") == "1":
        return False
    from essentials_spark.engine.static_table import STATE_BROADCAST_MAX_ROWS

    bound = int(
        os.environ.get(
            "SPARK_GRAFT_SUPERSTEP_AQE_MAX_ROWS", 4 * STATE_BROADCAST_MAX_ROWS
        )
    )
    return work_rows is not None and work_rows <= bound


def truncate_plan(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint + reset carried-over statistics.

    ``Dataset.localCheckpoint`` truncates lineage but PRESERVES the
    checkpointed plan's estimated statistics on the new LogicalRDD
    leaf. In a superstep loop where the next state joins two
    descendants of the previous state (e.g. CC's hash-min + pointer
    jump), the carried sizeInBytes estimate squares every iteration;
    after ~25 supersteps Catalyst's BigInt stats arithmetic itself
    becomes the bottleneck (observed: minutes of driver CPU inside
    SizeInBytesOnlyStatsPlanVisitor per superstep). Rebuilding the
    DataFrame over the already-materialized InternalRow RDD resets the
    leaf stats to defaults with no extra computation or serde.
    """
    spark = df.sparkSession
    ckpt = df.localCheckpoint(eager=eager)
    try:
        jdf = ckpt._jdf
        fresh = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(fresh, ckpt.sparkSession)
    except Exception:
        # fall back to the plain checkpoint if the internal API moves
        return ckpt


def edge_fingerprint(edges: DataFrame, cols: tuple[str, str] = ("src", "dst")) -> str:
    """Content fingerprint of an edge table for resume validation:
    row count + the sum of xxhash64(src, dst) over all rows. One
    map-side-partial aggregate (same cost class as a bare count), but
    unlike a count it distinguishes two different edge sets with equal
    cardinality — a same-n different-edge-set rerun against a reused
    checkpoint_dir must refuse the stale state, not resume it."""
    row = edges.select(
        F.count(F.lit(1)).alias("m"),
        # bit_xor, not sum: xxhash64 values overflow a long sum under
        # ANSI arithmetic; xor is closed over int64
        F.bit_xor(F.xxhash64(*cols)).alias("h"),
    ).collect()[0]
    return f"m={row['m']}:h={row['h']}"


class SuperstepRunner:
    """State manager for one algorithm run."""

    def __init__(
        self,
        spark: SparkSession,
        name: str = "run",
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 5,
        log_partition_lineage: bool = False,
        fingerprint: str | None = None,
    ) -> None:
        self.spark = spark
        self.name = name
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = max(1, checkpoint_every)
        self.log_partition_lineage = log_partition_lineage
        # input/params fingerprint: stamped into every durable
        # checkpoint's _meta.json and REQUIRED to match on resume —
        # rerunning with the same checkpoint_dir/name but a different
        # graph or parameters must not silently restore stale state
        self.fingerprint = fingerprint
        self.metrics: list[dict[str, Any]] = []
        self._persisted: list[DataFrame] = []
        self._cleanups: list = []
        self._last_durable_iter = -1
        self._since_gc = 0
        self.gc_every = 8
        # truncate lineage every iteration by default: plain persist
        # between truncations measured slower in practice (recompute on
        # eviction + replanning outweigh the saved checkpoint job)
        self.truncate_every = 1
        self._t0 = time.perf_counter()

    # --- state materialization -------------------------------------
    def materialize(
        self, df: DataFrame, iteration: int, eager: bool = False, force: bool = False, meta: dict | None = None
    ) -> DataFrame:
        """Pin the iterate: persist (and periodically truncate lineage).

        Durable (parquet) every ``checkpoint_every`` iterations or when
        ``force`` (used for the final converged state, so a resumed run
        returns it verbatim instead of running an extra superstep);
        otherwise localCheckpoint truncates lineage in memory. ``meta``
        (e.g. {'converged': True, 'dsum': ...}) rides along with
        durable checkpoints and is handed back by :meth:`latest`.
        """
        if self.checkpoint_dir and (force or iteration % self.checkpoint_every == 0):
            path = self._ckpt_path(iteration)
            if iteration != self._last_durable_iter:
                # (never overwrite a checkpoint this run just wrote:
                # the state DataFrame may currently be reading from it)
                df.write.mode("overwrite").parquet(path)
                self._last_durable_iter = iteration
            with open(os.path.join(path, "_meta.json"), "w") as fh:
                json.dump(
                    {"iteration": iteration, "fingerprint": self.fingerprint, **(meta or {})},
                    fh,
                )
            out = self.spark.read.parquet(path)
        elif iteration % self.truncate_every == 0:
            out = truncate_plan(df, eager=eager)
        else:
            out = df.persist()
        self._retire_persisted()
        # drop py4j refs of superseded iterates, then let ContextCleaner
        # reap their localCheckpoint blocks and shuffle files — without
        # this, hour-long superstep loops accumulate storage until the
        # whole session degrades
        self._since_gc += 1
        if self._since_gc >= self.gc_every:
            self._since_gc = 0
            import gc

            gc.collect()
            try:
                self.spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        return out

    def _ckpt_path(self, iteration: int) -> str:
        return os.path.join(self.checkpoint_dir, self.name, f"iter={iteration:06d}")

    def latest(self) -> tuple[int, DataFrame, dict] | None:
        """Restore the newest durable checkpoint (resume support).

        Returns (iteration, state DataFrame, meta dict)."""
        if not self.checkpoint_dir:
            return None
        base = os.path.join(self.checkpoint_dir, self.name)
        if not os.path.isdir(base):
            return None
        iters = sorted(
            int(m.group(1))
            for d in os.listdir(base)
            if (m := re.match(r"iter=(\d+)$", d)) and os.path.exists(os.path.join(base, d, "_SUCCESS"))
        )
        if not iters:
            return None
        it = iters[-1]
        meta_path = os.path.join(self._ckpt_path(it), "_meta.json")
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = json.load(fh)
        if self.fingerprint is not None and meta.get("fingerprint") != self.fingerprint:
            # same checkpoint_dir + runner name but a different graph /
            # parameters: resuming would return wrong results as if
            # converged — refuse and start fresh
            return None
        return it, self.spark.read.parquet(self._ckpt_path(it)), meta

    def _retire_persisted(self) -> None:
        for old in self._persisted:
            try:
                old.unpersist()
            except Exception:
                pass
        self._persisted = []

    # --- metrics ----------------------------------------------------
    def log(self, iteration: int, **kv: Any) -> None:
        row = {
            "run": self.name,
            "iteration": iteration,
            "elapsed_sec": round(time.perf_counter() - self._t0, 6),
            **kv,
        }
        self.metrics.append(row)

    def log_partitions(self, df: DataFrame, iteration: int) -> None:
        """Per-partition lineage: row counts by spark_partition_id."""
        if not self.log_partition_lineage:
            return
        counts = (
            df.withColumn("_pid", F.spark_partition_id()).groupBy("_pid").count().orderBy("_pid").collect()
        )
        self.log(iteration, partition_rows=json.dumps({r["_pid"]: r["count"] for r in counts}))

    def write_metrics(self, path: str | None = None) -> None:
        path = path or (os.path.join(self.checkpoint_dir, self.name, "metrics") if self.checkpoint_dir else None)
        if not path or not self.metrics:
            return
        rows = [json.dumps(m, default=str) for m in self.metrics]
        df = self.spark.read.json(self.spark.sparkContext.parallelize(rows, 1))
        df.write.mode("append").parquet(path)

    def defer(self, fn) -> None:
        """Register a cleanup (e.g. dropping a bucketed static table)
        to run on finalize()."""
        self._cleanups.append(fn)

    def finalize(self) -> None:
        self._retire_persisted()
        for fn in self._cleanups:
            try:
                fn()
            except Exception:
                pass
        self._cleanups = []
        self.write_metrics()
