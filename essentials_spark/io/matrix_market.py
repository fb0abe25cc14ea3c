"""Matrix Market (.mtx) and point-label readers -> edge/vertex DataFrames.

Reference: include/gunrock/io/matrix_market.hxx:99-240 — banner parse,
coordinate/pattern/real/integer data, 1-based -> 0-based ids, and the
symmetric-storage rule (a `symmetric` banner stores each off-diagonal
edge once; the loader materializes both directions, :194-235).
Point labels (per-vertex lat/lon for geo): io/points.hxx analogue.

Spark-first: the body parses distributedly via spark.read.text +
column splits (a 100 GB .mtx scans in parallel); only the banner line
is read on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_mtx(spark: SparkSession, path: str) -> DataFrame:
    """Read a Matrix Market coordinate file into (src, dst, weight).

    Handles %%MatrixMarket banner options: real/integer/pattern,
    general/symmetric. Pattern matrices get weight 1.0; symmetric
    storage is expanded to both directions (off-diagonal only).
    """
    # storage-portable banner read: spark.read.text goes through the
    # Hadoop filesystem layer, so file://, hdfs://, s3a:// all work —
    # a driver-side open() would break on object-store paths. limit(1)
    # prunes the scan to the first partition's first line.
    banner_row = spark.read.text(path).limit(1).collect()
    banner = banner_row[0]["value"].strip().lower() if banner_row else ""
    if not banner.startswith("%%matrixmarket"):
        raise ValueError(f"not a MatrixMarket file: {banner!r}")
    opts = set(banner.split())
    pattern = "pattern" in opts
    symmetric = "symmetric" in opts

    lines = spark.read.text(path).filter(~F.col("value").startswith("%"))
    parts = F.split(F.trim(F.col("value")), r"\s+")
    rows = lines.select(
        parts.getItem(0).cast("long").alias("src1"),
        parts.getItem(1).cast("long").alias("dst1"),
        (F.lit(1.0) if pattern else parts.getItem(2).cast("double")).alias("weight"),
    ).filter(F.col("src1").isNotNull() & F.col("dst1").isNotNull())

    # drop the size header line (the first non-comment line, "n m nnz").
    # identify it structurally: in 1-based data src/dst >= 1 always; the
    # header is the single row equal to (n_rows, n_cols) with nnz in col 3
    # — robustly: number all rows and drop the first by order of file
    # position using a monotonic id over the single file read.
    rows = rows.withColumn("_mid", F.monotonically_increasing_id())
    first = rows.agg(F.min("_mid")).collect()[0][0]
    edges = rows.filter(F.col("_mid") != first).select(
        (F.col("src1") - 1).alias("src"), (F.col("dst1") - 1).alias("dst"), "weight"
    )
    if symmetric:
        edges = edges.unionByName(
            edges.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
    return edges


def read_smtx(spark: SparkSession, path: str) -> DataFrame:
    """Read the .smtx CSR text format (reference io/smtx.hxx):
    line 1: 'nrows ncols nnz'; line 2: row offsets; line 3: column
    indices. Values are not stored; weight=1.0. Small-file format —
    parsed on the driver, distributed afterwards."""
    import numpy as np

    with open(path) as fh:
        header = fh.readline().replace(",", " ").split()
        n_rows = int(header[0])
        offsets = np.array(fh.readline().split(), dtype=np.int64)
        indices = np.array(fh.readline().split(), dtype=np.int64)
    srcs = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offsets))
    rows = [(int(s), int(d), 1.0) for s, d in zip(srcs, indices)]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def read_points(spark: SparkSession, path: str) -> DataFrame:
    """Per-vertex coordinate labels (geo): whitespace 'vid lat lon'
    lines, '#'/'%' comments skipped — io/points.hxx analogue."""
    lines = spark.read.text(path).filter(
        ~F.col("value").startswith("%") & ~F.col("value").startswith("#") & (F.length(F.trim("value")) > 0)
    )
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return lines.select(
        parts.getItem(0).cast("long").alias("vid"),
        parts.getItem(1).cast("double").alias("lat"),
        parts.getItem(2).cast("double").alias("lon"),
    )
