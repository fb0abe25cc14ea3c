"""Cosine similarity search over an embedding column (array<float>).

- brute_force_topk: the exact baseline — normalized dot products via
  JVM-side higher-order functions (zip_with + aggregate; no Python),
  broadcast of the (small) query set against the candidate scan, top-k
  by window. O(|Q| x |C|) work but embarrassingly parallel: at 100 TB
  the candidate side stays partition-parallel and only |Q| x k rows
  shuffle.
- lsh_topk: the scale path — random-hyperplane (SimHash-family) LSH:
  candidates are bucketed by b-bit signatures over t tables; each query
  probes its buckets only, turning the cross product into a bucketed
  equi-join. Recall is tunable via (bits, tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(_dot(a, a))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_decimals: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, sim, rank); deterministic tiebreak
    (rounded sim desc, neighbor_id asc).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _norm(F.col("cv")))
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), sim_decimals).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _plane_component(t: int, b: int):
    """Deterministic pseudo-random hyperplane component for (table t,
    bit b, dimension i): hash-derived uniform in [-1, 1] — the
    reference's index-seeded randomness (algorithms/generate/
    random.hxx) instead of literal plane arrays, which bloat the plan
    at 1-4k dims and force a driver-side dim probe."""
    seed = t * 1024 + b
    return lambda x, i: x * (
        (F.pmod(F.xxhash64(F.lit(seed), i), F.lit(2001)) - F.lit(1000)).cast("double") / 1000.0
    )


def _rh_signature(vec, t: int, bits: int):
    """b-bit random-hyperplane signature: sign bits of <v, h_i>."""
    sig = F.lit(0).cast("long")
    for b in range(bits):
        proj = F.aggregate(
            F.transform(vec, _plane_component(t, b)), F.lit(0.0), lambda acc, x: acc + x
        )
        sig = sig + F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig


def _rh_signature_literal(vec, planes_t: list[list[float]]):
    """Signature against literal plane arrays (portable mode): the same
    component values are inlined into the oracle SQL (functions/
    portable_hash.plane_components), so buckets are value-checkable in
    DuckDB. Fine at O(100) dims; the hash-derived variant above is the
    scale path for 1-4k dims."""
    sig = F.lit(0).cast("long")
    for b, comps in enumerate(planes_t):
        arr = F.array(*[F.lit(c) for c in comps])
        proj = F.aggregate(
            F.zip_with(vec, arr, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        sig = sig + F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 12,
    tables: int = 4,
    dim: int | None = None,
    sim_decimals: int = 6,
    portable: bool = False,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH bucketing.

    Each vector gets ``tables`` signatures of ``bits`` bits; query and
    candidate meet when any table's signature matches — a bucketed
    equi-join on (table, signature) instead of a cross join. ``dim``
    is required only in ``portable`` mode (literal plane arrays shared
    with the oracle SQL); otherwise hyperplanes are hash-derived per
    dimension index and any dim works.
    """
    planes = None
    if portable:
        from essentials_spark.functions.portable_hash import plane_components

        if dim is None:
            raise ValueError("portable lsh_topk requires dim")
        planes = plane_components(tables, bits, dim)

    def with_sigs(df, idc):
        v = _as_double(F.col(vec_col))
        rows = df.select(F.col(id_col).alias(idc), v.alias("v")).withColumn("n", _norm(F.col("v")))
        sigs = [
            F.struct(
                F.lit(t).alias("tbl"),
                (
                    _rh_signature_literal(F.col("v"), planes[t])
                    if portable
                    else _rh_signature(F.col("v"), t, bits)
                ).alias("sig"),
            )
            for t in range(tables)
        ]
        return rows.withColumn("sig", F.explode(F.array(*sigs))).select(
            idc, "v", "n", F.col("sig.tbl").alias("tbl"), F.col("sig.sig").alias("sig")
        )

    qs = with_sigs(queries, "query_id")
    cs = with_sigs(candidates, "neighbor_id")
    pairs = (
        qs.join(cs, ["tbl", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(qs["v"], cs["v"]) / (qs["n"] * cs["n"]), sim_decimals
            ).alias("sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_pairs(
    vectors: DataFrame,
    min_sim: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 10,
    tables: int = 6,
    bucket_cap: int = 64,
    chain_width: int = 2,
    sim_decimals: int = 6,
    portable: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Self-join near-neighbor pairs (a, b, sim), a < b, sim >= min_sim.

    Threshold-first (no top-k window over an unbounded candidate set —
    the dedup use-case wants *all* pairs above min_sim); LSH buckets
    above ``bucket_cap`` fall back to bounded chain pairing (see
    dedup/minhash.capped_bucket_pairs) so a degenerate bucket of
    near-identical vectors cannot go quadratic. ``portable``: literal
    plane arrays (functions/portable_hash.plane_components — requires
    ``dim``) so every bucket, hence every candidate pair, is exactly
    reproducible in oracle SQL; the hash-derived planes stay the scale
    path for 1-4k dims."""
    from essentials_spark.dedup.minhash import capped_bucket_pairs

    if portable:
        from essentials_spark.functions.portable_hash import plane_components

        if not dim:
            raise ValueError("portable lsh_pairs requires dim")
        planes = plane_components(tables, bits, dim)

    v = _as_double(F.col(vec_col))
    rows = vectors.select(F.col(id_col).alias("id"), v.alias("v")).withColumn("n", _norm(F.col("v")))
    sigs = [
        F.struct(
            F.lit(t).alias("tbl"),
            (
                _rh_signature_literal(F.col("v"), planes[t])
                if portable
                else _rh_signature(F.col("v"), t, bits)
            ).alias("sig"),
        )
        for t in range(tables)
    ]
    bucketed = rows.withColumn("s", F.explode(F.array(*sigs))).select(
        "id", "v", "n", F.col("s.tbl").alias("tbl"), F.col("s.sig").alias("sig")
    )
    cand = capped_bucket_pairs(
        bucketed, ["tbl", "sig"], ["v", "n"], bucket_cap=bucket_cap, chain_width=chain_width
    )
    sim = F.round(_dot(F.col("a_v"), F.col("b_v")) / (F.col("a_n") * F.col("b_n")), sim_decimals)
    return cand.select("a", "b", sim.alias("sim")).filter(F.col("sim") >= min_sim)


def _ivf_codebook(n_cells: int, dim: int) -> list[list[float]]:
    """Deterministic fixed codebook (functions/portable_hash
    plane_components with shape (n_cells, 1, dim)) — the same literal
    vectors are inlined into the oracle SQL, so cell assignment is
    value-checkable in DuckDB."""
    from essentials_spark.functions.portable_hash import plane_components

    return [plane_components(n_cells, 1, dim)[j][0] for j in range(n_cells)]


def _ivf_cells(df, idc: str, codebook, nprobe: int, id_col: str, vec_col: str):
    """Assign each vector to its ``nprobe`` best cells by dot product.

    Tie order matches the oracle SQL (score DESC, cell index ASC) via
    the (score, -j) struct comparator."""
    v = _as_double(F.col(vec_col))
    rows = df.select(F.col(id_col).alias(idc), v.alias("v")).withColumn("n", _norm(F.col("v")))
    scored = F.array(
        *[
            F.struct(
                _dot(F.col("v"), F.array(*[F.lit(c) for c in codebook[j]])).alias("s"),
                F.lit(-j).alias("nj"),
            )
            for j in range(len(codebook))
        ]
    )
    probes = F.slice(F.sort_array(scored, asc=False), 1, nprobe)
    return rows.withColumn("p", F.explode(probes)).select(
        idc, "v", "n", (-F.col("p.nj")).alias("cell")
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_cells: int = 32,
    nprobe: int = 4,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_decimals: int = 6,
    train_iters: int = 0,
) -> DataFrame:
    """Approximate top-k via an inverted-file (IVF) coarse quantizer.

    Every candidate is indexed under its single best cell of a
    deterministic codebook (Voronoi partition by max dot product);
    each query probes its ``nprobe`` best cells — a bucketed equi-join
    scanning ~nprobe/n_cells of the corpus instead of all of it. The
    complementary scale path to lsh_topk: LSH buckets by locality
    hashes, IVF by codebook regions (≙ FAISS IndexIVFFlat search
    semantics, reimplemented as dataflow).

    ``train_iters`` > 0 refines the codebook with Lloyd iterations
    (spherical k-means on the candidate set; centroids collected to
    the driver — O(n_cells x dim) floats, broadcast back as literals).
    The default 0 keeps cell assignment reproducible in the ANSI-SQL
    oracle; trained codebooks are a Spark-only improvement.
    """
    if dim is None:
        raise ValueError("ivf_topk requires dim")
    codebook = _ivf_codebook(n_cells, dim)

    if train_iters > 0:
        v = _as_double(F.col(vec_col))
        cand_v = candidates.select(v.alias("v")).persist()
        for _ in range(train_iters):
            assigned = _ivf_cells(
                cand_v.withColumn("_id", F.monotonically_increasing_id()),
                "_cid", codebook, 1, "_id", "v",
            )
            means = (
                assigned.groupBy("cell")
                .agg(F.array(*[F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(dim)]).alias("c"))
                .collect()
            )
            for r in means:  # empty cells keep their old centroid
                codebook[r["cell"]] = [float(x) for x in r["c"]]
        cand_v.unpersist()

    qs = _ivf_cells(queries, "query_id", codebook, nprobe, id_col, vec_col)
    cs = _ivf_cells(candidates, "neighbor_id", codebook, 1, id_col, vec_col)
    pairs = (
        qs.join(cs, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(qs["v"], cs["v"]) / (qs["n"] * cs["n"]), sim_decimals).alias("sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
