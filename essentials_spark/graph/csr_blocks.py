"""Per-partition packed CSR blocks + vectorized SpMV kernels.

The Spark translation of the reference's CSR view
(include/gunrock/graph/csr.hxx:230-232: offsets/indices/values) and its
format build (formats/csr.hxx:79-157): edges are hash-bucketed by src,
each bucket packed into ONE row of NumPy arrays

    (bucket, srcs[k], offsets[k+1], dst_index[m], dst_ids[u], coefs[m])

where dst_index/dst_ids pre-factor the per-bucket scatter target
(np.unique(dsts, return_inverse) at pack time) so the per-superstep
kernel is pure vectorized NumPy:

    gather   rank_per_src = ranks[searchsorted(srcs)]     (≙ csr gather)
    expand   per_edge = repeat(rank_per_src, degrees) * coef
    scatter  partial[d] = bincount(dst_index, per_edge)   (≙ atomic::add)

— the same three phases as the reference's advance+spread
(algorithms/pr.hxx:140-152), with Arrow moving columns and exactly one
shuffle per superstep (the partial-aggregate of boundary sums).
No per-row Python anywhere (north-rule requirement).

Buckets are hash-partitions of src, so the rank state bucketed the same
way co-groups without a join; bucket count should track the cluster's
shuffle parallelism (at 100 TB: thousands of buckets, each fitting in
executor memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOCK_SCHEMA = (
    "bucket int, srcs array<long>, offsets array<long>, "
    "dst_ids array<long>, dst_index array<int>, coefs array<double>"
)


def build_csr_blocks(edges_w: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """Pack (src, dst, coef) edges into per-bucket CSR block rows.

    One shuffle (groupBy bucket); the pack itself is a vectorized
    pandas UDF (≙ the reference's counting-sort CSR build,
    formats/csr.hxx:79-157).
    """
    import numpy as np
    import pandas as pd

    spark = edges_w.sparkSession
    n_buckets = n_buckets or spark.sparkContext.defaultParallelism

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                columns=["bucket", "srcs", "offsets", "dst_ids", "dst_index", "coefs"]
            )
        bucket = int(pdf["bucket"].iloc[0])
        order = np.lexsort((pdf["dst"].to_numpy(), pdf["src"].to_numpy()))
        src = pdf["src"].to_numpy()[order]
        dst = pdf["dst"].to_numpy()[order]
        coef = pdf["coef"].to_numpy()[order]
        srcs, counts = np.unique(src, return_counts=True)
        offsets = np.zeros(len(srcs) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        dst_ids, dst_index = np.unique(dst, return_inverse=True)
        return pd.DataFrame(
            {
                "bucket": [bucket],
                "srcs": [srcs],
                "offsets": [offsets],
                "dst_ids": [dst_ids],
                "dst_index": [dst_index.astype(np.int32)],
                "coefs": [coef],
            }
        )

    bucketed = edges_w.withColumn("bucket", F.pmod(F.col("src"), F.lit(n_buckets)).cast("int"))
    return bucketed.groupBy("bucket").applyInPandas(pack, schema=BLOCK_SCHEMA)


def spmv_push(blocks: DataFrame, values: DataFrame, n_buckets: int, value_col: str = "rank") -> DataFrame:
    """One SpMV superstep over CSR blocks: returns (dst, contrib).

    ``values`` is the vertex state (vid, value). Gather/expand/scatter
    run inside Arrow batches; the only shuffle is the final
    groupBy(dst) combining boundary partials across buckets (Catalyst
    adds the map-side partial aggregate).
    """
    import numpy as np
    import pandas as pd

    vals = values.select(
        F.pmod(F.col("vid"), F.lit(n_buckets)).cast("int").alias("bucket"),
        "vid",
        F.col(value_col).alias("val"),
    )

    def kernel(block_pdf: pd.DataFrame, vals_pdf: pd.DataFrame):
        if len(block_pdf) == 0 or len(vals_pdf) == 0:
            return pd.DataFrame({"dst": pd.Series(dtype="int64"), "partial": pd.Series(dtype="float64")})
        row = block_pdf.iloc[0]
        srcs = np.asarray(row["srcs"], dtype=np.int64)
        offsets = np.asarray(row["offsets"], dtype=np.int64)
        dst_ids = np.asarray(row["dst_ids"], dtype=np.int64)
        dst_index = np.asarray(row["dst_index"], dtype=np.int64)
        coefs = np.asarray(row["coefs"], dtype=np.float64)

        vv = vals_pdf["vid"].to_numpy()
        xs = vals_pdf["val"].to_numpy()
        vorder = np.argsort(vv)
        vv_sorted = vv[vorder]
        pos = np.clip(np.searchsorted(vv_sorted, srcs), 0, len(vv_sorted) - 1)
        # a block src absent from the values partition is a zero-valued
        # gather (same semantics as the 'dataframe' kernel's inner
        # join), NOT a blind index — unmasked, pos==len IndexErrors and
        # a near-miss silently gathers the wrong vertex's value
        found = vv_sorted[pos] == srcs
        rank_per_src = np.where(found, xs[vorder][pos], 0.0)

        degrees = np.diff(offsets)
        per_edge = np.repeat(rank_per_src, degrees) * coefs
        partial = np.bincount(dst_index, weights=per_edge, minlength=len(dst_ids))
        return pd.DataFrame({"dst": dst_ids, "partial": partial})

    partials = blocks.groupby("bucket").cogroup(vals.groupby("bucket")).applyInPandas(
        kernel, schema="dst long, partial double"
    )
    return partials.groupBy("dst").agg(F.sum("partial").alias("contrib"))


def csr_min_push(
    blocks: DataFrame, values: DataFrame, n_buckets: int, value_col: str = "label"
) -> DataFrame:
    """One MIN-semiring superstep over CSR blocks: returns (dst, nbr_min).

    The hash-min message round of connected components as the same
    gather/expand/scatter kernel as :func:`spmv_push` with (min, ·)
    replacing (+, ×): scatter is ``np.minimum.at`` (≙ the reference's
    atomic::min in mst.hxx:173-199). Only srcs present in ``values``
    (the frontier) contribute — absent srcs are masked out, so a delta
    frontier works unchanged. One shuffle: the final groupBy(dst) min
    across bucket boundaries (map-side partial min applies)."""
    import numpy as np
    import pandas as pd

    vals = values.select(
        F.pmod(F.col("vid"), F.lit(n_buckets)).cast("int").alias("bucket"),
        "vid",
        F.col(value_col).alias("val"),
    )

    def kernel(block_pdf: pd.DataFrame, vals_pdf: pd.DataFrame):
        if len(block_pdf) == 0 or len(vals_pdf) == 0:
            return pd.DataFrame({"dst": pd.Series(dtype="int64"), "partial": pd.Series(dtype="int64")})
        row = block_pdf.iloc[0]
        srcs = np.asarray(row["srcs"], dtype=np.int64)
        offsets = np.asarray(row["offsets"], dtype=np.int64)
        dst_ids = np.asarray(row["dst_ids"], dtype=np.int64)
        dst_index = np.asarray(row["dst_index"], dtype=np.int64)

        vv = vals_pdf["vid"].to_numpy()
        xs = vals_pdf["val"].to_numpy()
        vorder = np.argsort(vv)
        vv_sorted = vv[vorder]
        pos = np.clip(np.searchsorted(vv_sorted, srcs), 0, len(vv_sorted) - 1)
        found = vv_sorted[pos] == srcs
        # identity of the min semiring for absent (non-frontier) srcs
        NONE = np.iinfo(np.int64).max
        lab_per_src = np.where(found, xs[vorder][pos], NONE)

        degrees = np.diff(offsets)
        per_edge = np.repeat(lab_per_src, degrees)
        partial = np.full(len(dst_ids), NONE, dtype=np.int64)
        np.minimum.at(partial, dst_index, per_edge)
        keep = partial != NONE
        return pd.DataFrame({"dst": dst_ids[keep], "partial": partial[keep]})

    partials = blocks.groupby("bucket").cogroup(vals.groupby("bucket")).applyInPandas(
        kernel, schema="dst long, partial long"
    )
    return partials.groupBy("dst").agg(F.min("partial").alias("nbr_min"))


def csr_label_counts(blocks: DataFrame, labels: DataFrame, n_buckets: int) -> DataFrame:
    """One LP message phase over CSR blocks: (dst, label, cnt) counts.

    The mode-of-neighbors semiring has no scalar scatter op, so the
    kernel produces bucket-local (dst, label) run-length counts —
    gather label per src (searchsorted), expand by degree, lexsort the
    (dst, label) composite, run-length encode at the boundaries — and
    the single shuffle sums them per (dst, label) across buckets (the
    same volume the dataframe path ships after its map-side combine).
    Srcs absent from ``labels`` contribute nothing (≙ the dataframe
    path's inner join), so a restricted label stream works unchanged.
    The mode/tiebreak decision stays dataframe-side (algos/lp.py) —
    it is label-cardinality-scale, not edge-scale.
    """
    import numpy as np
    import pandas as pd

    labs = labels.select(
        F.pmod(F.col("vid"), F.lit(n_buckets)).cast("int").alias("bucket"),
        "vid",
        F.col("label").alias("val"),
    )

    def kernel(block_pdf: pd.DataFrame, labs_pdf: pd.DataFrame):
        empty = pd.DataFrame({
            "dst": pd.Series(dtype="int64"),
            "label": pd.Series(dtype="int64"),
            "cnt": pd.Series(dtype="int64"),
        })
        if len(block_pdf) == 0 or len(labs_pdf) == 0:
            return empty
        row = block_pdf.iloc[0]
        srcs = np.asarray(row["srcs"], dtype=np.int64)
        offsets = np.asarray(row["offsets"], dtype=np.int64)
        dst_ids = np.asarray(row["dst_ids"], dtype=np.int64)
        dst_index = np.asarray(row["dst_index"], dtype=np.int64)

        vv = labs_pdf["vid"].to_numpy()
        xs = labs_pdf["val"].to_numpy()
        vorder = np.argsort(vv)
        vv_sorted = vv[vorder]
        pos = np.clip(np.searchsorted(vv_sorted, srcs), 0, len(vv_sorted) - 1)
        found = vv_sorted[pos] == srcs
        lab_per_src = xs[vorder][pos]

        degrees = np.diff(offsets)
        valid = np.repeat(found, degrees)
        d = dst_index[valid]
        lab = np.repeat(lab_per_src, degrees)[valid]
        if len(d) == 0:
            return empty
        order = np.lexsort((lab, d))
        d = d[order]
        lab = lab[order]
        bnd = np.empty(len(d), dtype=bool)
        bnd[0] = True
        bnd[1:] = (d[1:] != d[:-1]) | (lab[1:] != lab[:-1])
        starts = np.flatnonzero(bnd)
        cnt = np.diff(np.append(starts, len(d)))
        return pd.DataFrame({"dst": dst_ids[d[starts]], "label": lab[starts], "cnt": cnt})

    partials = blocks.groupby("bucket").cogroup(labs.groupby("bucket")).applyInPandas(
        kernel, schema="dst long, label long, cnt long"
    )
    return partials.groupBy("dst", "label").agg(F.sum("cnt").alias("cnt"))


def csr_walk_step(blocks: DataFrame, frontier: DataFrame, n_buckets: int) -> DataFrame:
    """One random-walk step over CSR blocks: returns (wid, cur).

    ``frontier`` is (wid: string, cur: long, h: long) — ``h`` the
    portable choice hash, computed JVM-side (sampling/walks.walk_hash)
    so the kernel stays pure vectorized indexing: for each walker at
    vertex v, the next hop is neighbor ``h % deg(v)`` of v's
    dst-ascending packed run, ``dst[offset[v] + h % deg(v)]`` — one
    gather, O(frontier) work, ZERO edge-side exchange (the only
    shuffle is the frontier's own co-group by bucket). Walkers at
    vertices absent from the block table (isolated vertices) emit
    nothing — the walk ends, matching the dataframe path's inner join.
    """
    import numpy as np
    import pandas as pd

    fr = frontier.select(
        F.pmod(F.col("cur"), F.lit(n_buckets)).cast("int").alias("bucket"),
        "wid",
        "cur",
        "h",
    )

    def kernel(block_pdf: pd.DataFrame, fr_pdf: pd.DataFrame):
        empty = pd.DataFrame({
            "wid": pd.Series(dtype="object"),
            "cur": pd.Series(dtype="int64"),
        })
        if len(block_pdf) == 0 or len(fr_pdf) == 0:
            return empty
        row = block_pdf.iloc[0]
        srcs = np.asarray(row["srcs"], dtype=np.int64)
        offsets = np.asarray(row["offsets"], dtype=np.int64)
        dst_ids = np.asarray(row["dst_ids"], dtype=np.int64)
        dst_index = np.asarray(row["dst_index"], dtype=np.int64)

        cur = fr_pdf["cur"].to_numpy(dtype=np.int64)
        h = fr_pdf["h"].to_numpy(dtype=np.int64)
        pos = np.clip(np.searchsorted(srcs, cur), 0, len(srcs) - 1)
        found = srcs[pos] == cur
        deg = (offsets[pos + 1] - offsets[pos])
        # masked choice: absent vertices get deg clamped to 1 so the
        # modulo is defined, then the row is dropped by ``found``
        idx = offsets[pos] + h % np.maximum(deg, 1)
        nxt = dst_ids[dst_index[np.clip(idx, 0, len(dst_index) - 1)]]
        keep = found & (deg > 0)
        return pd.DataFrame({"wid": fr_pdf["wid"].to_numpy()[keep], "cur": nxt[keep]})

    return blocks.groupby("bucket").cogroup(fr.groupby("bucket")).applyInPandas(
        kernel, schema="wid string, cur long"
    )


def csr_node2vec_expand(
    blocks: DataFrame, frontier: DataFrame, n_buckets: int, max_expand: int
) -> DataFrame:
    """Candidate expansion for a second-order walk step: frontier
    (wid, prev, cur, h) co-groups with cur's block; emits one row per
    neighbor of cur — (wid, prev, cur, h, dst, rank), rank 1-based in
    the dst-ascending run. Pure vectorized repeat/gather.

    Hub cap (sampling/walks.node2vec_walks docstring): a walker whose
    cur has more than ``max_expand`` neighbors takes the first-order
    uniform gather HERE — one row with rank=0 and dst already chosen
    (``dst[offset + h % deg]``), which the pick kernel passes through.
    Bounds this kernel's output at walkers × max_expand instead of
    walkers × deg(hub) (measured 17e9-row allocation without it)."""
    import numpy as np
    import pandas as pd

    fr = frontier.select(
        F.pmod(F.col("cur"), F.lit(n_buckets)).cast("int").alias("bucket"),
        "wid", "prev", "cur", "h",
    )

    def kernel(block_pdf: pd.DataFrame, fr_pdf: pd.DataFrame):
        empty = pd.DataFrame({
            "wid": pd.Series(dtype="object"),
            "prev": pd.Series(dtype="int64"),
            "cur": pd.Series(dtype="int64"),
            "h": pd.Series(dtype="int64"),
            "dst": pd.Series(dtype="int64"),
            "rank": pd.Series(dtype="int64"),
        })
        if len(block_pdf) == 0 or len(fr_pdf) == 0:
            return empty
        row = block_pdf.iloc[0]
        srcs = np.asarray(row["srcs"], dtype=np.int64)
        offsets = np.asarray(row["offsets"], dtype=np.int64)
        dst_ids = np.asarray(row["dst_ids"], dtype=np.int64)
        dst_index = np.asarray(row["dst_index"], dtype=np.int64)

        cur = fr_pdf["cur"].to_numpy(dtype=np.int64)
        pos = np.clip(np.searchsorted(srcs, cur), 0, len(srcs) - 1)
        found = srcs[pos] == cur
        if not found.any():
            return empty
        sub = fr_pdf[found]
        pos = pos[found]
        deg = offsets[pos + 1] - offsets[pos]

        capped = deg > max_expand
        outs = []
        if capped.any():
            csub = sub[capped]
            cpos = pos[capped]
            cdeg = deg[capped]
            h = csub["h"].to_numpy(dtype=np.int64)
            idx = offsets[cpos] + h % cdeg
            outs.append(pd.DataFrame({
                "wid": csub["wid"].to_numpy(),
                "prev": csub["prev"].to_numpy(dtype=np.int64),
                "cur": csub["cur"].to_numpy(dtype=np.int64),
                "h": h,
                "dst": dst_ids[dst_index[idx]],
                "rank": np.zeros(len(csub), dtype=np.int64),
            }))
        sub = sub[~capped]
        pos = pos[~capped]
        deg = deg[~capped]
        tot = int(deg.sum())
        if tot > 0:
            starts = offsets[pos]
            cum = np.cumsum(deg)
            base = np.repeat(cum - deg, deg)
            local = np.arange(tot, dtype=np.int64) - base  # 0..deg-1 per walker
            idx = np.repeat(starts, deg) + local
            outs.append(pd.DataFrame({
                "wid": np.repeat(sub["wid"].to_numpy(), deg),
                "prev": np.repeat(sub["prev"].to_numpy(dtype=np.int64), deg),
                "cur": np.repeat(sub["cur"].to_numpy(dtype=np.int64), deg),
                "h": np.repeat(sub["h"].to_numpy(dtype=np.int64), deg),
                "dst": dst_ids[dst_index[idx]],
                "rank": local + 1,
            }))
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)

    return blocks.groupby("bucket").cogroup(fr.groupby("bucket")).applyInPandas(
        kernel, schema="wid string, prev long, cur long, h long, dst long, rank long"
    )


def csr_node2vec_pick(
    blocks: DataFrame,
    cand: DataFrame,
    n_buckets: int,
    w_return: int,
    w_common: int,
    w_far: int,
) -> DataFrame:
    """Membership-weighted pick for a second-order walk step. ``cand``
    rows co-group by bucket(prev) — a walker's candidates all share
    ``prev``, so exactly the block that answers the N(prev) probe sees
    the whole candidate set. Membership is a bucket-local composite-key
    merge (src_pos * |dst_ids| + dst_pos, both bucket-local ints — no
    global-vid overflow), the pick one segmented integer cumsum.
    Returns (wid, prev, cur) for the NEXT frontier (prev = old cur)."""
    import numpy as np
    import pandas as pd

    cd = cand.select(
        F.pmod(F.col("prev"), F.lit(n_buckets)).cast("int").alias("bucket"),
        "wid", "prev", "cur", "h", "dst", "rank",
    )

    def kernel(block_pdf: pd.DataFrame, cd_pdf: pd.DataFrame):
        empty = pd.DataFrame({
            "wid": pd.Series(dtype="object"),
            "prev": pd.Series(dtype="int64"),
            "cur": pd.Series(dtype="int64"),
        })
        if len(cd_pdf) == 0:
            return empty
        # hub-capped walkers (rank=0, expand already chose dst
        # first-order) bypass the weighted pick
        ranks_all = cd_pdf["rank"].to_numpy(dtype=np.int64)
        bypass = ranks_all == 0
        passthrough = None
        if bypass.any():
            bsub = cd_pdf[bypass]
            passthrough = pd.DataFrame({
                "wid": bsub["wid"].to_numpy(),
                "prev": bsub["cur"].to_numpy(dtype=np.int64),
                "cur": bsub["dst"].to_numpy(dtype=np.int64),
            })
            cd_pdf = cd_pdf[~bypass]
            if len(cd_pdf) == 0:
                return passthrough
        prev = cd_pdf["prev"].to_numpy(dtype=np.int64)
        dst = cd_pdf["dst"].to_numpy(dtype=np.int64)
        is_common = np.zeros(len(cd_pdf), dtype=bool)
        if len(block_pdf) > 0:
            row = block_pdf.iloc[0]
            srcs = np.asarray(row["srcs"], dtype=np.int64)
            offsets = np.asarray(row["offsets"], dtype=np.int64)
            dst_ids = np.asarray(row["dst_ids"], dtype=np.int64)
            dst_index = np.asarray(row["dst_index"], dtype=np.int64)
            # composite keys: edges sorted by (src_pos, dst_index) by
            # construction (dsts ascend within a run, dst_ids sorted)
            degrees = np.diff(offsets)
            src_pos_e = np.repeat(np.arange(len(srcs), dtype=np.int64), degrees)
            key_e = src_pos_e * len(dst_ids) + dst_index
            posp = np.clip(np.searchsorted(srcs, prev), 0, max(len(srcs) - 1, 0))
            prev_found = srcs[posp] == prev if len(srcs) else np.zeros(len(prev), dtype=bool)
            posd = np.clip(np.searchsorted(dst_ids, dst), 0, max(len(dst_ids) - 1, 0))
            dst_found = dst_ids[posd] == dst if len(dst_ids) else np.zeros(len(dst), dtype=bool)
            key_c = posp * len(dst_ids) + posd
            ins = np.clip(np.searchsorted(key_e, key_c), 0, max(len(key_e) - 1, 0))
            is_common = prev_found & dst_found & (len(key_e) > 0) & (key_e[ins] == key_c)
        w = np.where(
            dst == prev, w_return, np.where(is_common, w_common, w_far)
        ).astype(np.int64)
        # segment per wid in rank order
        wid_codes, _ = pd.factorize(cd_pdf["wid"], sort=False)
        rank = cd_pdf["rank"].to_numpy(dtype=np.int64)
        order = np.lexsort((rank, wid_codes))
        wid_s = wid_codes[order]
        w_s = w[order]
        h_s = cd_pdf["h"].to_numpy(dtype=np.int64)[order]
        seg_start = np.empty(len(wid_s), dtype=bool)
        seg_start[0] = True
        seg_start[1:] = wid_s[1:] != wid_s[:-1]
        starts = np.flatnonzero(seg_start)
        counts = np.diff(np.append(starts, len(wid_s)))
        cum = np.cumsum(w_s)
        base = np.repeat(cum[starts] - w_s[starts], counts)
        cum_in = cum - base  # inclusive cumsum within segment
        tot = np.repeat(np.add.reduceat(w_s, starts), counts)
        r = h_s % tot
        pick = (r < cum_in) & (r >= cum_in - w_s)
        sel = order[pick]
        out = pd.DataFrame({
            "wid": cd_pdf["wid"].to_numpy()[sel],
            "prev": cd_pdf["cur"].to_numpy(dtype=np.int64)[sel],
            "cur": cd_pdf["dst"].to_numpy(dtype=np.int64)[sel],
        })
        if passthrough is not None:
            out = pd.concat([passthrough, out], ignore_index=True)
        return out

    return blocks.groupby("bucket").cogroup(cd.groupby("bucket")).applyInPandas(
        kernel, schema="wid string, prev long, cur long"
    )


def csr_tropical_push(
    blocks: DataFrame, values: DataFrame, n_buckets: int, value_col: str = "dist"
) -> DataFrame:
    """One (min, +) TROPICAL-semiring superstep over CSR blocks:
    returns (dst, nbr_min) with nbr_min = min over in-edges (src, dst,
    coef) of value(src) + coef, srcs restricted to ``values`` (a delta
    frontier works unchanged — absent srcs gather the +inf identity).

    This is :func:`spmv_push` with (min, +) replacing (+, x): one
    vectorized gather/expand/scatter per bucket (np.minimum.at ≙ the
    reference's atomic::min relax, sssp.hxx:98-151), one boundary
    min-combine shuffle. Serves BFS (coef = 1) and weighted SSSP on
    the same kernel; doubles end-to-end, bit-exact with the dataframe
    relax (each message is a single add on both paths)."""
    import numpy as np
    import pandas as pd

    vals = values.select(
        F.pmod(F.col("vid"), F.lit(n_buckets)).cast("int").alias("bucket"),
        "vid",
        F.col(value_col).alias("val"),
    )

    def kernel(block_pdf: pd.DataFrame, vals_pdf: pd.DataFrame):
        if len(block_pdf) == 0 or len(vals_pdf) == 0:
            return pd.DataFrame({"dst": pd.Series(dtype="int64"), "partial": pd.Series(dtype="float64")})
        row = block_pdf.iloc[0]
        srcs = np.asarray(row["srcs"], dtype=np.int64)
        offsets = np.asarray(row["offsets"], dtype=np.int64)
        dst_ids = np.asarray(row["dst_ids"], dtype=np.int64)
        dst_index = np.asarray(row["dst_index"], dtype=np.int64)
        coefs = np.asarray(row["coefs"], dtype=np.float64)

        vv = vals_pdf["vid"].to_numpy()
        xs = vals_pdf["val"].to_numpy(dtype=np.float64)
        vorder = np.argsort(vv)
        vv_sorted = vv[vorder]
        pos = np.clip(np.searchsorted(vv_sorted, srcs), 0, len(vv_sorted) - 1)
        found = vv_sorted[pos] == srcs
        val_per_src = np.where(found, xs[vorder][pos], np.inf)

        degrees = np.diff(offsets)
        per_edge = np.repeat(val_per_src, degrees) + coefs
        partial = np.full(len(dst_ids), np.inf, dtype=np.float64)
        np.minimum.at(partial, dst_index, per_edge)
        keep = np.isfinite(partial)
        return pd.DataFrame({"dst": dst_ids[keep], "partial": partial[keep]})

    partials = blocks.groupby("bucket").cogroup(vals.groupby("bucket")).applyInPandas(
        kernel, schema="dst long, partial double"
    )
    return partials.groupBy("dst").agg(F.min("partial").alias("nbr_min"))
