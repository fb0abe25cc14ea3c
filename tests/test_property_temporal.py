"""Property-based fuzz (hypothesis) for the temporal/rank ops vs
brute-force Python oracles — semantics pinned over generated inputs,
not just hand-picked fixtures. Example counts stay small because
every example runs Spark jobs."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.sampled_from(["a", "b"])
rows_left = st.lists(
    st.tuples(keys, st.integers(0, 50)), min_size=1, max_size=12
)
rows_right = st.lists(
    st.tuples(keys, st.integers(0, 50), st.integers(0, 999)), min_size=0, max_size=12
)


@settings(**_SETTINGS)
@given(left=rows_left, right=rows_right, strict=st.booleans(), shard=st.sampled_from([None, 7, 100]))
def test_asof_join_matches_bruteforce(spark, left, right, strict, shard):
    from essentials_spark.ops.asof import asof_join

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "key string, ts_us long, lid long"
    )
    rdf = spark.createDataFrame(right, "key string, ts_us long, rv long")
    got = {
        r["lid"]: r["asof_rv"]
        for r in asof_join(
            ldf, rdf, "key", value_cols=["rv"], strict=strict,
            right_order_cols=["rv"], shard_us=shard,
        ).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [
            (rt, rv) for rk, rt, rv in right
            if rk == k and (rt < t if strict else rt <= t)
        ]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, t, strict, shard, got[i], want)


@settings(**_SETTINGS)
@given(
    pts=st.lists(st.integers(0, 200), min_size=0, max_size=20),
    ivs=st.lists(st.tuples(st.integers(-10, 210), st.integers(0, 60)), min_size=1, max_size=8),
    bucket=st.sampled_from([3, 50, 1000]),
)
def test_range_count_matches_bruteforce(spark, pts, ivs, bucket):
    from essentials_spark.ops.asof import range_count

    pdf = spark.createDataFrame([(t,) for t in pts], "ts_us long")
    idf = spark.createDataFrame(
        [(q, lo, lo + w) for q, (lo, w) in enumerate(ivs)],
        "qid long, lo_us long, hi_us long",
    )
    got = {r["qid"]: r["n_in_range"] for r in range_count(pdf, idf, bucket_us=bucket).collect()}
    for q, (lo, w) in enumerate(ivs):
        want = sum(1 for t in pts if lo <= t <= lo + w)
        assert got[q] == want, (q, lo, w, bucket, got[q], want)


@settings(**_SETTINGS)
@given(
    scores=st.lists(st.integers(0, 5), min_size=1, max_size=15),
    desc=st.booleans(),
)
def test_global_rank_matches_sorted(spark, scores, desc):
    from essentials_spark.ops.rank import global_rank

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(scores)], "doc_id long, score long"
    )
    got = {r["doc_id"]: r["rank"] for r in global_rank(df, "score", "doc_id", descending=desc).collect()}
    order = sorted(range(len(scores)), key=lambda i: (-scores[i] if desc else scores[i], i))
    want = {i: pos + 1 for pos, i in enumerate(order)}
    assert got == want
