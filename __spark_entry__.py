"""Driver contract for the spark-graft builder (PySpark target).

Queries run the essentials_spark engine over a graph derived
deterministically from the ``events`` table (events -> transcript turns
-> turn-adjacency + tool-link edges, string-keyed vertices), plus text
/ dedup / ANN operators over ``documents`` and ``embeddings``. Each
oracle is ANSI SQL computing the identical result in DuckDB — iterative
algorithms are unrolled to a fixed superstep count on both sides.

Float outputs are emitted as rounded integers (ppm) or round(x, 6) so
cross-engine summation-order noise (~1e-15) cannot flip a value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ALPHA = 0.85
PR_ITERS = 20
CC_ROUNDS = 26  # Spark CC converges by ~19 supersteps at sf0.01; margin on top
LP_ROUNDS = 5
ANN_K = 5
ANN_NQ = 5

_graph_cache: dict = {}


def _keyed_graph(spark: SparkSession, sf_dir: str, membership: bool = False):
    from essentials_spark.graph.keyed import keyed_graph_from_events

    key = (id(spark), sf_dir, membership)
    if key not in _graph_cache:
        _graph_cache[key] = keyed_graph_from_events(spark, sf_dir, include_conv_membership=membership)
    return _graph_cache[key]


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from essentials_spark.io.transcripts import transcripts_from_events

    return transcripts_from_events(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _transcripts(spark, sf_dir)
    # ts is TIMESTAMP_NTZ: seconds-since-epoch of the wall clock via an
    # NTZ-to-NTZ diff (session-timezone-independent, matches DuckDB's
    # epoch() on naive timestamps)
    epoch0 = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return t.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.timestamp_diff("MICROSECOND", epoch0, F.col("ts")).alias("ts_epoch_us"),
    )


def q_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    kg = _keyed_graph(spark, sf_dir)
    return kg.key_edges.select("src_key", "dst_key")


def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # log2-bucketed degree histogram of the symmetrized graph
    # (reference graph.hxx:371-404)
    from essentials_spark.graph.derive import canonicalize_edges

    kg = _keyed_graph(spark, sf_dir)
    sym = canonicalize_edges(kg.graph.edges, symmetrize=True, dedup=True, drop_self_loops=True)
    deg = sym.groupBy("src").agg(F.count("*").alias("d"))
    return (
        deg.groupBy(F.floor(F.log2("d")).cast("long").alias("bucket"))
        .agg(F.count("*").alias("n_vertices"))
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from essentials_spark.algos import pagerank

    kg = _keyed_graph(spark, sf_dir)
    # tol=0.0 -> exactly PR_ITERS supersteps (err < 0.0 is never true),
    # matching the SQL oracle's unrolled iteration count
    ranks = pagerank(kg.graph, alpha=ALPHA, tol=0.0, max_iter=PR_ITERS)
    return ranks.join(kg.vkeys, "vid").select(
        "skey", F.round(F.col("rank") * 1e6).cast("long").alias("score_ppm")
    )


def q_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from essentials_spark.algos import connected_components

    kg = _keyed_graph(spark, sf_dir)
    labels = connected_components(kg.graph)
    # component label -> canonical string key (min vid == min skey by
    # construction: vids are the global rank of skey)
    lab_keys = kg.vkeys.select(F.col("vid").alias("label"), F.col("skey").alias("component"))
    return labels.join(kg.vkeys, "vid").join(lab_keys, "label").select("skey", "component")


def q_lp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from essentials_spark.algos import label_propagation

    kg = _keyed_graph(spark, sf_dir)
    labels = label_propagation(kg.graph, max_iter=LP_ROUNDS)
    lab_keys = kg.vkeys.select(F.col("vid").alias("label"), F.col("skey").alias("lp_label"))
    return labels.join(kg.vkeys, "vid").join(lab_keys, "label").select("skey", "lp_label")


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from essentials_spark.algos import triangle_count

    kg = _keyed_graph(spark, sf_dir, membership=True)
    per_vertex, _total = triangle_count(kg.graph)
    return per_vertex.join(kg.vkeys, "vid").select("skey", F.col("tc").cast("long").alias("tc"))


def q_tc_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from essentials_spark.algos import triangle_count

    kg = _keyed_graph(spark, sf_dir, membership=True)
    _per_vertex, total = triangle_count(kg.graph)
    return spark.createDataFrame(
        [(int(total), int(total) // 3)], "corner_total bigint, n_triangles bigint"
    )


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from essentials_spark.text.analysis import token_stats

    return token_stats(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "n_distinct_tokens", "n_chars_actual"
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from essentials_spark.text.analysis import doc_fingerprint

    return doc_fingerprint(_docs(spark, sf_dir)).select("doc_id", "fingerprint")


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from essentials_spark.text.analysis import quality_score

    return quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "n_punct", "n_digit", "distinct_ratio", "quality"
    )


def q_lang_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    from essentials_spark.text.analysis import language_id

    return language_id(_docs(spark, sf_dir)).select("doc_id", "lang_pred")


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from essentials_spark.ann.cosine import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = brute_force_topk(emb.filter(F.col("vec_id") < ANN_NQ), emb, k=ANN_K)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("sim") * 1e6).cast("long").alias("sim_e6"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from essentials_spark.text.analysis import exact_dedup

    return exact_dedup(_docs(spark, sf_dir)).select("doc_id", "dup_count")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts_from_events": q_transcripts,
        "edge_derivation": q_edges,
        "degree_histogram": q_degree_histogram,
        "pagerank": q_pagerank,
        "connected_components": q_cc,
        "label_propagation": q_lp,
        "triangle_count": q_triangles,
        "tc_total": q_tc_total,
        "doc_stats": q_doc_stats,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_quality": q_doc_quality,
        "lang_pred": q_lang_pred,
        "ann_topk": q_ann_topk,
        "exact_dedup": q_exact_dedup,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the transcript graph at sf0.001."""
    return q_pagerank(spark, "/root/testdata/sf0.001").orderBy(F.desc("score_ppm"), "skey").limit(50)


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB)
# ---------------------------------------------------------------------------

_TURNKEY = "'turn|' || conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 6, '0')"

_PRELUDE = f"""
ev AS (
  SELECT event_id, ts, user_id, event_type, props,
         printf('conv%06d', user_id) AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx
  FROM events
),
tr AS (
  SELECT conv_id, turn_idx,
         CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         coalesce(props, '') AS text,
         CASE WHEN event_id % 3 = 0 THEN event_type END AS tool,
         ts
  FROM ev
),
turnv AS (SELECT {_TURNKEY} AS vkey, conv_id, turn_idx FROM tr),
toolv AS (SELECT DISTINCT 'tool|' || tool AS vkey FROM tr WHERE tool IS NOT NULL),
verts AS (SELECT vkey FROM turnv UNION ALL SELECT vkey FROM toolv),
adje AS (
  SELECT src, dst FROM (
    SELECT vkey AS src, lead(vkey) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS dst FROM turnv
  ) WHERE dst IS NOT NULL
),
toole AS (SELECT {_TURNKEY} AS src, 'tool|' || tool AS dst FROM tr WHERE tool IS NOT NULL),
edges_k AS (SELECT src, dst FROM adje UNION ALL SELECT src, dst FROM toole),
sym AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges_k UNION ALL SELECT dst AS src, src AS dst FROM edges_k
  ) WHERE src <> dst
)
"""

# membership-augmented variant (conv vertices + conv->turn edges)
_PRELUDE_M = (
    _PRELUDE.replace(
        "verts AS (SELECT vkey FROM turnv UNION ALL SELECT vkey FROM toolv),",
        "convv AS (SELECT DISTINCT 'conv|' || conv_id AS vkey FROM tr),\n"
        "verts AS (SELECT vkey FROM turnv UNION ALL SELECT vkey FROM toolv UNION ALL SELECT vkey FROM convv),",
    ).replace(
        "edges_k AS (SELECT src, dst FROM adje UNION ALL SELECT src, dst FROM toole),",
        f"membe AS (SELECT 'conv|' || conv_id AS src, {_TURNKEY} AS dst FROM tr),\n"
        "edges_k AS (SELECT src, dst FROM adje UNION ALL SELECT src, dst FROM toole"
        " UNION ALL SELECT src, dst FROM membe),",
    )
)


def _pagerank_sql() -> str:
    parts = [
        _PRELUDE,
        "outw AS (SELECT src, CAST(count(*) AS DOUBLE) AS ow FROM edges_k GROUP BY src)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        f"ew AS (SELECT e.src, e.dst, {ALPHA} / o.ow AS coef FROM edges_k e JOIN outw o USING (src))",
        "p0 AS (SELECT vkey, 1.0 / nn.n AS score FROM verts, nn)",
    ]
    for i in range(PR_ITERS):
        parts.append(
            f"d{i} AS (SELECT coalesce(sum(p.score), 0.0) * {ALPHA} AS dsum"
            f" FROM p{i} p LEFT JOIN outw o ON o.src = p.vkey WHERE o.src IS NULL)"
        )
        parts.append(
            f"p{i + 1} AS (SELECT v.vkey,"
            f" (1.0 - {ALPHA} + d.dsum) / nn.n + coalesce(c.contrib, 0.0) AS score"
            f" FROM verts v"
            f" LEFT JOIN (SELECT e.dst, sum(p.score * e.coef) AS contrib"
            f"   FROM ew e JOIN p{i} p ON p.vkey = e.src GROUP BY e.dst) c ON c.dst = v.vkey"
            f" CROSS JOIN d{i} d CROSS JOIN nn)"
        )
    body = ",\n".join(parts)
    return (
        f"WITH {body}\n"
        f"SELECT vkey AS skey, CAST(round(score * 1e6) AS BIGINT) AS score_ppm FROM p{PR_ITERS}"
    )


def _cc_sql() -> str:
    parts = [_PRELUDE, "l0 AS (SELECT vkey, vkey AS lab FROM verts)"]
    for i in range(CC_ROUNDS):
        parts.append(
            f"l{i + 1} AS (SELECT l.vkey,"
            f" least(l.lab, coalesce(nm.m, l.lab), coalesce(j.lab, l.lab)) AS lab"
            f" FROM l{i} l"
            f" LEFT JOIN (SELECT e.dst, min(p.lab) AS m FROM sym e JOIN l{i} p ON p.vkey = e.src"
            f"   GROUP BY e.dst) nm ON nm.dst = l.vkey"
            f" LEFT JOIN l{i} j ON j.vkey = l.lab)"
        )
    body = ",\n".join(parts)
    return f"WITH {body}\nSELECT vkey AS skey, lab AS component FROM l{CC_ROUNDS}"


def _lp_sql() -> str:
    parts = [_PRELUDE, "m0 AS (SELECT vkey, vkey AS lab FROM verts)"]
    for i in range(LP_ROUNDS):
        parts.append(
            f"m{i + 1} AS (SELECT l.vkey, coalesce(b.lab, l.lab) AS lab"
            f" FROM m{i} l LEFT JOIN ("
            f"   SELECT dst, lab FROM ("
            f"     SELECT e.dst, p.lab, count(*) AS c,"
            f"       row_number() OVER (PARTITION BY e.dst ORDER BY count(*) DESC, p.lab ASC) AS rn"
            f"     FROM sym e JOIN m{i} p ON p.vkey = e.src GROUP BY e.dst, p.lab"
            f"   ) WHERE rn = 1) b ON b.dst = l.vkey)"
        )
    body = ",\n".join(parts)
    return f"WITH {body}\nSELECT vkey AS skey, lab AS lp_label FROM m{LP_ROUNDS}"


_TRI_BODY = """
und AS (SELECT src, dst FROM sym WHERE src < dst),
tri AS (
  SELECT a.src AS x, a.dst AS y, b.dst AS z
  FROM und a JOIN und b ON b.src = a.dst JOIN und c ON c.src = a.src AND c.dst = b.dst
),
corners AS (
  SELECT v AS vkey, count(*) AS tc FROM (
    SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
  ) GROUP BY v
)
"""


def _materialize_ctes(sql: str) -> str:
    """Force DuckDB to materialize every CTE: the unrolled iterative
    oracles reference each previous iteration 2-3 times, and default
    CTE inlining makes the expansion exponential (observed: fd
    exhaustion from ~2^20 inlined parquet scans)."""
    import re

    return re.sub(r"(\w+) AS \(", r"\1 AS MATERIALIZED (", sql)


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["transcripts_from_events"] = (
        f"WITH {_PRELUDE} SELECT conv_id, turn_idx, role, text, tool,"
        " epoch_us(ts) AS ts_epoch_us FROM tr"
    )

    sql["edge_derivation"] = f"WITH {_PRELUDE} SELECT src AS src_key, dst AS dst_key FROM edges_k"

    sql["degree_histogram"] = (
        f"WITH {_PRELUDE}, deg AS (SELECT src, count(*) AS d FROM sym GROUP BY src)"
        " SELECT CAST(floor(log2(d)) AS BIGINT) AS bucket, count(*) AS n_vertices"
        " FROM deg GROUP BY 1"
    )

    sql["pagerank"] = _pagerank_sql()
    sql["connected_components"] = _cc_sql()
    sql["label_propagation"] = _lp_sql()

    sql["triangle_count"] = (
        f"WITH {_PRELUDE_M}, {_TRI_BODY}"
        " SELECT v.vkey AS skey, coalesce(c.tc, 0) AS tc"
        " FROM verts v LEFT JOIN corners c ON c.vkey = v.vkey"
    )
    sql["tc_total"] = (
        f"WITH {_PRELUDE_M}, {_TRI_BODY}"
        " SELECT CAST(coalesce(sum(tc), 0) AS BIGINT) AS corner_total,"
        " CAST(coalesce(sum(tc), 0) // 3 AS BIGINT) AS n_triangles"
        " FROM corners"
    )

    sql["doc_stats"] = (
        "SELECT doc_id,"
        " CAST(length(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,"
        " CAST(length(list_distinct(string_split(trim(text), ' '))) AS BIGINT) AS n_distinct_tokens,"
        " CAST(length(text) AS BIGINT) AS n_chars_actual"
        " FROM documents"
    )

    sql["doc_fingerprint"] = (
        "SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint"
        " FROM documents"
    )

    sql["doc_quality"] = """
WITH feat AS (
  SELECT doc_id,
    length(string_split(trim(text), ' ')) AS n_tokens,
    length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
    length(list_distinct(string_split(trim(text), ' '))) AS n_distinct
  FROM documents
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, CAST(n_punct AS BIGINT) AS n_punct,
  CAST(n_digit AS BIGINT) AS n_digit,
  round(n_distinct / CAST(n_tokens AS DOUBLE), 6) AS distinct_ratio,
  round(CASE WHEN n_tokens < 5 THEN 0.0 ELSE
    least(1.0, n_tokens / 100.0) * 0.4
    + (1.0 - least(1.0, n_punct / CAST(greatest(n_tokens, 1) AS DOUBLE))) * 0.2
    + (n_distinct / CAST(n_tokens AS DOUBLE)) * 0.4 END, 6) AS quality
FROM feat
"""

    lang_markers = {
        "en": ["the", "and", "of", "to", "a"],
        "es": ["el", "la", "de", "que", "y"],
        "fr": ["le", "la", "de", "et", "un"],
        "de": ["der", "die", "und", "das", "ein"],
    }
    per_lang = " UNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS lang,"
        f" length(list_intersect(toks, {words!r})) AS hits FROM toks"
        for lang, words in lang_markers.items()
    )
    sql["lang_pred"] = f"""
WITH toks AS (
  SELECT doc_id, list_distinct(string_split_regex(lower(text), '\\s+')) AS toks FROM documents
),
scored AS ({per_lang}),
best AS (
  SELECT doc_id, lang, hits,
    row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang DESC) AS rn
  FROM scored
)
SELECT doc_id, CASE WHEN hits > 0 THEN lang ELSE 'und' END AS lang_pred FROM best WHERE rn = 1
"""

    sql["ann_topk"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
p AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    round(list_dot_product(q.v, c.v)
      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
  FROM e q JOIN e c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {ANN_NQ}
),
r AS (
  SELECT query_id, neighbor_id, sim,
    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM p
)
SELECT query_id, neighbor_id, CAST(round(sim * 1e6) AS BIGINT) AS sim_e6,
  CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {ANN_K}
"""

    sql["exact_dedup"] = """
WITH fp AS (
  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f FROM documents
)
SELECT min(doc_id) AS doc_id, count(*) AS dup_count FROM fp GROUP BY f
"""

    return {name: _materialize_ctes(s) for name, s in sql.items()}
