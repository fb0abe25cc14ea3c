"""Round-5b training-pipeline text ops: packing, contamination, repetition."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pdocs(spark):
    rows = [
        # (doc_id, text, source) — token counts 3, 4, 2, 5, 1
        (0, "a b c", "s0"),
        (1, "d e f g", "s0"),
        (2, "h i", "s0"),
        (3, "j k l m n", "s0"),
        (4, "o", "s1"),
        # oversized doc (9 tokens > budget 8 below)
        (5, "p q r s t u v w x", "s1"),
        (6, "y z", "s1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_pack_sequences_window(spark, pdocs):
    from essentials_spark.text.packing import pack_sequences

    out = {r["doc_id"]: r.asDict() for r in pack_sequences(pdocs, budget=8).collect()}
    # s0 cumsums: doc0 before=0, doc1 before=3, doc2 before=7, doc3 before=9
    assert out[0]["seq_id"] == "s0:0" and out[0]["offset_in_seq"] == 0
    assert out[1]["seq_id"] == "s0:0" and out[1]["offset_in_seq"] == 3
    assert out[2]["seq_id"] == "s0:0" and out[2]["offset_in_seq"] == 7
    assert out[3]["seq_id"] == "s0:1" and out[3]["offset_in_seq"] == 1
    # s1: doc4 before=0; doc5 before=1 -> seq 0; doc6 before=10 -> seq 1
    assert out[4]["seq_id"] == "s1:0"
    assert out[5]["seq_id"] == "s1:0" and out[5]["tokens"] == 9
    assert out[6]["seq_id"] == "s1:1" and out[6]["offset_in_seq"] == 2


def test_pack_ffd_invariants(spark, pdocs):
    from essentials_spark.text.packing import pack_sequences_ffd

    budget = 8
    out = pack_sequences_ffd(pdocs, budget=budget).collect()
    # disjoint cover: every doc packed exactly once
    assert sorted(r["doc_id"] for r in out) == list(range(7))
    # capacity: no sequence exceeds budget unless it is a single
    # oversized doc
    per_seq = {}
    for r in out:
        per_seq.setdefault(r["seq_id"], []).append(r["tokens"])
    for toks in per_seq.values():
        assert sum(toks) <= budget or (len(toks) == 1 and toks[0] > budget)
    # FFD on s0 (tokens 5,4,3,2 desc): bins [5+3],[4+2] -> 2 bins
    s0_bins = {r["seq_id"] for r in out if r["source"] == "s0"}
    assert len(s0_bins) == 2
    # determinism
    out2 = pack_sequences_ffd(pdocs, budget=budget).collect()
    assert sorted(map(str, out)) == sorted(map(str, out2))


def test_pack_ffd_sharding_bounds_group(spark, pdocs):
    from essentials_spark.text.packing import pack_sequences_ffd

    out = pack_sequences_ffd(pdocs, budget=8, n_shards=4).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(7))
    # seq ids carry the shard: source:shard:bin
    assert all(len(r["seq_id"].split(":")) == 3 for r in out)


def test_packing_stats(spark, pdocs):
    from essentials_spark.text.packing import pack_sequences_ffd, packing_stats

    packed = pack_sequences_ffd(pdocs, budget=8)
    st = {r["source"]: r.asDict() for r in packing_stats(packed, budget=8).collect()}
    assert st["s0"]["n_docs"] == 4 and st["s0"]["total_tokens"] == 14
    assert st["s0"]["n_seqs"] == 2 and st["s0"]["max_seq_tokens"] == 8
    # fill = 14 / 16 -> 875000 ppm
    assert st["s0"]["fill_ppm"] == 875000


def test_ngram_contamination(spark):
    from essentials_spark.text.contamination import decontaminate, ngram_contamination

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (0, "x alpha beta gamma y"),  # shares 'alpha beta gamma'
            (1, "alpha beta x gamma delta"),  # shares no 3-gram
            (2, "clean document entirely"),
            (3, "alpha beta"),  # SHORTER than n: emits no grams, never flags
        ],
        "doc_id long, text string",
    )
    hits = {r["doc_id"]: r["hit_ngrams"] for r in ngram_contamination(train, bench, n=3).collect()}
    assert hits == {0: 1}
    survivors = sorted(r["doc_id"] for r in decontaminate(train, bench, n=3).collect())
    assert survivors == [1, 2, 3]
    # a sub-n-gram benchmark doc contributes no grams either
    short_bench = spark.createDataFrame([(200, "alpha beta")], "doc_id long, text string")
    assert ngram_contamination(train, short_bench, n=3).count() == 0


def test_repetition_stats(spark):
    from essentials_spark.text.analysis import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "a b a b a b"),  # 3-grams: aba, bab, aba, bab -> 4 total, 2 distinct
            (1, "u v w x"),  # 2 total, 2 distinct
            (2, "z"),  # short: 1 gram ('z'), 1 distinct
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in repetition_stats(docs, n=3).collect()}
    assert out[0]["total_ngrams"] == 4 and out[0]["distinct_ngrams"] == 2
    assert out[0]["dup_ngrams"] == 2 and out[0]["top_tok_cnt"] == 3
    assert out[1]["dup_ngrams"] == 0 and out[1]["top_tok_cnt"] == 1
    assert out[2]["total_ngrams"] == 1 and out[2]["top_tok_cnt"] == 1


def test_repetition_stats_plan_is_narrow(spark):
    """The repetition profile must stay a single narrow projection —
    no shuffle, no explode-regroup."""
    from essentials_spark.text.analysis import repetition_stats

    docs = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    plan = repetition_stats(docs, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dedup_keep_best_argmax_and_ties(spark):
    from essentials_spark.dedup.minhash import dedup_keep_best

    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 40), (5, 50), (6, 50)],
        "id long, cluster long",
    )
    scores = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (4, 1), (5, 7), (6, 7)], "id long, score long"
    )
    out = {r.id: r.keep for r in dedup_keep_best(clusters, scores).collect()}
    # cluster 10: max score 9 tie between 2 and 3 -> min id 2
    # cluster 40: singleton keeps; cluster 50: tie 5/6 -> 5
    assert out == {1: False, 2: True, 3: False, 4: True, 5: True, 6: False}


def test_bpe_merge_trajectory_hand_computed(spark):
    # words: 'aaab' x2, 'ab' x1
    # r0: (a,a)=4 wins; 'a a a b' -> 'aa a b' (non-overlapping replace)
    # r1: (a,b)=3 wins over (aa,a)=2; -> 'aa ab' / 'ab'
    # r2: (aa,ab)=2
    from essentials_spark.text.bpe import bpe_train

    docs = spark.createDataFrame([(0, "aaab aaab"), (1, "ab")], "doc_id long, text string")
    got = [(r.merge_idx, r.left, r.right, r.pair_cnt) for r in bpe_train(docs, merges=3).collect()]
    assert sorted(got) == [(0, "a", "a", 4), (1, "a", "b", 3), (2, "aa", "ab", 2)]


def test_duplicate_spans_hand_computed(spark):
    from essentials_spark.text.spans import duplicate_spans

    docs = spark.createDataFrame(
        [
            (0, "a b c d e"),      # spans: 'a b c','b c d','c d e'
            (1, "x a b c d y"),    # shares 'a b c','b c d'
            (2, "p q r"),          # 1 span, unique
            (3, "u u u u"),        # 'u u u' twice WITHIN the doc -> dup
            (4, "s t"),            # shorter than k -> zeros
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["n_dup_grams"])
        for r in duplicate_spans(docs, k=3).collect()
    }
    assert got == {
        0: (3, 2, 2),
        1: (4, 2, 2),
        2: (1, 0, 0),
        3: (2, 2, 1),
        4: (0, 0, 0),
    }


def test_bpe_merges_back_to_back_occurrences_in_one_round(spark):
    # 'abab' -> 'a b a b': both (a,b) occurrences merge in ROUND 0
    # (Sennrich simultaneous rewrite), so round 1 sees 'ab ab' and
    # the same pair never wins twice — no duplicate merge-table rows
    from essentials_spark.text.bpe import bpe_train

    docs = spark.createDataFrame([(0, "abab")], "doc_id long, text string")
    got = [(r.merge_idx, r.left, r.right, r.pair_cnt) for r in bpe_train(docs, merges=2).collect()]
    assert sorted(got) == [(0, "a", "b", 2), (1, "ab", "ab", 1)]
    pairs = [(l, r) for _, l, r, _ in got]
    assert len(pairs) == len(set(pairs))


def test_bpe_exhausts_gracefully(spark):
    # single 1-char word: no pairs -> empty merge table, no crash
    from essentials_spark.text.bpe import bpe_train

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    assert bpe_train(docs, merges=3).count() == 0


def test_chunk_documents_geometry(spark):
    from pyspark.sql import functions as F

    from essentials_spark.text.packing import chunk_documents

    # 10 tokens, max_len 4, overlap 1 -> stride 3 -> n_chunks =
    # 1 + ceil((10-4)/3) = 3, the minimum covering every token
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    got = sorted(
        (r.chunk_idx, r.start_tok, r.n_toks, r.chunk_text)
        for r in chunk_documents(docs, max_len=4, overlap=1).collect()
    )
    assert got == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 3, 4, "t3 t4 t5 t6"),
        (2, 6, 4, "t6 t7 t8 t9"),
    ]
    # short doc: exactly one chunk
    one = chunk_documents(
        spark.createDataFrame([(2, "a b")], "doc_id long, text string"), max_len=4, overlap=1
    ).collect()
    assert len(one) == 1 and one[0].chunk_text == "a b"
    # coverage invariant on a corpus: every token index lands in >=1 chunk
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, max_len=4, overlap=4)


def test_assign_split_stability(spark):
    from pyspark.sql import functions as F

    from essentials_spark.ops.sample import assign_split

    docs = spark.createDataFrame([(i,) for i in range(5000)], "doc_id long")
    s1 = assign_split(docs)
    frac = {r.split: r.c for r in s1.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert abs(frac["train"] / 5000 - 0.9) < 0.02
    assert abs(frac.get("val", 0) / 5000 - 0.05) < 0.01
    # growing the corpus never reassigns existing keys
    s2 = assign_split(spark.createDataFrame([(i,) for i in range(8000)], "doc_id long"))
    j = s1.withColumnRenamed("split", "a").join(s2.withColumnRenamed("split", "b"), "doc_id")
    assert j.filter("a <> b").count() == 0


def test_bpe_vocab_artifact(spark):
    from essentials_spark.text.bpe import bpe_train, bpe_vocab

    docs = spark.createDataFrame([(0, "abab abab xy"), (1, "ab xy xy")], "doc_id long, text string")
    merges = bpe_train(docs, merges=3)  # (a,b), (x,y), (ab,ab)
    vocab = {r["token"]: (r["token_id"], r["n_words"]) for r in bpe_vocab(docs, merges).collect()}
    # words after merges: 'abab'->[abab], 'xy'->[xy], 'ab'->[ab]
    assert set(vocab) == {"abab", "xy", "ab"}
    # dense lexicographic ids
    assert [t for t, (i, _) in sorted(vocab.items(), key=lambda kv: kv[1][0])] == sorted(vocab)
    assert vocab["xy"][1] == 1 and vocab["abab"][1] == 1 and vocab["ab"][1] == 1
