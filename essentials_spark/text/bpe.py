"""BPE merge induction — tokenizer training as a gated operator.

Classic byte-pair-encoding trains on the corpus WORD-FREQUENCY table
(Sennrich et al. 2016): each round counts adjacent symbol pairs
weighted by word frequency, merges the most frequent pair, and
rewrites the symbol sequences. Everything here is exact integer
algebra plus string ops with identical semantics in Spark and DuckDB,
so the full merge trajectory replays bit-for-bit in SQL:

- pair counts: explode adjacent (sym[i], sym[i+1]) pairs, Σ word
  counts — BIGINTs;
- the winner: max count, ties to the lexicographically smaller pair
  (min over (-cnt, pair) — the engine's standard argmax idiom);
- the rewrite: simultaneous merge of EVERY occurrence of the winning
  pair within the round (Sennrich semantics), via the doubled-space
  form: internal separators are doubled (' a b ' -> ' a  b ') so
  adjacent occurrences no longer share a boundary space, one
  non-overlapping left-to-right replace of ' a  b ' hits them all
  (greedy left-to-right on genuine overlaps like 'a a a', exactly as
  reference BPE), and collapsing '  ' -> ' ' restores the canonical
  form. replace() scans identically in Spark and DuckDB, so the
  trajectory stays bit-exact in both engines.

Scale shape per round: the state is the distinct-WORD table (corpus
vocabulary — bounded, not corpus-scale; one groupBy derives it), and
each round is one explode + one sum + a 1-row argmax + a narrow
rewrite projection. 10^12 turns change the word COUNTS, not the
table's size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the corpus word-frequency table (whitespace
    tokens, the engine's token convention). One shuffle."""
    return (
        docs.select(F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _char_spaced(col) -> F.Column:
    # 'hello' -> 'h e l l o' (initial symbol sequence = characters)
    return F.concat_ws(" ", F.filter(F.split(col, ""), lambda c: c != F.lit("")))


def bpe_train(
    docs: DataFrame, merges: int = 6, text_col: str = "text"
) -> DataFrame:
    """Run ``merges`` BPE rounds; returns the merge table
    (merge_idx, left, right, pair_cnt) — the tokenizer artifact a
    training pipeline ships. Deterministic; the per-round winner is
    collected driver-side (1 row) and inlined into the next round's
    rewrite expression, so the loop is driver-bounded at O(merges)."""
    from essentials_spark.engine.superstep import truncate_plan

    wf = truncate_plan(
        word_freq(docs, text_col).select(
            "cnt", _char_spaced(F.col("word")).alias("s")
        )
    )
    rows = []
    for r in range(merges):
        arr = F.split(F.col("s"), " ")
        pairs = (
            wf.select(
                "cnt",
                F.explode(
                    F.arrays_zip(
                        F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
                        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
                    )
                ).alias("p"),
            )
            .select("cnt", F.col("p")["0"].alias("l"), F.col("p")["1"].alias("r"))
            .groupBy("l", "r")
            .agg(F.sum("cnt").alias("c"))
        )
        top = pairs.select(
            F.min(
                F.struct(
                    (-F.col("c")).alias("nc"),
                    F.concat(F.col("l"), F.lit(" "), F.col("r")).alias("p"),
                    F.col("l").alias("l"),
                    F.col("r").alias("r"),
                    F.col("c").alias("c"),
                )
            ).alias("w")
        ).collect()[0]["w"]
        if top is None:
            break
        left, right, cnt = top["l"], top["r"], int(top["c"])
        rows.append((r, left, right, cnt))
        # doubled-space form: every occurrence owns its flanking
        # spaces, so ONE non-overlapping replace merges all of them
        # in this round (back-to-back 'a b a b' included); runs of
        # exactly two spaces remain afterwards, one collapse pass
        # restores canonical single-space separators
        pat = f" {left}  {right} "
        rep = f" {left}{right} "
        padded = F.concat(
            F.lit(" "), F.replace(F.col("s"), F.lit(" "), F.lit("  ")), F.lit(" ")
        )
        wf = truncate_plan(
            wf.select(
                "cnt",
                F.trim(
                    F.replace(
                        F.replace(padded, F.lit(pat), F.lit(rep)),
                        F.lit("  "),
                        F.lit(" "),
                    )
                ).alias("s"),
            )
        )
    spark = docs.sparkSession
    return spark.createDataFrame(
        rows, "merge_idx long, left string, right string, pair_cnt long"
    )


def bpe_vocab(
    docs: DataFrame,
    merge_table: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """(token, token_id, n_words): the tokenizer vocabulary induced by
    the merge table over the corpus — every distinct symbol remaining
    after the merge cascade, with a dense lexicographic id and the
    number of distinct corpus WORDS containing it. The third artifact
    a pipeline ships alongside the merge table and the encoder
    (merges -> vocab -> encode); ids are assignment-stable because
    they come from the sorted symbol set, not discovery order.

    One explode over the (bounded) vocabulary-scale word table, one
    distinct aggregate; the ranking window runs over DISTINCT symbols
    (vocabulary-bounded, not corpus-bounded)."""
    from pyspark.sql import Window

    ordered = [
        (r["left"], r["right"]) for r in merge_table.orderBy("merge_idx").collect()
    ]
    wf = word_freq(docs, text_col).select(_char_spaced(F.col("word")).alias("s"))
    for left, right in ordered:
        pat, rep = f" {left}  {right} ", f" {left}{right} "
        padded = F.concat(
            F.lit(" "), F.replace(F.col("s"), F.lit(" "), F.lit("  ")), F.lit(" ")
        )
        wf = wf.select(
            F.trim(
                F.replace(F.replace(padded, F.lit(pat), F.lit(rep)), F.lit("  "), F.lit(" "))
            ).alias("s")
        )
    toks = wf.select(F.explode(F.array_distinct(F.split(F.col("s"), " "))).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("n_words"))
    w = Window.orderBy("token")
    return counts.select(
        "token", (F.row_number().over(w) - 1).cast("long").alias("token_id"), "n_words"
    )


def bpe_encode(
    docs: DataFrame,
    merge_table: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize ``docs`` with a trained merge table (the artifact
    :func:`bpe_train` ships): per word, start from characters and
    apply every merge in merge_idx order with the same doubled-space
    simultaneous rewrite as training. Returns
    (id_col, n_tokens, n_words) — subword count and word count per doc.

    The merge table is tokenizer-sized (driver-collected, O(merges)
    rows) and the per-merge rewrite is one narrow JVM projection over
    the doc scan — applying a v-merge tokenizer is v chained
    projections in ONE whole-stage-codegen pass, no shuffle, no
    Python. Word boundaries never merge (words are rewritten
    independently via per-word transform), matching BPE semantics.
    """
    ordered = [
        (r["left"], r["right"])
        for r in merge_table.orderBy("merge_idx").collect()
    ]
    words = F.filter(F.split(F.trim(F.col(text_col)), " "), lambda x: F.length(x) > 0)
    # per-word char-spacing, then the merge cascade inside ONE
    # transform lambda chain (applies to each word independently)
    def encode_word(wcol):
        s = F.concat_ws(" ", F.filter(F.split(wcol, ""), lambda c: c != F.lit("")))
        for left, right in ordered:
            pat, rep = f" {left}  {right} ", f" {left}{right} "
            padded = F.concat(F.lit(" "), F.replace(s, F.lit(" "), F.lit("  ")), F.lit(" "))
            s = F.trim(F.replace(F.replace(padded, F.lit(pat), F.lit(rep)), F.lit("  "), F.lit(" ")))
        return F.size(F.split(s, " "))

    tok_counts = F.transform(words, encode_word)
    return docs.select(
        F.col(id_col),
        F.aggregate(tok_counts, F.lit(0).cast("long"), lambda a, x: a + x).alias("n_tokens"),
        F.size(words).cast("long").alias("n_words"),
    )
