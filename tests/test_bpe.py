"""BPE training: the distributed trainer must match a pure-Python
reference implementation EXACTLY (merge list, tie-breaks, counts), and
the Arrow-batched encoder must agree with reference encoding per doc."""

import re

from pyspark.sql import functions as F

from heatmap_spark.operators.dedup import TOKEN_SPLIT
from heatmap_spark.operators.textops import (
    bpe_encode_df,
    bpe_merges,
    bpe_token_counts,
    bpe_train_merges,
)
from heatmap_spark.sources.tables import load_table


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Textbook BPE trainer (Sennrich et al. 2016) with the same
    deterministic tie-breaks as the Spark implementation: arg-max pair
    by (count desc, left asc, right asc); greedy left-to-right
    replacement."""
    vocab = {w: list(w) + ["</w>"] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            c = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        m = l + r
        merges.append((l, r, m, c))
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = m
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


def _word_counts(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.filter(
                    F.split(F.lower("text"), TOKEN_SPLIT), lambda t: t != ""
                )
            ).alias("w")
        )
        .groupBy("w")
        .count()
        .collect()
    )
    return {r["w"]: r["count"] for r in rows}


def test_bpe_trainer_matches_reference_exactly(spark, sf_smoke):
    wc = _word_counts(spark, sf_smoke)
    want, ref_vocab = _reference_bpe(wc, 25)
    docs = load_table(spark, sf_smoke, "documents").select("text")
    got = bpe_train_merges(docs, 25)
    assert got == want, f"first divergence: {next((a, b) for a, b in zip(got, want) if a != b)}"

    # encoder agreement: every trained word encodes to its final vocab
    ddf = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    enc = {r["doc_id"]: r for r in bpe_encode_df(ddf, got).collect()}
    splitter = re.compile(TOKEN_SPLIT)
    for row in ddf.limit(50).collect():
        words = [w for w in splitter.split((row["text"] or "").lower()) if w]
        n_ref = sum(len(ref_vocab[w]) for w in words)
        assert enc[row["doc_id"]]["n_bpe_tokens"] == n_ref
        assert enc[row["doc_id"]]["n_words"] == len(words)


def test_bpe_declared_queries_self_check(spark, sf_smoke):
    m = bpe_merges(spark, sf_smoke, n_merges=15)
    rows = m.orderBy("rank").collect()
    assert len(rows) == 15
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    tc = bpe_token_counts(spark, sf_smoke, n_merges=15)
    assert tc.where(F.col("n_bpe_tokens") < F.col("n_words")).count() == 0
