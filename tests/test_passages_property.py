"""Property tests: duplicated-passage flagging and removal against a
pure-Python reference on random small corpora (hypothesis)."""

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401

from heatmap_spark.operators.dedup import (
    TOKEN_SPLIT,
    duplicated_passages_df,
    remove_duplicated_passages_df,
)

W = 3  # small window so tiny random docs produce real duplicates

# docs as lists of tokens from a tiny alphabet → plenty of genuine
# cross-doc window collisions
corpus_st = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "ab", "x1"]), min_size=0, max_size=10),
    min_size=1,
    max_size=8,
)


def _ref(corpus):
    """Pure-Python reference: window hashes per doc, cross-doc df ≥ 2
    dup set, per-doc stats, covered-token removal."""
    wins = {}  # doc -> [(start, h)]
    for d, toks in enumerate(corpus):
        ws = []
        for i in range(len(toks) - W + 1):
            h = hashlib.md5(" ".join(toks[i : i + W]).encode()).hexdigest()
            ws.append((i, h))
        wins[d] = ws
    df = {}
    for d, ws in wins.items():
        for h in {h for _, h in ws}:
            df[h] = df.get(h, 0) + 1
    dup = {h for h, c in df.items() if c >= 2}
    flags, removed = {}, {}
    for d, toks in enumerate(corpus):
        n = len(wins[d])
        nd = sum(1 for _, h in wins[d] if h in dup)
        frac = round(nd / n, 6) if n else 0.0
        flags[d] = (n, nd, frac)
        cov = set()
        for i, h in wins[d]:
            if h in dup:
                cov.update(range(i, i + W))
        kept = [t for i, t in enumerate(toks) if i not in cov]
        removed[d] = (len(toks), len(cov), " ".join(kept))
    return flags, removed


def _docs_df(spark, corpus):
    return spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in enumerate(corpus)],
        "doc_id long, text string",
    )


@given(corpus_st)
@settings(max_examples=12, deadline=None)
def test_flag_and_removal_match_reference(spark, corpus):
    # tokens are alnum so the TOKEN_SPLIT normalization is the identity
    assert all(re.fullmatch("[a-z0-9]+", t) for toks in corpus for t in toks)
    flags_ref, removed_ref = _ref(corpus)
    docs = _docs_df(spark, corpus)

    got_f = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_frac"])
        for r in duplicated_passages_df(docs, w=W, persist=False).collect()
    }
    assert got_f == flags_ref

    got_r = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in remove_duplicated_passages_df(docs, w=W).collect()
    }
    assert got_r == removed_ref
