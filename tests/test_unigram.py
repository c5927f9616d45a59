"""Unigram-LM tokenizer trainer: exact-match vs a pure-python
reference (the q_bpe_merges verification pattern), Viterbi properties,
and coverage invariants."""

import math
import re

from heatmap_spark.operators.textops import (
    unigram_train,
    unigram_vocab,
    viterbi_segment,
)
from heatmap_spark.sources.tables import load_table


def _py_train(texts, vocab_size=96, max_piece_len=4, em_iters=3, seed_mult=3):
    """Independent reimplementation of the trainer's spec: word counts,
    substring seeding, EM with Viterbi E-step, count-based pruning with
    char retention — driver-side loops instead of Spark aggregates."""
    words: dict[str, int] = {}
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                words[w] = words.get(w, 0) + 1

    scored: dict[str, int] = {}
    for w, c in words.items():
        for ln in range(1, max_piece_len + 1):
            for i in range(0, len(w) - ln + 1):
                p = w[i : i + ln]
                scored[p] = scored.get(p, 0) + c
    top = sorted(scored.items(), key=lambda pc: (-pc[1], pc[0]))[
        : vocab_size * seed_mult
    ]
    chars = {p: c for p, c in scored.items() if len(p) == 1}
    counts = dict(top)
    counts.update(chars)

    def to_logp(cnt):
        total = sum(cnt.values())
        return {p: math.log(c / total) for p, c in cnt.items() if c > 0}

    for it in range(em_iters):
        logp = to_logp(counts)
        est: dict[str, int] = {}
        for w, c in words.items():
            for p in viterbi_segment(w, logp, max_piece_len):
                est[p] = est.get(p, 0) + c
        target = vocab_size if it == em_iters - 1 else vocab_size * 2
        multi = sorted(
            ((p, c) for p, c in est.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        keep_multi = multi[: max(target - len(chars), 0)]
        counts = {p: max(est.get(p, 0), 1) for p in chars}
        counts.update(dict(keep_multi))
    logp = to_logp(counts)
    return sorted(
        ((p, c, logp[p]) for p, c in counts.items() if c > 0),
        key=lambda x: (-x[1], x[0]),
    )


def test_unigram_train_matches_pure_python(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").select("text")
    got = unigram_train(docs)
    texts = [r["text"] for r in docs.collect()]
    want = _py_train(texts)
    assert [(p, c) for p, c, _ in got] == [(p, c) for p, c, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        assert abs(a - b) < 1e-12


def test_viterbi_segmentation_properties():
    logp = {
        "a": -3.0, "b": -3.0, "c": -3.0,
        "ab": -2.0, "bc": -2.5, "abc": -4.5,
    }
    seg = viterbi_segment("abcab", logp, 4)
    assert "".join(seg) == "abcab"
    assert all(len(p) <= 4 and p in logp for p in seg)
    # best path math: ab+c+ab = -2-3-2 = -7 beats a+bc+ab = -7.5 and
    # abc+ab = -6.5?  abc+ab = -4.5-2 = -6.5 — highest, so it wins
    assert seg == ["abc", "ab"]
    # unknown chars fall back to char-split survival
    assert viterbi_segment("zz", {"z": -1.0}, 4) == ["z", "z"]


def test_unigram_vocab_query_invariants(spark, sf_smoke):
    df = unigram_vocab(spark, sf_smoke)
    rows = df.collect()
    assert rows
    counts = [r["count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert abs(sum(math.exp(r["logprob"]) for r in rows) - 1.0) < 1e-6
    assert all(1 <= len(r["piece"]) <= 4 for r in rows)
    # it actually learned multi-char pieces
    assert any(len(r["piece"]) > 1 for r in rows)


def test_worker_viterbi_copy_matches_module_function(spark):
    """The kernel carries an inlined viterbi copy (pickle-by-value
    constraint); this pins it equal to the module-level function so
    the two can never drift."""
    import random


    from heatmap_spark.operators.textops import _unigram_estep_counts

    rng = random.Random(7)
    words = [
        "".join(rng.choice("abcd") for _ in range(rng.randint(1, 9)))
        for _ in range(60)
    ]
    logp = {"a": -2.0, "b": -2.2, "c": -2.4, "d": -2.6,
            "ab": -1.5, "bcd": -1.8, "cd": -2.0, "abcd": -3.7}
    wdf = spark.createDataFrame(
        [(w, i + 1) for i, w in enumerate(words)], "w string, cnt long"
    )
    got = {
        r["piece"]: r["c"]
        for r in _unigram_estep_counts(wdf, logp, 4).collect()
    }
    want: dict[str, int] = {}
    for i, w in enumerate(words):
        for p in viterbi_segment(w, logp, 4):
            want[p] = want.get(p, 0) + i + 1
    assert got == want
