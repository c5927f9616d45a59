"""Property tests: state_episodes and event_funnel against pure-Python
references on random event sequences (hypothesis)."""

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401

from heatmap_spark.operators.sessions import event_funnel_df
from heatmap_spark.operators.timeseries import state_episodes_df

TYPES = ["view", "click", "purchase", "signup"]

events_st = st.lists(
    st.tuples(
        st.integers(0, 3),  # user
        st.integers(0, 500),  # seconds offset
        st.integers(0, len(TYPES) - 1),
    ),
    min_size=1,
    max_size=60,
)

T0 = datetime.datetime(2024, 1, 1)


def _df(spark, raw):
    rows = [
        (i, u, T0 + datetime.timedelta(seconds=s), TYPES[t])
        for i, (u, s, t) in enumerate(raw)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def _sorted_user_seqs(raw):
    seqs = {}
    for i, (u, s, t) in enumerate(raw):
        seqs.setdefault(u, []).append((T0 + datetime.timedelta(seconds=s), i, TYPES[t]))
    for u in seqs:
        seqs[u].sort()
    return seqs


@settings(max_examples=15, deadline=None)
@given(events_st)
def test_episodes_match_python_reference(spark, raw):
    seqs = _sorted_user_seqs(raw)
    expected = []
    for u, seq in seqs.items():
        run = []
        for ts, _i, typ in seq:
            if run and run[-1][1] == typ:
                run.append((ts, typ))
            else:
                if run:
                    expected.append((u, run[0][1], run[0][0], run[-1][0], len(run)))
                run = [(ts, typ)]
        if run:
            expected.append((u, run[0][1], run[0][0], run[-1][0], len(run)))
    got = [
        (r.user_id, r.state, r.episode_start, r.episode_end, r.n_events)
        for r in state_episodes_df(_df(spark, raw)).collect()
    ]
    assert sorted(got) == sorted(expected)


@settings(max_examples=15, deadline=None)
@given(events_st)
def test_funnel_matches_python_reference(spark, raw):
    seqs = _sorted_user_seqs(raw)
    n_view = n_click = n_purchase = 0
    for seq in seqs.values():
        fv = fc = fp = None
        for ts, _i, typ in seq:
            if typ == "view" and fv is None:
                fv = ts
            if typ == "click" and fc is None and fv is not None and ts >= fv:
                fc = ts
            if typ == "purchase" and fp is None and fc is not None and ts >= fc:
                fp = ts
        n_view += fv is not None
        n_click += fc is not None
        n_purchase += fp is not None
    row = event_funnel_df(_df(spark, raw)).collect()[0]
    assert (row.n_view, row.n_click_after_view, row.n_purchase_after_funnel) == (
        n_view,
        n_click,
        n_purchase,
    )
    assert row.n_users == len(seqs)


changes_st = st.lists(
    st.tuples(
        st.integers(0, 9),  # key
        st.sampled_from(["U", "D"]),
        st.integers(0, 99),  # payload
        st.integers(0, 50),  # seq
    ),
    min_size=0,
    max_size=20,
)

base_st = st.dictionaries(st.integers(0, 9), st.integers(0, 99), max_size=8)


@settings(max_examples=15, deadline=None)
@given(base_st, changes_st)
def test_merge_upsert_matches_python_reference(spark, base, changes):
    from heatmap_spark.operators.layout import merge_upsert

    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)], "k int, v int"
    ).where("k IS NOT NULL")
    ch_df = spark.createDataFrame(
        [(k, op, v, s) for k, op, v, s in changes] or [(None, None, None, None)],
        "k int, op string, v int, seq int",
    ).where("k IS NOT NULL")

    # python reference: latest change per key wins, ties on seq broken
    # arbitrarily -> restrict to unique (k, seq) pairs to stay deterministic
    seen = {}
    dup = False
    for k, op, v, s in changes:
        if (k, s) in seen:
            dup = True
        seen[(k, s)] = (op, v)
    if dup:
        return  # ambiguous latest-change; skip nondeterministic cases
    latest = {}
    for (k, s), (op, v) in seen.items():
        if k not in latest or s > latest[k][0]:
            latest[k] = (s, op, v)
    expected = dict(base)
    for k, (s, op, v) in latest.items():
        if op == "D":
            expected.pop(k, None)
        else:
            expected[k] = v

    got = {
        r.k: r.v
        for r in merge_upsert(base_df, ch_df, keys=["k"], seq_col="seq").collect()
    }
    assert got == expected
