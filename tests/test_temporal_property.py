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
