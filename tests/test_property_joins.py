"""Property-based tests (hypothesis): asof_join and merge_upsert vs
exhaustive Python reference implementations on arbitrary small inputs.

asof_join carried the r1 advisor bug (mixed-row backfill of NULL payload
cells); a property test over arbitrary NULL placements is the guard that
a single example test cannot be.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

key_s = st.integers(min_value=1, max_value=3)
ts_s = st.integers(min_value=0, max_value=6)
val_s = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))

left_s = st.lists(st.tuples(key_s, ts_s), min_size=1, max_size=6)
right_s = st.lists(st.tuples(key_s, ts_s, val_s, val_s), min_size=0, max_size=6, unique=True)


def _asof_reference(left, right, strict):
    """Per left row: the matching right row with greatest rt (<= / < lt),
    ties broken by greatest (a, b) struct -- mirrors tie_breakers order.
    NULL payload cells in the winning row stay NULL."""
    out = []
    for lk, lt in left:
        cands = [
            (rt, a, b)
            for (rk, rt, a, b) in right
            if rk == lk and (rt < lt if strict else rt <= lt)
        ]
        if not cands:
            continue
        null_low = lambda v: (v is not None, v if v is not None else 0)  # noqa: E731
        rt, a, b = max(cands, key=lambda c: (c[0], null_low(c[1]), null_low(c[2])))
        out.append((lk, lt, rt, a, b))
    return sorted(out)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=left_s, right=right_s, strict=st.booleans())
def test_asof_join_matches_reference(spark, left, right, strict):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.joins import (
        asof_join,
    )

    ldf = spark.createDataFrame(left, "lk long, lt long")
    rdf = spark.createDataFrame(right, "rk long, rt long, a long, b long")
    got = sorted(
        (r.lk, r.lt, r.rt, r.a, r.b)
        for r in asof_join(
            ldf,
            rdf,
            left_key="lk",
            right_key="rk",
            left_ts="lt",
            right_ts="rt",
            tie_breakers=["a", "b"],
            strict=strict,
        ).collect()
    )
    assert got == _asof_reference(left, right, strict)


pairs_s = st.lists(
    st.tuples(st.integers(min_value=1, max_value=5), st.integers(min_value=0, max_value=9)),
    min_size=0,
    max_size=6,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(target=pairs_s, updates=pairs_s)
def test_merge_upsert_matches_reference(spark, target, updates):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.maintenance import (
        merge_upsert,
    )

    # merge semantics need unique keys per side; dedupe keeping last
    t = {k: v for k, v in target}
    u = {k: v for k, v in updates}
    tdf = spark.createDataFrame(list(t.items()) or [(None, None)], "k long, v long").filter(
        "k IS NOT NULL"
    )
    udf = spark.createDataFrame(list(u.items()) or [(None, None)], "k long, v long").filter(
        "k IS NOT NULL"
    )
    got = {(r.k, r.v) for r in merge_upsert(tdf, udf, "k").collect()}
    assert got == set({**t, **u}.items())
