"""Property test for the merge-on-read rule: resolve_log vs a pure-Python
model over randomized per-key add/tombstone histories.

The hand-written cases in test_frontier_commits.py pin the four canonical
shapes; this drives the rule through arbitrary interleavings (multiple
adds per key, multiple tombstones, same-wave collisions, re-adds after
deep tombstone histories) — the exact event soup a 10^10-URL frontier log
accumulates over hundreds of waves.  Each Spark job batches many
independent keys, so a handful of hypothesis examples covers hundreds of
scenarios without per-example job overhead.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from auto_ria_spark.plans.crawl import FRONTIER_COLS, resolve_log
from auto_ria_spark.util import local_df

# one key's history: up to 6 events of ('a'|'d', wave 0..5) — duplicates
# and same-wave add+del collisions included on purpose
_EVENT = st.tuples(st.sampled_from(["a", "d"]), st.integers(0, 5))
_HISTORY = st.lists(_EVENT, min_size=1, max_size=6)


def _model_live_adds(history: list[tuple[str, int]]) -> int:
    """The rule: an addition survives iff NO tombstone on its key carries
    a STRICTLY later wave (same-wave requeues survive their consumption).
    Returns how many additions survive — resolve_log keeps every
    surviving add row, not one-per-key."""
    dels = [w for op, w in history if op == "d"]
    dw = max(dels) if dels else None
    return sum(1 for op, w in history if op == "a"
               and (dw is None or dw <= w))


@settings(max_examples=8, deadline=None)
@given(st.lists(_HISTORY, min_size=1, max_size=40))
def test_resolve_log_matches_model_on_random_histories(spark, histories):
    spark_session = spark  # session-scoped shared fixture (conftest)
    rows = []
    for key, history in enumerate(histories):
        for op, wave in history:
            if op == "a":
                rows.append((f"u{key}", key, "h", "car", 2, 0, 0, 0, 0,
                             1, wave, None, None, "a", wave))
            else:  # tombstone: key + nulls (log_dels shape)
                rows.append((None, key, None, None, None, None, None,
                             None, None, None, None, None, None,
                             "d", wave))
    raw = local_df(
        spark_session, rows,
        "url_norm string, url_hash long, host string, kind string,"
        " kind_rank int, page_index int, pos_on_page int, attempt int,"
        " not_before long, discovery_rank long, discovered_wave int,"
        " priority_price int, priority_freshness long,"
        " __op string, __fwave int")
    got = {r["url_hash"]: r["n"] for r in
           resolve_log(raw, "url_hash", FRONTIER_COLS)
           .groupBy("url_hash").agg(F.count("*").alias("n")).collect()}
    want = {key: n for key, history in enumerate(histories)
            if (n := _model_live_adds(history)) > 0}
    assert got == want
