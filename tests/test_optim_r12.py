"""Round-12 optimization pins.

1. The sessionizer state-bound replay pins its state-shuffle width to
   the TTL-bounded state scale (streaming.replay.pinned_state_partitions,
   VERDICT r11 #6) — the width must not change WHAT is emitted, and the
   session-wide shuffle-partitions setting must be restored afterwards.
   The expected row is computed from the corpus constants (the same
   literals the DuckDB twin uses), so a width-dependent drop/double-emit
   breaks the equality, not just a self-comparison.
2. connected_components_star frees each round's large-star intermediate
   once the round's result is materialized (ADVICE r11): after the call
   no persisted RDDs attributable to the call may remain.
"""

from __future__ import annotations

from clickhouse_forecasting_spark.operators.graph import (
    connected_components_star,
)


def test_state_bound_audit_state_parts_invariant(spark, sf_dir, monkeypatch):
    from clickhouse_forecasting_spark import queries as _q

    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_PARTS", "3")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    row = _q.q_streaming_state_bound_audit(spark, sf_dir).collect()[0]
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    # cohort A (2000 users): day-1 only — 10:00/10:10/12:00 = 2 sessions,
    # 3 events; cohort B (2000): + day-5 pair (1 session) + day-6 single
    # (1 session) = 4 sessions, 6 events; TTL evicts A by the final batch
    assert (
        row.n_users,
        row.total_sessions,
        row.total_events,
        row.state_rows_final,
        row.state_rows_all_time,
    ) == (4000, 2000 * 2 + 2000 * 4, 2000 * 3 + 2000 * 6, 2000, 4000)


def test_components_star_releases_round_intermediates(spark):
    jsc = spark.sparkContext._jsc
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40)]  # one 41-node chain
        + [(100, 101), (101, 102)],
        "id_a int, id_b int",
    )
    before_ids = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}
    comps, rounds = connected_components_star(edges)
    got = {r.id: r.component for r in comps.collect()}
    assert rounds >= 2  # multi-round: intermediates existed and were freed
    assert got[40] == 0 and got[102] == 100
    after_ids = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}
    leaked = after_ids - before_ids
    # live by design: the initial edge checkpoint (the returned frame
    # recomputes `nodes` from it) and the final round's checkpoint (it
    # IS the converged edge set the frame joins). Every per-round half
    # persist and superseded round checkpoint must be released
    # synchronously — with >= 2 rounds the r11 code left >= 2 extra.
    assert len(leaked) <= 2, f"round intermediates leaked: {leaked}"
