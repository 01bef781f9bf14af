"""Round-3 wave 18: deterministic Bloom-filter FPR audit and manual
HyperLogLog with exact-integer register sums. Pure-Python recomputes
keep both engines honest."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pytest

from clickhouse_forecasting_spark.queries import SPARK_QUERIES
from clickhouse_forecasting_spark.sources import read_table


@pytest.fixture(scope="module")
def qs():
    return SPARK_QUERIES


def test_bloom_filter_fpr_matches_python(spark, sf_dir, qs):
    r = qs["bloom_filter_fpr_audit"](spark, sf_dir).collect()[0]
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate").collect()
    a = {x.o_custkey for x in orders if x.o_orderdate.year == 1996}
    b = {x.o_custkey for x in orders if x.o_orderdate.year == 1997}
    probes = b - a

    def bits(c):
        return {
            int(hashlib.md5(f"bf{i}_{c}".encode()).hexdigest()[:8], 16) % 256
            for i in range(4)
        }

    filt = set()
    for c in a:
        filt |= bits(c)
    fp = sum(1 for c in probes if bits(c) <= filt)
    assert r.n_inserted == len(a)
    assert r.n_bits_set == len(filt)
    assert r.n_true_negative_probes == len(probes)
    assert r.n_false_positives == fp
    assert r.fpr_ppm == fp * 1000000 // len(probes)
    # a saturated filter reports ~1e6 ppm; theory must be in [0, 1e6]
    assert 0 <= r.theory_fpr_ppm <= 1000000


def test_hll_manual_audit_matches_python(spark, sf_dir, qs):
    out = {r.event_type: r for r in
           qs["hll_manual_audit"](spark, sf_dir).collect()}
    users = defaultdict(set)
    for e in read_table(spark, sf_dir, "events").select(
            "event_type", "user_id").collect():
        users[e.event_type].add(e.user_id)
    m = 64
    alpha = 0.7213 / (1.0 + 1.079 / m)
    for t, us in users.items():
        regs = [0] * m
        for u in us:
            x = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
            b = x % m
            w = x // m
            rho = 55 - (w.bit_length() if w > 0 else 0)
            regs[b] = max(regs[b], rho)
        z_scaled = sum(2 ** (55 - M) for M in regs)
        raw = alpha * m * m * float(2 ** 55) / z_scaled
        v = regs.count(0)
        est = m * math.log(m / v) if (raw <= 2.5 * m and v > 0) else raw
        r = out[t]
        assert r.exact_uniques == len(us)
        assert math.isclose(r.hll_estimate, est, rel_tol=1e-6, abs_tol=1e-3)
        # HLL with m=64 has ~13% standard error; pin a loose envelope
        assert abs(r.hll_estimate - len(us)) / len(us) < 0.5
        assert r.signed_err_ppm == math.floor(
            (est - len(us)) * 1000000 / len(us)
        )
