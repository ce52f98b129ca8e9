"""Monroe log-odds lexical drift against a brute-force reference."""

import math

import numpy as np
import pyarrow as pa
import pytest


def test_log_odds_bruteforce(ray_session):
    import ray.data

    from mothray.ops.webtext import log_odds_terms

    docs = (
        ["apple banana apple cherry"] * 20
        + ["banana date date fig grape"] * 20
    )
    src = ["s0"] * 20 + ["s1"] * 20
    tbl = pa.table({"text": pa.array(docs), "source": pa.array(src)})
    out = log_odds_terms(
        ray.data.from_arrow(tbl), "text", "source", "s0", min_count=5, top_k=3
    ).take_all()
    # brute force
    from collections import Counter

    ca: Counter = Counter()
    cb: Counter = Counter()
    for d, s in zip(docs, src):
        for w in d.split(" "):
            (ca if s == "s0" else cb)[w] += 1
    na, nb = sum(ca.values()), sum(cb.values())
    rows = []
    for t in set(ca) | set(cb):
        A, B = ca[t], cb[t]
        if A + B < 5:
            continue
        da = math.log((A + 0.5) / (na + 1.0 - A - 0.5))
        db = math.log((B + 0.5) / (nb + 1.0 - B - 0.5))
        z = (da - db) / math.sqrt(1.0 / (A + 0.5) + 1.0 / (B + 0.5))
        rows.append((t, A, B, round(z, 6)))
    rows.sort(key=lambda r: (-r[3], r[0]))
    want_a = rows[:3]
    rows.sort(key=lambda r: (r[3], r[0]))
    want_b = rows[:3]
    got_a = [(r["term"], r["ca"], r["cb"], r["z"]) for r in out if r["direction"] == "a"]
    got_b = [(r["term"], r["ca"], r["cb"], r["z"]) for r in out if r["direction"] == "b"]
    assert got_a == [(t, a, b, pytest.approx(z, abs=2e-6)) for t, a, b, z in want_a]
    assert got_b == [(t, a, b, pytest.approx(z, abs=2e-6)) for t, a, b, z in want_b]
    # apple is distinctly s0, date distinctly s1
    assert got_a[0][0] == "apple"
    assert got_b[0][0] == "date"
