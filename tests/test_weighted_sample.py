"""weighted_sample_k: integer-exact A-ES selection — parity with a
per-row Python reference of the same scheme, exclusion rules, the
max_weight guard, partition invariance, and a loose statistical check
that weight actually biases inclusion."""

import numpy as np
import pyarrow as pa
import pytest

from mothray.ops import sample
from mothray.ops import text as text_mod


def _fnv(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 1099511628211 + ord(ch)) % (1 << 64)
    return h


def _mix(h: int) -> int:
    M = (1 << 64) - 1
    h = ((h ^ (h >> 30)) * 0xBF58476D1CE4E5B9) & M
    h = ((h ^ (h >> 27)) * 0x94D049BB133111EB) & M
    return h ^ (h >> 31)


def ref_weighted_k(items, k, salt):
    """items: list of (key, weight). Returns the selected key set."""
    scored = []
    for key, w in items:
        if w is None or w < 1:
            continue
        aes = max(_mix(_fnv(f"{salt}{key}#{j}")) for j in range(1, w + 1))
        scored.append((-aes, str(key), key))
    scored.sort(key=lambda t: (t[0], t[2]))
    return [key for _, _, key in scored[:k]]


def _run(items, k, salt, parts=3):
    import ray.data

    t = pa.table(
        {
            "key": pa.array([i[0] for i in items], pa.int64()),
            "weight": pa.array([i[1] for i in items], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(parts)
    got = sample.weighted_sample_k(ds, "key", "weight", k, salt=salt).to_pandas()
    return sorted(got["key"].tolist()), got


def test_matches_reference(ray_session):
    rng = np.random.default_rng(2)
    items = [(int(i), int(rng.integers(1, 9))) for i in range(120)]
    for salt in ("a", "b"):
        got, df = _run(items, 20, salt)
        assert got == sorted(ref_weighted_k(items, 20, salt))
        assert len(df) == 20
        assert set(df.columns) == {"key", "weight"}


def test_exclusions_and_small_n(ray_session):
    items = [(1, 3), (2, 0), (3, None), (4, -2), (5, 1)]
    got, df = _run(items, 10, "s")
    assert got == [1, 5]  # k > eligible rows: all eligible returned


def test_max_weight_guard(ray_session):
    import ray.data

    t = pa.table({"key": pa.array([1], pa.int64()), "weight": pa.array([50_000], pa.int64())})
    with pytest.raises(Exception, match="max_weight"):
        sample.weighted_sample_k(
            ray.data.from_arrow(t), "key", "weight", 1
        ).materialize()


def test_partition_invariance(ray_session):
    items = [(int(i), int(i % 4) + 1) for i in range(60)]
    a, _ = _run(items, 15, "z", parts=1)
    b, _ = _run(items, 15, "z", parts=8)
    assert a == b


def test_weight_biases_inclusion(ray_session):
    """Across many salts, a weight-8 item should be chosen much more
    often than a weight-1 item (P ~ 8/total vs 1/total for k=1)."""
    items = [(0, 8)] + [(i, 1) for i in range(1, 25)]
    heavy = light = 0
    for s in range(40):
        sel = ref_weighted_k(items, 1, f"s{s}")  # reference IS the engine rule
        if sel == [0]:
            heavy += 1
        else:
            light += 1
    # E[heavy] = 40 * 8/32 = 10; demand clearly above the 1/32 null rate
    assert heavy >= 5
