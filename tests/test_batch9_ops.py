"""Round-4 fifth-batch ops, part 2: Gopher quality rules, Markov
prediction accuracy, deterministic permutation test."""

import numpy as np
import pyarrow as pa


def test_gopher_rules_signals():
    from mothray.ops.webtext import gopher_rules_batch

    good = " ".join(["alpha"] * 60)  # 60 words, 5 chars each -> keep
    hashy = " ".join(["alpha"] * 60) + " " + "#" * 40  # symbol ratio fails
    bullets = "\n".join(["- item one two"] * 10)  # too few words anyway
    short = "tiny doc"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([good, hashy, bullets, short]),
        }
    )
    out = {r["doc_id"]: r for r in gopher_rules_batch(t).to_pylist()}
    assert out[1]["n_words"] == 60
    assert out[1]["sum_word_chars"] == 300
    assert out[1]["n_alpha_words"] == 60
    assert out[1]["keep"] == 1
    assert out[2]["n_hash"] == 40
    assert out[2]["keep"] == 0  # 10*(40+0) > 61 words
    assert out[3]["n_bullet_lines"] == 10
    assert out[3]["n_lines"] == 10
    assert out[3]["keep"] == 0
    assert out[4]["n_words"] == 2
    assert out[4]["keep"] == 0


def test_gopher_rules_ellipsis_and_nulls():
    from mothray.ops.webtext import gopher_rules_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["wait... what... ok...\nline...", None]),
        }
    )
    out = {r["doc_id"]: r for r in gopher_rules_batch(t).to_pylist()}
    # '...' occurrences: non-overlapping, 4 total; 2 lines end with '...'
    assert out[1]["n_ellipsis"] == 4
    assert out[1]["n_ellipsis_lines"] == 2
    assert out[1]["n_lines"] == 2
    assert out[2]["n_words"] == 0
    assert out[2]["n_lines"] == 0
    assert out[2]["keep"] == 0


def test_markov_prediction_accuracy(ray_session):
    import ray.data

    from mothray.ops.markov import prediction_accuracy

    # user 1: a->b, b->a, a->b ; user 2: a->c
    rows = [
        (1, 0, 10, "a"),
        (1, 1, 11, "b"),
        (1, 2, 12, "a"),
        (1, 3, 13, "b"),
        (2, 0, 14, "a"),
        (2, 1, 15, "c"),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    out = {
        r["from_state"]: r
        for r in prediction_accuracy(ray.data.from_arrow(t)).to_pylist()
    }
    # transitions: a->b x2, a->c x1, b->a x1
    assert out["a"]["predicted"] == "b"
    assert out["a"]["n"] == 3
    assert out["a"]["correct"] == 2
    assert out["a"]["acc"] == 2 / 3
    assert out["b"]["predicted"] == "a"
    assert out["b"]["n"] == 1
    assert out["b"]["correct"] == 1
    assert "c" not in out  # 'c' is never a from_state


def test_markov_prediction_tiebreak(ray_session):
    import ray.data

    from mothray.ops.markov import prediction_accuracy

    # from 'x': one transition to 'b' and one to 'a' -> tie, pick 'a'
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "ts": pa.array([0, 1, 0, 1], pa.int64()).cast(pa.timestamp("us")),
            "event_id": pa.array([0, 1, 2, 3], pa.int64()),
            "event_type": pa.array(["x", "b", "x", "a"]),
        }
    )
    out = {
        r["from_state"]: r
        for r in prediction_accuracy(ray.data.from_arrow(t)).to_pylist()
    }
    assert out["x"]["predicted"] == "a"
    assert out["x"]["correct"] == 1
    assert out["x"]["n"] == 2


def test_permutation_test_properties(ray_session):
    import ray.data

    from mothray.ops.moments import permutation_test

    rng = np.random.default_rng(53)
    n = 400
    grp = np.where(rng.random(n) < 0.4, "A", "B")
    # strong real effect: A mean 100, B mean 500
    val = np.where(grp == "A", 100.0, 500.0) + np.round(rng.uniform(0, 10, n), 2)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(np.arange(n), pa.int64()),
                "v": pa.array(val, pa.float64()),
                "g": pa.array(grp),
            }
        )
    )
    out = permutation_test(ds, "v", "id", "g", "A", b=100).to_pylist()[0]
    assert out["n_a"] == int((grp == "A").sum())
    assert out["n_b"] == int((grp == "B").sum())
    assert out["b"] > 0
    # huge real effect: no relabeling should reach it
    assert out["n_extreme"] == 0
    assert out["p_value"] == 1 / (out["b"] + 1)
    assert out["diff_obs_cents"] < 0  # A well below B

    # null effect: identical distributions -> p should not be tiny
    val0 = np.round(rng.uniform(0, 100, n), 2)
    ds0 = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(np.arange(n), pa.int64()),
                "v": pa.array(val0, pa.float64()),
                "g": pa.array(grp),
            }
        )
    )
    out0 = permutation_test(ds0, "v", "id", "g", "A", b=100).to_pylist()[0]
    assert out0["p_value"] > 0.05


def test_permutation_test_partition_invariance(ray_session):
    """Same result under different block counts (exact integer
    partials merge associatively)."""
    import ray.data

    from mothray.ops.moments import permutation_test

    rng = np.random.default_rng(7)
    n = 300
    t = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "v": pa.array(np.round(rng.uniform(0, 50, n), 2), pa.float64()),
            "g": pa.array(np.where(rng.random(n) < 0.5, "A", "B")),
        }
    )
    r1 = permutation_test(
        ray.data.from_arrow(t), "v", "id", "g", "A", b=50
    ).to_pylist()[0]
    r2 = permutation_test(
        ray.data.from_arrow(t).repartition(7), "v", "id", "g", "A", b=50
    ).to_pylist()[0]
    assert r1 == r2
