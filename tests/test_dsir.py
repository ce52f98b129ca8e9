"""DSIR importance weights: hand-checked tiny corpus + batch-layout
invariance (the bucket histograms and scoring must not depend on how
rows split into blocks)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data


def _corpus():
    rows = []
    for i in range(40):
        src = "tgt" if i % 4 == 0 else f"s{i % 3}"
        words = ["alpha", "beta"] if src == "tgt" else ["gamma", "delta", "beta"]
        rows.append({"doc_id": i, "source": src, "text": " ".join(words * (1 + i % 3))})
    return rows


def test_dsir_prefers_target_like_docs(ray_session):
    from mothray.ops import webtext

    ds = ray.data.from_items(_corpus())
    out = {r["doc_id"]: r["dsir_wt"] for r in webtext.dsir_weights(
        ds, "source", "tgt", k=16).take_all()}
    rows = _corpus()
    tgt = [out[r["doc_id"]] / max(len(r["text"].split()), 1) for r in rows if r["source"] == "tgt"]
    oth = [out[r["doc_id"]] / max(len(r["text"].split()), 1) for r in rows if r["source"] != "tgt"]
    # per-token weight of target-looking docs must exceed the others
    assert min(tgt) > max(oth)


def test_dsir_layout_invariant(ray_session):
    from mothray.ops import webtext

    rows = _corpus()
    a = {r["doc_id"]: r["dsir_wt"] for r in webtext.dsir_weights(
        ray.data.from_items(rows), "source", "tgt", k=16).take_all()}
    b = {r["doc_id"]: r["dsir_wt"] for r in webtext.dsir_weights(
        ray.data.from_items(rows).repartition(7), "source", "tgt", k=16).take_all()}
    assert a == b


def test_dsir_exact_two_bucket_hand_check(ray_session):
    """One target doc of one word, one other doc of another word, k
    large enough that they land in different buckets: the closed-form
    add-1 weight must match."""
    from mothray.ops import webtext
    from mothray.ops.features import _word_buckets

    k = 64
    rows = [
        {"doc_id": 0, "source": "tgt", "text": "kiwi"},
        {"doc_id": 1, "source": "raw", "text": "pear"},
    ]
    b_kiwi = int(_word_buckets(pa.array(["kiwi"]), k)[0])
    b_pear = int(_word_buckets(pa.array(["pear"]), k)[0])
    assert b_kiwi != b_pear
    out = {r["doc_id"]: r["dsir_wt"] for r in webtext.dsir_weights(
        ray.data.from_items(rows), "source", "tgt", k=k).take_all()}
    # P=1 target token, Q=2 corpus tokens
    w0 = np.log(1 + 1) + np.log(2 + k) - np.log(1 + 1) - np.log(1 + k)
    w1 = np.log(0 + 1) + np.log(2 + k) - np.log(1 + 1) - np.log(1 + k)
    assert out[0] == pytest.approx(round(w0, 6), abs=1e-9)
    assert out[1] == pytest.approx(round(w1, 6), abs=1e-9)
