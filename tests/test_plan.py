"""Codec auto-selection tests (SURVEY.md §2.5): sampling pass ->
CodecPlan -> planned encode honors per-column choices."""

import json

import numpy as np
import pyarrow as pa
import pytest

from mothray import datagen, plan, pipeline, stripe


@pytest.fixture(scope="module")
def planned(ray_session):
    import ray.data

    tbl = datagen.cc_pages(4000, seed=9)
    ds = ray.data.from_arrow(tbl)
    stats = plan.sample_stats(ds, fraction=1.0)
    return tbl, ds, stats, plan.build_plan(stats)


def test_sample_stats_shape(planned):
    _, _, stats, _ = planned
    assert set(stats) == {"url", "text", "lang"}
    assert stats["lang"]["distinct"] <= 35
    assert stats["url"]["distinct"] > 1000
    assert 0 < stats["text"]["entropy"] < 8


def test_plan_choices(planned):
    _, _, _, p = planned
    assert p.column_plans["lang"]["string_encoding"] == "dict"
    assert p.column_plans["url"]["string_encoding"] == "fsst"
    assert p.column_plans["text"]["string_encoding"] in ("fsst", "dict")


def test_planned_encode_honors_plan(planned):
    tbl, ds, _, p = planned
    enc = stripe.encode_batch(tbl, p.to_opts())
    meta = json.loads(enc.column("meta")[0].as_py())
    assert meta["metrics"]["codecs"]["lang"] == "DICT"
    assert meta["metrics"]["codecs"]["url"] == "FSST"
    dec = stripe.decode_batch(enc)
    for c in tbl.column_names:
        assert dec.column(c).combine_chunks().equals(tbl.column(c).combine_chunks())


def test_planned_pipeline_roundtrip(planned):
    tbl, ds, _, _ = planned
    enc = pipeline.encode_dataset_planned(ds, sample_fraction=0.5)
    dec = pipeline.decode_dataset(enc)
    got = pa.concat_tables(dec.iter_batches(batch_format="pyarrow", batch_size=None))
    assert got.num_rows == tbl.num_rows


def test_plan_high_entropy_goes_direct():
    rng = np.random.default_rng(0)
    stats = {
        "rand": {"n": 1000, "bytes": 64000, "distinct": 1000, "entropy": 7.99, "avg_len": 64.0},
        "short": {"n": 1000, "bytes": 3000, "distinct": 1000, "entropy": 4.0, "avg_len": 3.0},
    }
    p = plan.build_plan(stats)
    assert p.column_plans["rand"]["string_encoding"] == "direct"
    assert p.column_plans["short"]["string_encoding"] == "direct"  # too short for FSST
