"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or in mothray library code.

The flagship pipeline is the mothray encode->decode round trip: per-
column lightweight compression (dict / RLEv2 / FSST / bit-pack /
timestamp-split with codec auto-selection) of Common-Crawl-style pages
and the driver testdata tables, executed as streaming ray.data
pipelines (SURVEY.md §3.4).
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

import pyarrow as pa


def _roundtrip(sf_dir: str, table: str):
    import ray.data

    from mothray import pipeline

    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet")
    enc = pipeline.encode_dataset(ds)
    return pipeline.decode_dataset(enc)


def entry() -> Any:
    """Flagship: encode+decode round trip of documents at sf0.001."""
    return _roundtrip("/root/testdata/sf0.001", "documents")


def _stats_lineitem(sf_dir: str) -> pa.Table:
    """File-level stats rolled up from per-stripe partial stats — the
    reference's partial->final merge (MothWriter.go:339-353) computed
    from encoded metadata only (no value streams touched)."""
    import ray.data

    from mothray import pipeline, stats

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet")
    enc = pipeline.encode_dataset(ds)
    parts_qty, parts_key, parts_ship = [], [], []
    for batch in enc.iter_batches(batch_format="pyarrow", batch_size=None):
        for sj in batch.column("stats").to_pylist():
            st = json.loads(sj)
            parts_qty.append(st["l_quantity"])
            parts_key.append(st["l_orderkey"])
            parts_ship.append(st["l_shipdate"])
    qty = stats.merge_stats(parts_qty)
    key = stats.merge_stats(parts_key)
    ship = stats.merge_stats(parts_ship)
    return pa.table(
        {
            "row_cnt": [qty["count"]],
            "min_qty": [qty["min"]],
            "max_qty": [qty["max"]],
            "sum_orderkey": [key["sum"]],
            "min_shipdate": pa.array([ship["min"]], type=pa.int64()).cast(pa.timestamp("us")),
            "max_shipdate": pa.array([ship["max"]], type=pa.int64()).cast(pa.timestamp("us")),
        }
    )


def _prune_orders(sf_dir: str) -> pa.Table:
    """Predicate pushdown on encoded stripes: sort by o_totalprice so
    stripe min/max ranges are disjoint, prune stripes by stats without
    decoding, then exact-filter decoded rows (SURVEY.md §2.7)."""
    import pyarrow.compute as pc
    import ray.data

    from mothray import pipeline

    cutoff = 400000.0
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet").sort("o_totalprice")
    enc = pipeline.encode_dataset(ds, {"stripe_rows": 4096})
    pruned = pipeline.prune_stripes(enc, "o_totalprice", min_value=cutoff)
    dec = pipeline.decode_dataset(pruned)
    return dec.map_batches(
        lambda t: t.filter(pc.greater_equal(t["o_totalprice"], cutoff)),
        batch_format="pyarrow",
    )


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {}
    for table in ("documents", "lineitem", "events", "orders", "embeddings", "part", "customer"):
        q[f"roundtrip_{table}"] = (lambda t: lambda sf_dir: _roundtrip(sf_dir, t))(table)
    q["stats_lineitem"] = _stats_lineitem
    q["prune_orders"] = _prune_orders
    return q


def oracle_sql() -> dict[str, str]:
    o = {
        f"roundtrip_{t}": f"SELECT * FROM {t}"
        for t in ("documents", "lineitem", "events", "orders", "embeddings", "part", "customer")
    }
    o["stats_lineitem"] = (
        "SELECT CAST(count(*) AS BIGINT) AS row_cnt,"
        " min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,"
        " CAST(sum(l_orderkey) AS BIGINT) AS sum_orderkey,"
        " min(l_shipdate) AS min_shipdate, max(l_shipdate) AS max_shipdate"
        " FROM lineitem"
    )
    o["prune_orders"] = "SELECT * FROM orders WHERE o_totalprice >= 400000.0"
    return o
