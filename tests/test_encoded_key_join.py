"""Join pushdown into the encoded format: key-range stripe/row-group
pruning + bloom prefilter before the exchange, exact inner-join rows."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data


@pytest.fixture()
def fact_dim(ray_session, tmp_path):
    from mothray import pipeline

    n = 6000
    fact = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "amt": pa.array((np.arange(n) % 97).astype(np.float64)),
        }
    )
    src = tmp_path / "fact.parquet"
    pq.write_table(fact, src)
    enc = str(tmp_path / "enc")
    pipeline.encode_parquet_to_dir(str(src), enc, opts={"stripe_rows": 500})
    dim = pa.table(
        {
            "k": pa.array([100, 101, 150, 5999, 123456], pa.int64()),
            "name": pa.array(["a", "b", "c", "d", "absent"]),
        }
    )
    return enc, fact, dim


def test_encoded_key_join_exact(ray_session, fact_dim):
    from mothray.ops import join

    enc, fact, dim = fact_dim
    got = join.encoded_key_join(enc, ray.data.from_arrow(dim), "k").take_all()
    want = {(100, "a"), (101, "b"), (150, "c"), (5999, "d")}
    assert {(r["k"], r["name"]) for r in got} == want
    assert all("amt" in r for r in got)


def test_encoded_key_join_prunes_stripes(ray_session, fact_dim):
    """A narrow dimension key range must fetch only overlapping
    stripes (12 stripes of 500; keys 100-150 live in stripe 0)."""
    from mothray import pipeline

    enc, _, dim = fact_dim
    pruned = pipeline.prune_read(enc, "k", 100, 150)
    assert pruned.count() <= 2


def test_encoded_key_join_outer_refused_and_empty_dim(ray_session, fact_dim):
    from mothray.ops import join

    enc, _, dim = fact_dim
    with pytest.raises(ValueError):
        join.encoded_key_join(enc, ray.data.from_arrow(dim), "k", how="left_outer")
    empty = ray.data.from_arrow(dim.slice(0, 0))
    assert join.encoded_key_join(enc, empty, "k").count() == 0
