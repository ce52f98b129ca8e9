"""Inverted-index text search: build on the engine's encoded format,
AND/OR term queries vs a DuckDB oracle over the same tokenization."""

import duckdb
import pyarrow as pa
import pytest

from mothray.ops import search


def _oracle_ids(src: str, terms: list[str], mode: str) -> list[int]:
    quoted = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    having = f"HAVING count(DISTINCT tok) = {len(set(terms))}" if mode == "and" else ""
    return [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM ("
            f" SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok"
            f" FROM read_parquet('{src}'))"
            f" WHERE tok IN ({quoted}) GROUP BY doc_id {having} ORDER BY doc_id"
        ).fetchall()
    ]


def test_postings_batch_tokenization(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": ["Hello, WORLD! hello", "", "a-b_c 42", "   ,,, "],
        }
    )
    out = search.postings_batch(tbl).to_pydict()
    got = sorted(zip(out["token"], out["doc_id"]))
    # distinct per (token, doc); case-folded; empties dropped; "_" splits
    assert got == [
        ("42", 3),
        ("a", 3),
        ("b", 3),
        ("c", 3),
        ("hello", 1),
        ("world", 1),
    ]


def test_text_index_and_or(ray_session, tmp_path):
    import ray.data

    src = "/root/testdata/sf0.001/documents.parquet"
    idx = str(tmp_path / "idx")
    ds = ray.data.read_parquet(src, columns=["doc_id", "text"])
    search.build_text_index(ds, idx)

    for terms, mode in [
        (["query", "window"], "and"),
        (["query", "window"], "or"),
        (["customer", "stream", "sort"], "and"),
    ]:
        got = sorted(
            search.search_text_index(idx, terms, mode=mode)
            .to_pandas()["doc_id"]
            .tolist()
        )
        exp = _oracle_ids(src, terms, mode)
        assert got == exp and len(got) > 0, (terms, mode)

    # absent term: AND must be empty, OR falls back to the present term
    assert search.search_text_index(idx, ["query", "zzzznope"], mode="and").count() == 0
    got_or = sorted(
        search.search_text_index(idx, ["query", "zzzznope"], mode="or")
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert got_or == _oracle_ids(src, ["query"], "or")

    with pytest.raises(ValueError):
        search.search_text_index(idx, ["query"], mode="xor")
