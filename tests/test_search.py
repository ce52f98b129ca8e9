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


def test_bm25_search_matches_reference(ray_session, tmp_path):
    """BM25 top-k vs a sequential numpy reference on the sf0.001 docs."""
    import collections
    import math
    import re

    import ray.data

    from mothray.ops import search

    src = "/root/testdata/sf0.001/documents.parquet"
    idx = str(tmp_path / "bm25")
    ds = ray.data.read_parquet(src, columns=["doc_id", "text"])
    meta = search.build_bm25_index(ds, idx)

    import pyarrow.parquet as pq

    t = pq.read_table(src, columns=["doc_id", "text"])
    docs = {i: re.findall(r"[a-z0-9]+", s.lower()) for i, s in
            zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    assert meta["n_docs"] == n and abs(meta["avgdl"] - avgdl) < 1e-9

    terms = ["merge", "window", "spark"]
    df = {q: sum(1 for v in docs.values() if q in v) for q in terms}
    k1, b = 1.2, 0.75
    scores = {}
    for i, v in docs.items():
        cnt = collections.Counter(v)
        s = 0.0
        for q in terms:
            tf = cnt.get(q, 0)
            if not tf:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            scores[i] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:15]

    got = [(r["doc_id"], r["score_r6"]) for r in search.bm25_search(idx, terms, k=15).take_all()]
    assert got == want


def test_bm25_append_equals_full_rebuild(ray_session, tmp_path):
    """Appending the second half of the corpus to an index built on
    the first half gives the same ranking as a from-scratch build."""
    import ray.data

    from mothray.ops import search

    src = "/root/testdata/sf0.001/documents.parquet"
    ds = ray.data.read_parquet(src, columns=["doc_id", "text"])
    import pyarrow.compute as pc

    def _half(parity):
        def f(t):
            keep = pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), parity)
            return t.filter(keep)
        return f

    half_a = ds.map_batches(_half(0), batch_format="pyarrow")
    half_b = ds.map_batches(_half(1), batch_format="pyarrow")

    full_idx = str(tmp_path / "full")
    search.build_bm25_index(ds, full_idx)
    inc_idx = str(tmp_path / "inc")
    search.build_bm25_index(half_a, inc_idx)
    meta = search.append_bm25_index(half_b, inc_idx)

    import json
    import os

    with open(os.path.join(full_idx, search._BM25_META)) as f:
        want_meta = json.load(f)
    assert meta == want_meta

    terms = ["merge", "window", "spark"]
    want = [(r["doc_id"], r["score_r6"]) for r in search.bm25_search(full_idx, terms, k=25).take_all()]
    got = [(r["doc_id"], r["score_r6"]) for r in search.bm25_search(inc_idx, terms, k=25).take_all()]
    assert got == want and len(got) == 25


def test_search_query_term_normalization(ray_session, tmp_path):
    """Query terms pass through the INDEX tokenizer: uppercase and
    punctuated terms must match (the index stores lowercased [a-z0-9]+
    tokens); an all-punctuation query raises a clear error."""
    import pyarrow as pa
    import pytest
    import ray.data

    from mothray.ops import search

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["hello world", "foo bar baz", "hello bar"],
        }
    )
    d = str(tmp_path / "ix")
    search.build_text_index(ray.data.from_arrow(t), d)
    got = sorted(
        r["doc_id"]
        for r in search.search_text_index(d, ["Hello"], mode="or").take_all()
    )
    assert got == [1, 3]
    got2 = sorted(
        r["doc_id"]
        for r in search.search_text_index(d, ["foo-bar"], mode="and").take_all()
    )
    assert got2 == [2]  # 'foo-bar' -> foo AND bar
    with pytest.raises(ValueError):
        search.search_text_index(d, ["!!!"], mode="or")

    b = str(tmp_path / "bm")
    search.build_bm25_index(ray.data.from_arrow(t), b)
    top = search.bm25_search(b, ["HELLO"], k=3).take_all()
    assert sorted(r["doc_id"] for r in top) == [1, 3]
    with pytest.raises(ValueError):
        search.bm25_search(b, [], k=3)
    # meta file is written atomically (no torn staging names left)
    import os

    assert not any(f.endswith(".tmp") for f in os.listdir(b))


def test_positional_postings_batch(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": ["Hello, WORLD! hello", "  a-b  a "],
        }
    )
    out = search.positional_postings_batch(tbl).to_pydict()
    got = sorted(zip(out["doc_id"], out["pos"], out["token"]))
    # positions index the empty-filtered token sequence, per doc
    assert got == [
        (1, 0, "hello"),
        (1, 1, "world"),
        (1, 2, "hello"),
        (2, 0, "a"),
        (2, 1, "b"),
        (2, 2, "a"),
    ]


def test_phrase_search_oracle(ray_session, tmp_path):
    import ray.data

    src = "/root/testdata/sf0.001/documents.parquet"
    idx = str(tmp_path / "pidx")
    search.build_positional_index(
        ray.data.read_parquet(src, columns=["doc_id", "text"]), idx
    )
    for phrase in ["merge sort", "fast batch", "merge merge"]:
        toks = phrase.split()
        conds = " AND ".join(f"l[p + {i}] = '{t}'" for i, t in enumerate(toks))
        want = duckdb.sql(
            f"WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text),"
            f" '[^a-z0-9]+'), x -> x <> '') AS l FROM read_parquet('{src}')),"
            f" pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - {len(toks)-1})) AS p FROM d),"
            f" m AS (SELECT doc_id FROM pos WHERE {conds})"
            f" SELECT doc_id, CAST(count(*) AS BIGINT) FROM m GROUP BY doc_id ORDER BY doc_id"
        ).fetchall()
        got = [
            (r["doc_id"], r["n_matches"])
            for r in search.phrase_search(idx, phrase).take_all()
        ]
        assert got == want, phrase


def test_phrase_search_single_term_and_miss(ray_session, tmp_path):
    import ray.data

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["alpha beta gamma", "beta alpha"],
        }
    )
    idx = str(tmp_path / "pidx2")
    search.build_positional_index(ray.data.from_arrow(tbl), idx)
    got = [
        (r["doc_id"], r["n_matches"])
        for r in search.phrase_search(idx, "alpha beta").take_all()
    ]
    assert got == [(1, 1)]
    single = [
        (r["doc_id"], r["n_matches"])
        for r in search.phrase_search(idx, "beta").take_all()
    ]
    assert single == [(1, 1), (2, 1)]
    assert search.phrase_search(idx, "gamma alpha").take_all() == []
    with pytest.raises(ValueError):
        search.phrase_search(idx, "!!!")
