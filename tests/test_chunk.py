"""chunk_chars / chunk_words vs DuckDB oracles and edge-case invariants."""

import duckdb
import pyarrow as pa

from mothray.ops import chunk


def _norm(df):
    return df.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


_EDGE = pa.table(
    {
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            "",  # empty -> one empty chunk
            None,  # null -> treated as ''
            "short",  # shorter than overlap
            "a" * 7,  # exactly size
            "héllo wörld " * 5,  # multi-byte codepoints
            "x" * 20,  # several windows
        ],
    }
)


def _oracle_chars(tbl, size, overlap):
    stride = size - overlap
    return duckdb.sql(
        f"""
        SELECT doc_id, CAST(s/{stride} AS BIGINT) AS chunk_idx,
               CAST(s AS BIGINT) AS chunk_start,
               substr(coalesce(text,''), CAST(s+1 AS BIGINT), {size}) AS chunk_text,
               CAST(length(substr(coalesce(text,''), CAST(s+1 AS BIGINT), {size})) AS BIGINT) AS chunk_len
        FROM (SELECT doc_id, text,
                     unnest(generate_series(0, greatest(length(coalesce(text,''))-{overlap}-1, 0), {stride})) AS s
              FROM tbl)
        ORDER BY doc_id, chunk_idx
        """
    ).df()


def _oracle_words(tbl, size, overlap):
    stride = size - overlap
    df = duckdb.sql(
        f"""
        SELECT doc_id, CAST(s/{stride} AS BIGINT) AS chunk_idx,
               CAST(s AS BIGINT) AS chunk_start,
               array_to_string(list_slice(ws, CAST(s+1 AS BIGINT), CAST(s+{size} AS BIGINT)), ' ') AS chunk_text
        FROM (SELECT doc_id, ws,
                     unnest(generate_series(0, greatest(length(ws)-{overlap}-1, 0), {stride})) AS s
              FROM (SELECT doc_id, string_split(coalesce(text,''), ' ') AS ws FROM tbl))
        ORDER BY doc_id, chunk_idx
        """
    ).df()
    df["chunk_len"] = df["chunk_text"].str.len().astype("int64")
    return df


def test_chunk_chars_edge_cases(ray_session):
    import pandas as pd
    import ray.data

    out = _norm(chunk.chunk_chars(
        ray.data.from_arrow(_EDGE).repartition(3), size=7, overlap=3
    ).to_pandas())
    ora = _oracle_chars(_EDGE, 7, 3).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[ora.columns.tolist()], ora)
    # every doc emits at least one chunk; no chunk is empty unless the doc is
    assert set(out["doc_id"]) == set(_EDGE.column("doc_id").to_pylist())
    nonempty = out[out["chunk_len"] > 0]
    assert (nonempty.groupby("doc_id")["chunk_len"].min() > 0).all()


def test_chunk_chars_zero_overlap_reconstructs(ray_session):
    import ray.data

    out = _norm(chunk.chunk_chars(
        ray.data.from_arrow(_EDGE), size=6, overlap=0
    ).to_pandas())
    recon = out.groupby("doc_id")["chunk_text"].agg("".join)
    for doc_id, text in zip(_EDGE.column("doc_id").to_pylist(), _EDGE.column("text").to_pylist()):
        assert recon[doc_id] == (text or "")


def test_chunk_words_edge_cases(ray_session):
    import pandas as pd
    import ray.data

    out = _norm(chunk.chunk_words(
        ray.data.from_arrow(_EDGE).repartition(2), size=3, overlap=1
    ).to_pandas())
    ora = _oracle_words(_EDGE, 3, 1).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[ora.columns.tolist()], ora)


def test_chunk_words_testdata_parity(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    out = _norm(chunk.chunk_words(
        ray.data.from_arrow(tbl).repartition(4), size=30, overlap=5
    ).to_pandas())
    ora = _oracle_words(tbl, 30, 5).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[ora.columns.tolist()], ora)


def test_chunk_invalid_params():
    import pytest

    with pytest.raises(ValueError):
        chunk.chunk_chars(None, size=5, overlap=5)
    with pytest.raises(ValueError):
        chunk.chunk_words(None, size=5, overlap=-1)
