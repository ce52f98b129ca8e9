"""ngram_top_k vs the DuckDB list_zip oracle."""

import duckdb
import pyarrow as pa

from mothray.ops import text


def test_ngram_synthetic(ray_session):
    import ray.data

    tbl = pa.table(
        {
            "text": [
                "a b a b c",   # bigrams: a b, b a, a b, b c
                "a b",          # a b
                "solo",         # none
                "",             # none
                None,           # none
            ]
        }
    )
    out = text.ngram_top_k(ray.data.from_arrow(tbl).repartition(3), n=2, k=10).to_pandas()
    assert out.iloc[0].tolist() == ["a b", 3]
    assert dict(zip(out["ngram"], out["cnt"])) == {"a b": 3, "b a": 1, "b c": 1}
    # window never crosses documents: "c" + "a" must not appear
    assert "c a" not in set(out["ngram"])


def test_ngram_trigram_oracle(ray_session):
    import ray.data

    src = "/root/testdata/sf0.001/documents.parquet"
    got = text.ngram_top_k(
        ray.data.read_parquet(src, columns=["text"]), n=3, k=25
    ).to_pandas()
    exp = duckdb.sql(
        f"WITH t AS (SELECT string_split(lower(text), ' ') AS l"
        f"           FROM read_parquet('{src}')),"
        " z AS (SELECT unnest(list_zip(l[1:len(l)-2], l[2:len(l)-1], l[3:])) AS p"
        "       FROM t WHERE len(l) >= 3)"
        " SELECT p[1] || ' ' || p[2] || ' ' || p[3] AS ngram,"
        " CAST(count(*) AS BIGINT) AS cnt"
        " FROM z GROUP BY 1 ORDER BY cnt DESC, ngram LIMIT 25"
    ).df()
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))
