"""C4-style filter signals against a brute-force reference."""

import re

import pyarrow as pa
import pytest


def test_c4_filters_bruteforce(ray_session):
    from mothray.ops.webtext import c4_filters_batch

    docs = [
        "First sentence. Second one! A third? And a line\nwith no end",
        "short { code }",
        "lorem ipsum dolor sit amet. consectetur adipiscing elit. sed do. ok.",
        "",
        None,
        'Quoted line ends."\nAnother good line.\n\n   \nbad line',
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs),
        }
    )
    out = {r["doc_id"]: r for r in c4_filters_batch(tbl).to_pylist()}
    for i, raw in enumerate(docs):
        t = raw or ""
        lines = [ln.strip() for ln in t.split("\n")]
        nonempty = [ln for ln in lines if ln]
        n_term = sum(1 for ln in nonempty if re.search(r'[.!?"]$', ln))
        words = [w for w in t.lower().split(" ") if w]
        marks = t.count(".") + t.count("!") + t.count("?")
        r = out[i]
        assert r["n_lines"] == len(nonempty)
        assert r["n_term_lines"] == n_term
        if nonempty:
            assert r["term_line_frac"] == pytest.approx(n_term / len(nonempty))
        else:
            assert r["term_line_frac"] is None
        assert r["has_curly"] == int("{" in t)
        assert r["has_lorem"] == int("lorem ipsum" in t.lower())
        assert r["n_term_marks"] == marks
        assert r["n_words"] == len(words)
        keep = (
            marks >= 3
            and "{" not in t
            and "lorem ipsum" not in t.lower()
            and len(words) >= 5
        )
        assert r["keep"] == int(keep)
    assert out[0]["keep"] == 1
    assert out[1]["keep"] == 0  # curly brace
    assert out[2]["keep"] == 0  # lorem ipsum
