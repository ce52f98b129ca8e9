"""Corpus statistics (zipf / oov / pmi) + RRF fusion: synthetic
hand-checked cases plus brute-force numpy cross-checks."""

import math

import numpy as np
import pyarrow as pa

from mothray.ops import corpus, search


def _docs_ds(texts, sources=None, npartitions=3):
    import ray.data

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(
                sources or ["s0"] * len(texts), pa.string()
            ),
        }
    )
    return ray.data.from_arrow(tbl).repartition(npartitions)


def _brute_counts(texts):
    from collections import Counter

    c = Counter()
    for t in texts:
        c.update((t or "").lower().split(" "))
    return c


def test_zipf_slope_matches_numpy(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    # zipf-ish draw so counts are skewed
    texts = [
        " ".join(vocab[min(int(z) - 1, 39)] for z in rng.zipf(1.3, 30))
        for _ in range(60)
    ]
    out = corpus.zipf_slope(_docs_ds(texts), k=25).take_all()[0]

    c = _brute_counts(texts)
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    y = np.log(np.array([v for _, v in top], dtype=np.float64))
    x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    slope = ((x - x.mean()) * (y - y.mean())).sum() / ((x - x.mean()) ** 2).sum()
    assert out["n_tokens"] == len(top)
    assert out["slope_r6"] == np.round(slope, 6)
    assert out["slope_r6"] < 0  # skewed counts => decreasing fit
    assert 0.0 <= out["r2_r6"] <= 1.0


def test_zipf_rank_ties_stable(ray_session):
    # every token appears exactly twice -> all ranks tied; the fit
    # must still be deterministic (slope 0, ln(cnt) constant)
    texts = ["a b c d", "a b c d"]
    out = corpus.zipf_slope(_docs_ds(texts), k=10).take_all()[0]
    assert out["n_tokens"] == 4
    assert out["slope_r6"] == 0.0


def test_oov_rate_brute_force(ray_session):
    texts = [
        "a a a b",       # src x
        "a b c rare1",   # src x
        "a a rare2 rare3",  # src y
        "b b b b",       # src y
    ]
    srcs = ["x", "x", "y", "y"]
    # vocab_k=2 -> vocab = {a, b} (a:6, b:7 ... compute): counts a=6,b=7,c=1,rare*=1
    out = {
        r["source"]: r
        for r in corpus.oov_rate(
            _docs_ds(texts, srcs), vocab_k=2, group_col="source"
        ).take_all()
    }
    assert out["x"]["n_tokens"] == 8 and out["x"]["oov"] == 2
    assert out["y"]["n_tokens"] == 8 and out["y"]["oov"] == 2
    assert out["x"]["oov_rate_r6"] == 0.25


def test_pmi_bigrams_brute_force(ray_session):
    texts = ["a b a b c", "a b c c", "b a b a"] * 3
    got = corpus.pmi_bigrams(_docs_ds(texts), k=50, min_count=1).take_all()

    # brute force
    from collections import Counter

    uni, big = Counter(), Counter()
    for t in texts:
        toks = t.lower().split(" ")
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n1 = float(sum(uni.values()))
    n2 = float(sum(big.values()))
    want = {}
    for (w1, w2), c in big.items():
        want[(w1, w2)] = (
            c,
            float(np.round(np.log(c * n1 * n1 / (n2 * uni[w1] * uni[w2])), 6)),
        )
    assert len(got) == len(want)
    for r in got:
        c, pmi = want[(r["w1"], r["w2"])]
        assert r["cnt"] == c and r["pmi_r6"] == pmi
    # ordering: pmi desc, then w1, w2
    keys = [(-r["pmi_r6"], r["w1"], r["w2"]) for r in got]
    assert keys == sorted(keys)


def test_pmi_min_count_filters(ray_session):
    texts = ["a b a b", "c d"]
    got = corpus.pmi_bigrams(_docs_ds(texts), k=50, min_count=2).take_all()
    pairs = {(r["w1"], r["w2"]) for r in got}
    assert pairs == {("a", "b")}  # "b a", "c d" occur once


def test_rrf_fuse_manual(ray_session):
    t1 = pa.table(
        {
            "doc_id": pa.array([10, 20, 30], pa.int64()),
            "score_r6": pa.array([3.0, 2.0, 1.0], pa.float64()),
        }
    )
    t2 = pa.table(
        {
            "doc_id": pa.array([20, 40], pa.int64()),
            "score_r6": pa.array([9.0, 8.0], pa.float64()),
        }
    )
    out = search.rrf_fuse([t1, t2], k=10, c=60)
    got = {r["doc_id"]: r["rrf_r6"] for r in out.to_pylist()}
    assert got[20] == round(1 / 62 + 1 / 61, 6)
    assert got[10] == round(1 / 61, 6)
    assert got[40] == round(1 / 62, 6)
    assert got[30] == round(1 / 63, 6)
    # doc 20 (in both lists) must rank first
    assert out.column("doc_id").to_pylist()[0] == 20


def test_rrf_fuse_tie_break_and_k(ray_session):
    # equal scores within a list -> rank by id; k truncates
    t1 = pa.table(
        {
            "doc_id": pa.array([5, 3], pa.int64()),
            "score_r6": pa.array([1.0, 1.0], pa.float64()),
        }
    )
    out = search.rrf_fuse([t1], k=1)
    # tie on score -> doc 3 gets rank 1 -> higher rrf -> kept by k=1
    assert out.to_pylist() == [{"doc_id": 3, "rrf_r6": round(1 / 61, 6)}]


def test_dup_ngram_spans_brute_force(ray_session):
    from mothray.ops import webtext

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(12)]
    texts = [
        " ".join(vocab[j] for j in rng.integers(0, 12, rng.integers(4, 14)))
        for _ in range(40)
    ] + ["", "solo"]
    got = sorted(
        webtext.dup_ngram_spans(
            _docs_ds(texts, npartitions=5), n=3, min_docs=2
        ).take_all(),
        key=lambda r: r["doc_id"],
    )

    from collections import defaultdict

    n = 3
    grams = defaultdict(set)
    toks = [t.split(" ") for t in texts]
    for i, tk in enumerate(toks):
        for s in range(len(tk) - n + 1):
            grams[tuple(tk[s : s + n])].add(i)
    dup = {g for g, d in grams.items() if len(d) >= 2}
    for i, tk in enumerate(toks):
        cov, occ = set(), 0
        for s in range(len(tk) - n + 1):
            if tuple(tk[s : s + n]) in dup:
                occ += 1
                cov.update(range(s, s + n))
        want = {
            "doc_id": i,
            "n_tokens": len(tk),
            "dup_grams": occ,
            "covered_tokens": len(cov),
            "clean_text": " ".join(t for j, t in enumerate(tk) if j not in cov),
        }
        assert got[i] == want, (got[i], want)


def test_dup_ngram_spans_no_dups(ray_session):
    from mothray.ops import webtext

    # fully distinct vocabularies -> nothing removed, text unchanged
    texts = ["a b c d", "e f g h", "i j k l"]
    got = sorted(
        webtext.dup_ngram_spans(_docs_ds(texts), n=2, min_docs=2).take_all(),
        key=lambda r: r["doc_id"],
    )
    for i, r in enumerate(got):
        assert r["dup_grams"] == 0 and r["covered_tokens"] == 0
        assert r["clean_text"] == texts[i]


def test_dup_ngram_spans_same_doc_repeat_not_dup(ray_session):
    from mothray.ops import webtext

    # a gram repeated within ONE doc only is not a cross-doc dup
    texts = ["x y x y x y", "p q r s"]
    got = sorted(
        webtext.dup_ngram_spans(_docs_ds(texts), n=2, min_docs=2).take_all(),
        key=lambda r: r["doc_id"],
    )
    assert all(r["covered_tokens"] == 0 for r in got)


def test_js_divergence_brute_force(ray_session):
    texts = ["a a b c", "a b b d", "a a a b", "c c d e"]
    srcs = ["x", "y", "x", "y"]
    out = corpus.js_divergence(
        _docs_ds(texts, srcs), a="x", b="y"
    ).to_pylist()[0]

    from collections import Counter

    ca, cb = Counter(), Counter()
    for t, s in zip(texts, srcs):
        (ca if s == "x" else cb).update(t.split(" "))
    na, nb = sum(ca.values()), sum(cb.values())
    jsd = 0.0
    for tok in set(ca) | set(cb):
        p, q = ca[tok] / na, cb[tok] / nb
        m = 0.5 * (p + q)
        jsd += (0.5 * p * math.log(p / m) if p else 0.0) + (
            0.5 * q * math.log(q / m) if q else 0.0
        )
    assert out["n_a"] == na and out["n_b"] == nb
    assert abs(out["jsd_r6"] - jsd) < 1e-6
    assert out["jsd_r6"] > 0


def test_js_divergence_identical_is_zero(ray_session):
    texts = ["a b c", "a b c"]
    out = corpus.js_divergence(_docs_ds(texts, ["x", "y"]), a="x", b="y").to_pylist()[0]
    assert out["jsd_r6"] == 0.0


def test_readability_known_values(ray_session):
    from mothray.ops import webtext

    # doc0: 4 words, 1 sentence run, syllables: "the"=1, "cat"=1,
    # "sat"=1, "by"=1 (y is a vowel) -> s=4, flesch known in closed form
    texts = ["The cat sat by.", "zzz qqq xxx", ""]
    out = webtext.readability(
        _docs_ds(texts, ["a", "b", "a"]), group_col="source"
    ).take_all()
    by = {r["source"]: r for r in out}
    # doc2 has zero words -> excluded; group "a" is doc0 only
    a = by["a"]
    assert a["n_docs"] == 1
    exp = 206.835 - 1.015 * (4 / 1) - 84.6 * (4 / 4)
    assert abs(a["avg_flesch_r6"] - round(exp, 6)) < 1e-9
    assert a["wps_r6"] == 4.0 and a["spw_r6"] == 1.0
    # group "b": 3 vowel-less words -> 1 syllable each, 0 sentence
    # runs clamped to 1
    b = by["b"]
    exp_b = 206.835 - 1.015 * (3 / 1) - 84.6 * (3 / 3)
    assert b["n_docs"] == 1 and abs(b["avg_flesch_r6"] - round(exp_b, 6)) < 1e-9


def test_readability_matches_duckdb(ray_session):
    import duckdb

    from mothray.ops import webtext

    texts = [
        "Hello world. This is a simple test!",
        "Complicated polysyllabic terminology notwithstanding?",
        "one two three four five. six seven!",
        "nymphs fly by",
    ]
    srcs = ["x", "y", "x", "y"]
    got = webtext.readability(_docs_ds(texts, srcs)).take_all()
    tbl = pa.table({"text": pa.array(texts), "source": pa.array(srcs)})
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.execute(
        "WITH d AS (SELECT source,"
        " len(regexp_extract_all(lower(text), '[a-z]+')) AS w,"
        " len(regexp_extract_all(lower(text), '[a-z]*[aeiouy][a-z]*')) AS wv,"
        " len(regexp_extract_all(lower(text), '[aeiouy]+')) AS g,"
        " greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS sen FROM documents),"
        " f AS (SELECT source, w, sen, g + (w - wv) AS s,"
        " 206.835 - 1.015 * (w::DOUBLE / sen)"
        "  - 84.6 * ((g + (w - wv)) / w::DOUBLE) AS flesch FROM d WHERE w > 0)"
        " SELECT source, CAST(count(*) AS BIGINT) AS n_docs,"
        " round(sum(flesch) / count(*), 6) AS avg_flesch_r6,"
        " round(sum(w)::DOUBLE / sum(sen), 6) AS wps_r6,"
        " round(sum(s) / sum(w)::DOUBLE, 6) AS spw_r6"
        " FROM f GROUP BY source ORDER BY source"
    ).fetchall()
    got_rows = [
        (r["source"], r["n_docs"], r["avg_flesch_r6"], r["wps_r6"], r["spw_r6"])
        for r in got
    ]
    assert got_rows == [tuple(r) for r in exp]


def test_rake_keywords_known(ray_session):
    # "red apple pie" island scores: deg(red)=3,freq=1; apple: appears
    # in 3-phrase and alone (deg 3+1=4, freq 2); pie deg 3 freq 1
    texts = [
        "the red apple pie is a treat",
        "an apple a day",
    ]
    out = corpus.rake_keywords(_docs_ds(texts), k=10).to_pylist()
    by = {r["phrase"]: r for r in out}
    assert by["red apple pie"]["n_words"] == 3
    assert by["red apple pie"]["cnt"] == 1
    # scores: red 3/1, apple (3+1)/2=2, pie 3/1 -> 8.0
    assert by["red apple pie"]["score_r6"] == 8.0
    assert by["apple"]["score_r6"] == 2.0 and by["apple"]["cnt"] == 1
    assert by["treat"]["score_r6"] == 1.0
    assert by["day"]["score_r6"] == 1.0
    # stopwords never appear as phrases
    assert "the" not in by and "a" not in by
    # ordering: top phrase is the 3-word island
    assert out[0]["phrase"] == "red apple pie"
