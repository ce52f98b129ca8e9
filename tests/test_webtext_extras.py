"""compression_quality + source_overlap (webtext.py), wilson_ci
(moments.py) and mmr_select (ann.py) against brute-force references."""

import zlib

import numpy as np
import pyarrow as pa


def test_compression_quality_invariants(ray_session):
    import ray.data

    from mothray.ops import webtext

    docs = {
        "rep": "spam " * 400,                      # highly compressible
        "rand": "".join(
            chr(c) for c in np.random.default_rng(0).integers(33, 123, 2000)
        ),
        "empty": "",
        "short": "hi",
    }
    tbl = pa.table(
        {"doc_id": pa.array(list(docs)), "text": pa.array(list(docs.values()))}
    )
    got = {
        r["doc_id"]: r
        for r in webtext.compression_quality(
            ray.data.from_arrow(tbl), "doc_id", "text"
        ).take_all()
    }
    for k, text in docs.items():
        raw = len(text.encode("utf-8"))
        comp = len(zlib.compress(text.encode("utf-8"), 6))
        assert got[k]["raw_bytes"] == raw
        assert got[k]["comp_bytes"] == comp
        assert got[k]["ratio_r6"] == round(comp / max(raw, 1), 6)
    # boilerplate compresses far better than high-entropy text
    assert got["rep"]["ratio_r6"] < 0.05
    assert got["rand"]["ratio_r6"] > 0.5


def _brute_mmr(units, ids, rel, k, lam):
    picked, out = set(), []
    max_sim = np.full(len(ids), -np.inf)
    for _ in range(k):
        best, best_key = None, None
        for i in range(len(ids)):
            if i in picked:
                continue
            obj = lam * rel[i] if not picked else lam * rel[i] - (1 - lam) * max_sim[i]
            key = (-obj, ids[i])
            if best_key is None or key < best_key:
                best, best_key = i, key
        picked.add(best)
        out.append(ids[best])
        max_sim = np.maximum(max_sim, units @ units[best])
    return out


def test_mmr_select_matches_brute_force(ray_session):
    import ray.data

    from mothray.ops import ann

    rng = np.random.default_rng(13)
    n, dim = 200, 16
    mat = rng.normal(size=(n, dim))
    q = rng.normal(size=dim)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(mat), pa.list_(pa.float64())),
            }
        )
    ).repartition(5)
    got = ann.mmr_select(ds, q, k=8, pool_k=n, lam=0.7)
    units = mat / np.linalg.norm(mat, axis=1)[:, None]
    rel = units @ (q / np.linalg.norm(q))
    want = _brute_mmr(units, np.arange(n), rel, 8, 0.7)
    assert got.column("vec_id").to_pylist() == [int(x) for x in want]
    assert got.column("rank").to_pylist() == list(range(1, 9))
    # first pick is the plain cosine top-1
    assert got.column("vec_id")[0].as_py() == int(np.argmax(rel))


def test_mmr_diversifies_vs_plain_topk(ray_session):
    import ray.data

    from mothray.ops import ann

    # 3 identical-direction vectors plus one equally relevant but less
    # redundant one: plain top-2 takes two clones; MMR must diversify
    q = np.array([1.0, 0.0, 0.0])
    vecs = np.array(
        [[1.0, 0.3, 0.0], [2.0, 0.6, 0.0], [3.0, 0.9, 0.0], [1.0, -0.3, 0.0]]
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
            }
        )
    )
    got = ann.mmr_select(ds, q, k=2, pool_k=4, lam=0.5)
    assert got.column("vec_id").to_pylist()[1] == 3


def test_source_overlap_exact(ray_session):
    import ray.data

    from mothray.ops import webtext

    tbl = pa.table(
        {
            "source": pa.array(["a", "a", "b", "c", None]),
            "text": pa.array(
                [
                    "the cat sat",
                    "The DOG!",
                    "the dog ran",
                    "zebra",
                    "ignored words",
                ]
            ),
        }
    )
    got = webtext.source_overlap(ray.data.from_arrow(tbl), "source", "text")
    rows = {(r["s1"], r["s2"]): r for r in got.to_pylist()}
    # a = {the,cat,sat,dog}, b = {the,dog,ran}, c = {zebra}
    assert rows[("a", "b")]["inter"] == 2
    assert rows[("a", "b")]["n1"] == 4 and rows[("a", "b")]["n2"] == 3
    assert rows[("a", "b")]["jaccard"] == 2 / 5
    assert rows[("a", "c")]["inter"] == 0 and rows[("a", "c")]["jaccard"] == 0.0
    assert rows[("b", "c")]["inter"] == 0
    assert len(rows) == 3  # null source excluded


def test_wilson_ci_matches_formula(ray_session):
    import ray.data

    from mothray.ops import moments

    tbl = pa.table(
        {
            "g": pa.array(["x"] * 40 + ["y"] * 10),
            "f": pa.array([True] * 10 + [False] * 30 + [True] * 9 + [False]),
        }
    )
    got = {
        r["g"]: r
        for r in moments.wilson_ci(ray.data.from_arrow(tbl), "g", "f")
        .take_all()
    }
    for g, n, s in [("x", 40, 10), ("y", 10, 9)]:
        z = 1.96
        p = s / n
        d = 1.0 + (z * z) / n
        center = (p + (z * z) / (2.0 * n)) / d
        half = z * np.sqrt(p * (1.0 - p) / n + (z * z) / (4.0 * n * n)) / d
        assert got[g]["n"] == n and got[g]["successes"] == s
        assert got[g]["p"] == p
        assert got[g]["lo"] == center - half
        assert got[g]["hi"] == center + half
        assert 0.0 <= got[g]["lo"] < p < got[g]["hi"] <= 1.0


def _brute_fnv(word: str) -> int:
    h = 0
    for ch in word:
        h = (h * 1099511628211 + ord(ch)) % (1 << 64)
    return h


def test_feature_hash_vectors_match_brute(ray_session):
    import ray.data

    from mothray.ops import features

    docs = {"d1": "the cat  sat", "d2": "", "d3": "über cool über"}
    tbl = pa.table(
        {"doc_id": pa.array(list(docs)), "text": pa.array(list(docs.values()))}
    )
    k = 8
    got = {
        r["doc_id"]: r["features"]
        for r in features.feature_hash(
            ray.data.from_arrow(tbl), "doc_id", "text", k=k
        ).take_all()
    }
    for d, text in docs.items():
        want = [0] * k
        for w in text.split(" "):
            if w:
                want[_brute_fnv(w) % k] += 1
        assert list(got[d]) == want, d


def test_feature_hash_histogram_consistency(ray_session):
    import ray.data

    from mothray.ops import features

    texts = ["a b c", "a a d", "e f", ""]
    tbl = pa.table({"text": pa.array(texts)})
    k = 4
    got = features.feature_hash_histogram(
        ray.data.from_arrow(tbl).repartition(3), "text", k=k
    )
    words = [w for t in texts for w in t.split(" ") if w]
    vocab = set(words)
    assert sum(got.column("n_tokens").to_pylist()) == len(words)
    assert sum(got.column("n_words").to_pylist()) == len(vocab)
    want_tok, want_voc = {}, {}
    for w in vocab:
        b = _brute_fnv(w) % k
        want_voc[b] = want_voc.get(b, 0) + 1
        want_tok[b] = want_tok.get(b, 0) + words.count(w)
    rows = {
        r["bucket"]: (r["n_tokens"], r["n_words"]) for r in got.to_pylist()
    }
    assert rows == {b: (want_tok[b], want_voc[b]) for b in want_voc}


def test_knn_accuracy_matches_brute(ray_session):
    import ray.data

    from mothray.ops import ann

    rng = np.random.default_rng(42)
    n, dim, k = 60, 8, 3
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    labels = rng.integers(0, 3, n)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(mat), pa.list_(pa.float32())),
                "label": pa.array(labels.astype(np.int32)),
            }
        )
    ).repartition(4)
    got = {r["label"]: r for r in ann.knn_accuracy(ds, k=k).to_pylist()}

    m = mat.astype(np.float64)
    unit = m / np.linalg.norm(m, axis=1)[:, None]
    sims = unit @ unit.T
    want = {}
    for i in range(n):
        s = sims[i].copy()
        s[i] = -np.inf
        order = sorted(range(n), key=lambda j: (-s[j], j))[:k]
        vals, cnts = np.unique(labels[np.array(order)], return_counts=True)
        pred = vals[cnts == cnts.max()].min()
        lab = int(labels[i])
        nt, nc = want.get(lab, (0, 0))
        want[lab] = (nt + 1, nc + int(pred == lab))
    for lab, (nt, nc) in want.items():
        assert got[lab]["n"] == nt
        assert got[lab]["n_correct"] == nc
        assert got[lab]["accuracy"] == nc / nt


def test_fd_check_counts(ray_session):
    import ray.data

    from mothray.ops import profile

    tbl = pa.table(
        {
            "d": pa.array([1, 1, 2, 2, 2, 3, None, 4], pa.int64()),
            "v": pa.array(["a", "b", "c", "c", "d", "e", "f", None]),
        }
    )
    got = profile.fd_check(
        ray.data.from_arrow(tbl).repartition(3), "d", "v"
    ).to_pylist()[0]
    # keys 1 (a,b), 2 (c,d), 3 (e); null det and null dep rows drop
    assert got == {"n_keys": 3, "n_violating": 2, "max_distinct": 2, "surplus": 2}


def test_topn_other_rollup(ray_session):
    import ray.data

    from mothray.ops import extreme

    tbl = pa.table(
        {"g": pa.array(["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d", None])}
    )
    got = extreme.topn_other(
        ray.data.from_arrow(tbl).repartition(3), "g", n=2
    ).to_pylist()
    rows = {r["value"]: r["cnt"] for r in got}
    assert rows == {"a": 5, "b": 3, "OTHER": 4}  # c(2) + d(1) + NULL(1)
