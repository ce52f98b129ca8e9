"""Fuzzy (edit-distance) join tests: the banded-DP distance kernel is
pinned against a Python reference Levenshtein (codepoint semantics,
including non-ASCII), and the FastSS-blocked joins against brute force
over small corpora with seeded near-duplicates."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mothray.ops import fuzzy


def ref_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def clamp(d: int, m: int) -> int:
    return d if d <= m else m + 1


# ---------------------------------------------------------------- kernel


@pytest.mark.parametrize("max_dist", [1, 2])
def test_edit_distances_known(max_dist):
    pairs = [
        ("", ""), ("", "a"), ("a", ""), ("abc", "abc"),
        ("abc", "abd"), ("abc", "abcd"), ("abc", "bc"), ("abc", "xyz"),
        ("kitten", "sitting"), ("flaw", "lawn"),
        ("Customer#000000001", "Customer#000000002"),
        ("café", "cafe"),           # unicode: 1 substitution
        ("你好", "你"),      # CJK: 1 deletion
        ("naïve", "naive"),
    ]
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = fuzzy.edit_distances(a, b, max_dist)
    want = [clamp(ref_lev(x, y), max_dist) for x, y in pairs]
    assert got.tolist() == want


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdeé", max_size=8),
            st.text(alphabet="abcdeé", max_size=8),
        ),
        max_size=16,
    ),
    st.sampled_from([1, 2]),
)
def test_edit_distances_hypothesis(pairs, max_dist):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = fuzzy.edit_distances(a, b, max_dist)
    want = [clamp(ref_lev(x, y), max_dist) for x, y in pairs]
    assert got.tolist() == want


# ------------------------------------------------------------- blocking


def _variant_sets(words, max_dist):
    arr = pa.array(words, type=pa.string())
    vsets = [set() for _ in words]
    counts = [0] * len(words)
    for col, mask in fuzzy._variant_arrays(arr, max_dist):
        keep = mask.to_pylist() if mask is not None else [True] * len(words)
        for i, (v, k) in enumerate(zip(col.to_pylist(), keep)):
            if k:
                vsets[i].add(v)
                counts[i] += 1
    return vsets, counts


@pytest.mark.parametrize("max_dist", [1, 2])
def test_variant_blocking_lossless(max_dist):
    """Any two strings within max_dist share a deletion variant."""
    words = ["grape", "grapes", "rape", "grppe", "gape", "grapple", "pear"]
    vsets, _ = _variant_sets(words, max_dist)
    for i in range(len(words)):
        for j in range(i + 1, len(words)):
            if ref_lev(words[i], words[j]) <= max_dist:
                assert vsets[i] & vsets[j], (words[i], words[j])


def test_variant_fan_out_masks_short_rows():
    """A short string in a batch with a long one must emit only its
    own deletion variants, not (max_len - len) no-op copies (the
    duplicate copies all land in one group and inflate pairing
    quadratically)."""
    words = ["ab", "x" * 40]
    _, counts = _variant_sets(words, 2)
    # 'ab': 1 (zero-del) + 2 (one-del) + 1 (two-del) rows
    assert counts[0] == 4
    _, counts1 = _variant_sets(words, 1)
    assert counts1[0] == 3


def test_nul_codepoint_semantics():
    """U+0000 is a real codepoint: 'a\\x00' is distance 1 from 'a',
    and an embedded NUL substitution is distance 1 (regression: the
    NUL-padded buffer conflated padding with content)."""
    got = fuzzy.edit_distances(["a\x00", "a\x00b", "a"], ["a", "axb", "a\x00"], 2)
    assert got.tolist() == [1, 1, 1]


def test_long_string_guard():
    arr = pa.array(["x" * 2000], type=pa.string())
    with pytest.raises(ValueError, match="short-string"):
        fuzzy._variant_arrays(arr, 1)


# ---------------------------------------------------------------- joins


def _corpus():
    # seeded near-duplicates plus an exact-dup pair and a null
    vals = [
        "martha", "marthe",      # ed 1
        "jellyfish", "jellyfis", # ed 1
        "smith", "smyth",        # ed 1
        "alpha", "alpha",        # ed 0
        "zzzzz", None,
    ]
    return pa.table({"id": pa.array(range(10), pa.int64()),
                     "val": pa.array(vals, pa.string())})


def _brute_pairs(t: pa.Table, max_dist: int):
    ids = t.column("id").to_pylist()
    vals = t.column("val").to_pylist()
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if vals[i] is None or vals[j] is None:
                continue
            d = ref_lev(vals[i], vals[j])
            if d <= max_dist:
                out.add((ids[i], ids[j], d))
    return out


@pytest.mark.parametrize("max_dist", [1, 2])
def test_fuzzy_self_join(ray_session, max_dist):
    import ray.data

    t = _corpus()
    ds = ray.data.from_arrow(t).repartition(3)
    got = fuzzy.fuzzy_self_join(ds, "val", "id", max_dist=max_dist).to_pandas()
    pairs = {
        (min(l, r), max(l, r), d)
        for l, r, d in zip(got["l_id"], got["r_id"], got["dist"])
    }
    assert pairs == _brute_pairs(t, max_dist)
    # each pair exactly once
    assert len(got) == len(pairs)


def test_fuzzy_two_sided_join(ray_session):
    import ray.data

    lt = pa.table({"lid": pa.array([1, 2, 3], pa.int64()),
                   "name": pa.array(["anna", "bob", None], pa.string())})
    rt = pa.table({"rid": pa.array([10, 11, 12], pa.int64()),
                   "name": pa.array(["ana", "rob", "anna"], pa.string())})
    out = fuzzy.fuzzy_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        on="name", id_columns=("lid", "rid"), max_dist=1,
    ).to_pandas()
    got = {(l, r, d) for l, r, d in zip(out["l_id"], out["r_id"], out["dist"])}
    assert got == {(1, 10, 1), (1, 12, 0), (2, 11, 1)}


def test_max_dist_validation():
    with pytest.raises(ValueError):
        fuzzy.fuzzy_self_join(None, "v", "i", max_dist=3)


def test_set_similarity_join_matches_brute(ray_session):
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray.ops import fuzzy

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = {}
    base = [vocab[i] for i in range(12)]
    for i in range(20):
        words = list(base)
        for _ in range(int(rng.integers(0, 4))):  # mutate a little
            words[int(rng.integers(0, len(words)))] = vocab[int(rng.integers(0, 30))]
        docs[i] = " ".join(words + [words[0]])  # duplicate word: set semantics
    for i in range(20, 26):  # unrelated docs
        docs[i] = " ".join(vocab[int(rng.integers(0, 30))] for _ in range(8))
    tbl = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values())),
        }
    )
    got = fuzzy.set_similarity_join(
        ray.data.from_arrow(tbl).repartition(4), "doc_id", "text", 7, 10
    ).take_all()
    got_pairs = {(r["d1"], r["d2"]): (r["inter"], r["n1"], r["n2"]) for r in got}

    sets = {d: set(t.split(" ")) - {""} for d, t in docs.items()}
    want = {}
    for a, b in itertools.combinations(sorted(docs), 2):
        i = len(sets[a] & sets[b])
        u = len(sets[a]) + len(sets[b]) - i
        if i * 10 >= u * 7:
            want[(a, b)] = (i, len(sets[a]), len(sets[b]))
    assert got_pairs == want
    assert want  # fixture must actually produce similar pairs
