"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md
F1, BASELINE.json input_hint schema):

  url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Seeded + vectorized; no external data. Hosts are Zipf-distributed (hot
domains exercise url-prefix shuffle + salting), warc_ts has crawl-
session runs with occasional out-of-order jumps and a few pre-1970
corruptions, html has an incompressible tail segment in some rows,
lang is ~30 codes heavily skewed to 'en'.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LANGS = [
    "en", "ru", "de", "es", "fr", "ja", "zh", "pt", "it", "pl",
    "nl", "tr", "cs", "vi", "id", "sv", "ar", "ko", "fa", "el",
    "ro", "hu", "da", "fi", "th", "uk", "bg", "no", "hr", "lt",
]

_WORDS = (
    "the of and to in is was for that with pagina seite страница 页面 page "
    "data web crawl index archive content article news blog shop wiki help "
    "über información contenu 記事 данные"
).split()


def cc_pages(
    n_rows: int,
    seed: int = 42,
    html_len: tuple[int, int] = (200, 2000),
    text_len: tuple[int, int] = (100, 1000),
    n_hosts: int = 1000,
) -> pa.Table:
    rng = np.random.default_rng(seed)

    # --- hosts: Zipf-ish skew
    ranks = np.arange(1, n_hosts + 1)
    probs = 1.0 / ranks
    probs /= probs.sum()
    host_ids = rng.choice(n_hosts, size=n_rows, p=probs)
    tlds = np.array(["com", "org", "net", "de", "ru", "jp", "co.uk"])
    hosts = np.array([f"{_host_name(rng, i)}{i}.{tlds[i % len(tlds)]}" for i in range(n_hosts)])
    sections = np.array(["articles", "news", "products", "wiki", "blog", "category", "2023", "2024"])
    path_sec = sections[rng.integers(0, len(sections), n_rows)]
    page_id = rng.integers(0, 10_000_000, n_rows)
    urls = pa.array(
        [
            f"https://{h}/{s}/{p:07d}.html"
            for h, s, p in zip(hosts[host_ids], path_sec, page_id)
        ]
    )

    # --- warc_ts: crawl sessions (runs of identical / fixed-stride micros)
    n_sessions = max(n_rows // 200, 1)
    session_start = rng.integers(1_577_836_800, 1_723_000_000, n_sessions) * 1_000_000
    session_of = np.sort(rng.integers(0, n_sessions, n_rows))
    stride = rng.choice([0, 0, 1_000_000, 250_000], n_sessions)[session_of]
    within = np.arange(n_rows, dtype=np.int64)
    ts = session_start[session_of] + stride * within
    jump = rng.random(n_rows) < 0.01  # out-of-order jumps
    ts[jump] += rng.integers(-(10**9), 10**9, int(jump.sum())) * 1000
    corrupt = rng.random(n_rows) < 0.001  # pre-1970 corruption
    ts[corrupt] = -rng.integers(1, 10**6, int(corrupt.sum())) * 1_000_000
    warc_ts = pa.array(ts, type=pa.int64()).cast(pa.timestamp("us"))

    # --- lang: skewed
    lang_p = 1.0 / np.arange(1, len(LANGS) + 1) ** 1.5
    lang_p /= lang_p.sum()
    langs = pa.array(np.array(LANGS)[rng.choice(len(LANGS), n_rows, p=lang_p)])

    # --- text: word soup with shared vocabulary (FSST/dict-friendly)
    text = _word_soup(rng, n_rows, text_len)

    # --- html: markup around text + incompressible tail for some rows
    html_vals = []
    tail_mask = rng.random(n_rows) < 0.1
    null_mask = rng.random(n_rows) < 0.01
    empty_mask = rng.random(n_rows) < 0.01
    tpl_head = b"<!DOCTYPE html><html><head><title>p</title></head><body><div class='content'>"
    for i in range(n_rows):
        if null_mask[i]:
            html_vals.append(None)
            continue
        if empty_mask[i]:
            html_vals.append(b"")
            continue
        body = (text[i] * 3)[: rng.integers(html_len[0], html_len[1])].encode()
        tail = rng.bytes(256) if tail_mask[i] else b""
        html_vals.append(tpl_head + body + tail + b"</div></body></html>")
    html = pa.array(html_vals, type=pa.binary())

    return pa.table(
        {
            "url": urls,
            "warc_ts": warc_ts,
            "html": html,
            "text": pa.array(text),
            "lang": langs,
        }
    )


def _host_name(rng, i: int) -> str:
    syll = ["web", "data", "news", "info", "cloud", "net", "media", "open", "meta", "digi"]
    return syll[i % 10] + syll[(i // 10) % 10]


def _word_soup(rng, n_rows: int, length_range: tuple[int, int]) -> list[str]:
    words = np.array(_WORDS)
    lens = rng.integers(length_range[0], length_range[1], n_rows)
    out = []
    for i in range(n_rows):
        k = max(lens[i] // 6, 1)
        out.append(" ".join(words[rng.integers(0, len(words), k)]))
    return out
