"""URL operators for web-corpus pipelines: parse, normalize, and
registered-domain extraction over a `url:string` column (the north-rule
webtext schema's key column; reference analog: orc-go encodes url as a
string column — pkg/store has no URL semantics, so these are engine
extensions like FSST).

All pure Arrow RE2 kernels (`pyarrow.compute.extract_regex` /
`replace_substring_regex`) so every step is exactly reproducible in SQL
(DuckDB regexp_extract / regexp_replace) and the ops carry value
oracles. No per-row Python.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# One pass over the URL: scheme, host[:port], path, ?query, #fragment.
# Anchored, all parts optional past the host, so malformed rows yield
# nulls rather than errors (RE2 has no backtracking pathologies).
_URL_RE = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#:]*)(?::(?P<port>[0-9]+))?(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>.*))?$"

# Multi-label public suffixes that the last-two-label heuristic would
# split wrong (co.uk etc.). A real pipeline ships the full public-suffix
# list as a broadcast lookup; this deliberately small set keeps the op
# SQL-reproducible while demonstrating the suffix-aware shape.
_TWO_LABEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tr", "com.ar",
)


def url_parse_batch(batch: pa.Table, column: str = "url") -> pa.Table:
    """Split a URL column into scheme / host / port / path / query /
    fragment columns (RFC-3986 common-web subset). Unparseable rows get
    null in every part. Adds columns: url_scheme, url_host, url_port
    (int64, null if absent), url_path, url_query, url_fragment."""
    u = batch.column(column)
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    parts = pc.extract_regex(u, _URL_RE)
    scheme = pc.struct_field(parts, "scheme")
    host = pc.struct_field(parts, "host")
    port = pc.struct_field(parts, "port")
    path = pc.struct_field(parts, "path")
    query = pc.struct_field(parts, "query")
    frag = pc.struct_field(parts, "fragment")
    # extract_regex yields "" for a non-participating optional group;
    # RFC treats absent port/query/fragment as null — match DuckDB's
    # regexp_extract('', ...) -> NULL convention via nullif-style masks
    port_i = pc.if_else(pc.equal(port, ""), pa.nulls(len(u), pa.int64()), pc.cast(pc.if_else(pc.equal(port, ""), "0", port), pa.int64()))
    out = batch.append_column("url_scheme", pc.utf8_lower(scheme))
    out = out.append_column("url_host", pc.utf8_lower(host))
    out = out.append_column("url_port", port_i)
    out = out.append_column("url_path", path)
    out = out.append_column("url_query", pc.if_else(pc.equal(query, ""), pa.nulls(len(u), pa.string()), query))
    out = out.append_column("url_fragment", pc.if_else(pc.equal(frag, ""), pa.nulls(len(u), pa.string()), frag))
    return out


def url_normalize_batch(batch: pa.Table, column: str = "url", out: str = "norm_url") -> pa.Table:
    """Canonical URL for dedup keys: lowercase scheme+host, strip
    fragment, strip common tracking params (utm_*, fbclid, gclid), drop
    default ports (:80 http, :443 https), collapse duplicate slashes in
    the path, drop a trailing '?' left by query stripping, rstrip a
    trailing '/' from non-root paths. Same regex chain as the DuckDB
    oracle, step for step."""
    u = batch.column(column)
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    # 1. strip fragment
    t = pc.replace_substring_regex(u, r"#.*$", "")
    # 2. lowercase scheme://host[:port] (group-rewrite: lowercase cannot
    #    target a capture, so extract prefix, lowercase it, re-join)
    pre = pc.struct_field(
        pc.extract_regex(t, r"^(?P<p>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(?P<rest>.*)$"), "p"
    )
    rest = pc.struct_field(
        pc.extract_regex(t, r"^(?P<p>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(?P<rest>.*)$"), "rest"
    )
    t = pc.if_else(pc.is_valid(pre), pc.binary_join_element_wise(pc.utf8_lower(pre), rest, ""), t)
    # 3. drop default ports (RE2 has no lookahead: capture the tail)
    t = pc.replace_substring_regex(t, r"^(http://[^/:?#]*):80([/?#].*)?$", r"\1\2")
    t = pc.replace_substring_regex(t, r"^(https://[^/:?#]*):443([/?#].*)?$", r"\1\2")
    # 4. strip tracking params (leading or mid-query), then tidy
    t = pc.replace_substring_regex(t, r"([?&])(utm_[A-Za-z]+|fbclid|gclid)=[^&#]*", r"\1")
    t = pc.replace_substring_regex(t, r"\?&+", "?")
    t = pc.replace_substring_regex(t, r"&&+", "&")
    t = pc.replace_substring_regex(t, r"[?&]$", "")
    # 5. collapse duplicate slashes in the path (not the scheme's //;
    #    RE2 has no lookbehind: anchor on the preceding non-colon/slash)
    t = pc.replace_substring_regex(t, r"([^:/])//+", r"\1/")
    # 6. rstrip trailing slash from a non-root path (no query present)
    t = pc.replace_substring_regex(t, r"^([a-z][a-z0-9+.-]*://[^/?#]+(?:/[^?#]*[^/?#]))/$", r"\1")
    return batch.append_column(out, t)


def registered_domain_batch(batch: pa.Table, host_column: str = "url_host", out: str = "domain") -> pa.Table:
    """Registered domain (site key for host-level grouping/skew salting):
    last two labels of the host, or last THREE when the two-label tail
    is a known public suffix (co.uk and friends). IP-literal hosts pass
    through unchanged."""
    h = batch.column(host_column)
    if isinstance(h, pa.ChunkedArray):
        h = h.combine_chunks()
    two = pc.struct_field(pc.extract_regex(h, r"(?P<d>[^.]+\.[^.]+)$"), "d")
    three = pc.struct_field(pc.extract_regex(h, r"(?P<d>[^.]+\.[^.]+\.[^.]+)$"), "d")
    is_ip = pc.match_substring_regex(h, r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$")
    suffixed = pc.is_in(two, value_set=pa.array(_TWO_LABEL_SUFFIXES))
    dom = pc.if_else(pc.and_kleene(suffixed, pc.is_valid(three)), three, two)
    dom = pc.if_else(is_ip, h, pc.if_else(pc.is_valid(dom), dom, h))
    return batch.append_column(out, dom)


def url_pipeline(ds, column: str = "url"):
    """parse -> normalize -> registered domain, one fused map_batches."""

    def run(batch: pa.Table) -> pa.Table:
        b = url_parse_batch(batch, column)
        b = url_normalize_batch(b, column)
        return registered_domain_batch(b)

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)
