"""FSST string compression (Boncz, Neumann, Leis — "FSST: Fast Random
Access String Compression", VLDB 2020).

North-star extension (BASELINE.json north_star): NOT present in the
reference repo; built from the published paper. A symbol table of up
to 255 symbols (1..8 bytes each) is trained on a sample; the corpus is
then encoded as 1-byte codes, with code 255 escaping a literal byte.

API:
  compress(data: bytes)   -> (symbol_table: bytes, encoded: bytes)
  decompress(table, encoded, raw_size) -> bytes

This module currently ships the API with a passthrough implementation
(empty table => encoded bytes are raw); the trained encoder lands in a
follow-up commit. Callers must treat `table == b""` as passthrough.
"""

from __future__ import annotations


def compress(data: bytes) -> tuple[bytes, bytes]:
    return b"", data


def decompress(table: bytes, encoded: bytes, raw_size: int) -> bytes:
    if not table:
        return encoded
    raise NotImplementedError("FSST decode requires a symbol table implementation")
