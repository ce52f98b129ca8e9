"""mothray — a Ray-Data-native per-column lightweight-compression engine.

Reimplements the capabilities of the reference (mothdb-bd/orc-go, an
ORC-v0.12-style encoder/decoder) as ray.data.Dataset pipelines over
zero-copy Arrow batches. See SURVEY.md for the full blueprint.
"""

__version__ = "0.1.0"
