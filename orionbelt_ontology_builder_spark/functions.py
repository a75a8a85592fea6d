"""Public column-expression library (the engine's "UDF surface").

The reference exposes no user-extensible functions (SURVEY.md §2.12) —
its Python helpers become either native Catalyst expressions (listed
here; whole-stage-codegen'd, no Python at runtime) or Arrow-batched
pandas UDFs (in ``pipeline.extract`` / ``datapipe.multimodal``).  This
module is the stable import point for the native ones.
"""

from __future__ import annotations

from .datapipe.dedup import dot_expr, shingles_expr
from .datapipe.textstats import norm_col, tokens_col
from .model import (
    is_bnode,
    local_name_col,
    namespace_col,
    to_uri_col,
)
from .pipeline.linking import minhash_signature, shingles

__all__ = [
    "local_name_col",
    "to_uri_col",
    "namespace_col",
    "is_bnode",
    "norm_col",
    "tokens_col",
    "shingles",
    "shingles_expr",
    "minhash_signature",
    "dot_expr",
]
