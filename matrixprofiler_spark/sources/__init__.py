"""Sources: the Iceberg-shaped tokens table (synthesis + derivation)."""

from .tokens import (
    TOKENS_SCHEMA,
    ensure_synth_tokens,
    synth_tokens_df,
    tokens_from_documents,
)

__all__ = [
    "TOKENS_SCHEMA",
    "ensure_synth_tokens",
    "synth_tokens_df",
    "tokens_from_documents",
]
