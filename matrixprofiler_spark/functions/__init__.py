"""Column-level helper functions (text analysis, fingerprints)."""
