"""Constants shared across the thematic query modules.

Kept separate to break import cycles between themes: these are leaf
values with no imports of their own.
"""

# embeddings.parquet vector dimensionality (repo:TESTDATA.md)
_DIM = 64

# DuckDB-side distinct word 3-grams from the `t` token-list column
# (lowercase whitespace tokens, space-joined windows, distinct) — the
# shared oracle building block of the n-gram near-dup / novelty family.
_NGRAMS3 = (
    "list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 0)),"
    " i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
)
