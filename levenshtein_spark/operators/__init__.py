"""Pipeline operators: normalize → block → pair → score → cluster, plus the
training-data operators (dedup, similarity search, text analysis)."""
