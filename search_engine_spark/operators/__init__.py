"""Engine operators: index construction, posting-block building/merging,
query-time scoring, dedup, similarity search, text analysis."""
