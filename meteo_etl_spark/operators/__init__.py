"""Relational operators: normalization (columnar unnest), keyed merge
(upsert), and the window/top-k helpers the query surface uses."""
