from . import aggregates, dedup, joins, similarity, topk, windows  # noqa: F401
