"""Engine operators: filters, selection, aggregation, group-by, and the
large-scale training-data extensions (dedup, similarity, text analysis).

Each module maps a slice of the reference operator inventory (SURVEY.md §2)
onto declarative DataFrame ops so Catalyst plans the physical execution.
"""
