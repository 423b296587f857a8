"""Column-level / table-level analytic functions.

Re-expressions of the reference's cosine-similarity and fuzzy-match
products plus the training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) a 100 TB corpus needs.
Import submodules directly — no re-exports, so module names stay
unshadowed.
"""
