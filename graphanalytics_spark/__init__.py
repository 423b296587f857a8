"""graphanalytics_spark — a PySpark-native link-graph analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference FPGA graph-analytics product (community detection, independent
sets, similarity/top-K, n-hop traversal, fuzzy match) as distributed
DataFrame programs: PageRank, connected components, label propagation,
triangle counting, MIS, cosine top-K, Levenshtein fuzzy match, plus the
dedup / similarity-search / text-analysis operators a large-scale
training-data pipeline needs.

Design principles (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst + AQE pick physical strategies.
- Vectorized pandas/Arrow UDFs only — never per-row Python.
- Iterative algorithms checkpoint lineage every k iterations and persist
  static join sides once per run.
- Skew (hub vertices) handled by two-stage salted aggregation + AQE
  skew-join; small dimension sides broadcast explicitly.
"""

__version__ = "0.1.0"

from graphanalytics_spark.session import get_spark  # noqa: F401
