"""Distributed graph operators (the engine's algorithm layer).

Each operator is a from-scratch PySpark implementation anchored to a
reference capability (SURVEY.md §2.10): PageRank / connected components /
label propagation / triangle counting replace the reference's
FPGA-kernelized Louvain / MIS / cosine pipelines as the engine's iterative
workloads; MIS, modularity, contraction and n-hop mirror reference
operators directly.

Import submodules directly (``from graphanalytics_spark.operators import
pagerank`` then ``pagerank.pagerank(...)``) — no function re-exports here
so module names stay unshadowed.
"""
