"""Minimal spark-submit job: import the engine from --py-files, run
PageRank + CC on a literal graph, print one JSON line. Used by
tests/test_submit.py to prove the packaged artifact is self-contained
(no repo on sys.path)."""

import json

from pyspark.sql import SparkSession, functions as F

from graphanalytics_spark import graph
from graphanalytics_spark.operators import components, pagerank

spark = SparkSession.builder.getOrCreate()
edges = spark.createDataFrame(
    [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (3, 4, 1.0)],
    "src long, dst long, weight double",
)
ec = graph.canonicalize(edges)
ranks = pagerank.pagerank(spark, graph.symmetrize(ec), tol=1e-9, max_iter=50)
cc = components.connected_components(spark, ec)
print(
    "SMOKE_RESULT "
    + json.dumps(
        {
            "rank_sum": round(ranks.agg(F.sum("rank")).first()[0], 9),
            "n_components": cc.select("component").distinct().count(),
        }
    )
)
spark.stop()
