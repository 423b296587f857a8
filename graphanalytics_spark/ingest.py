"""Ingest: repos table → repo-link edge table.

The Spark-first restatement of the reference's Stage A (file parsers →
edge list → CSR, SURVEY.md §3.1): read the (repo, path, commit, lang,
content) table, extract import/reference targets from ``content`` with a
vectorized regex inside ``mapInPandas`` (Arrow batches; no per-row Python
UDFs per BASELINE.json:input_hint), resolve targets to repos, and build the
weighted edge table (src, dst, weight) over dense vertex ids.

Per-row invariant: sha256(content) — computed JVM-side with ``F.sha2``
(column expression, whole-stage codegen) and compared against the
generation-time hash in tests.

Scale: the regex extraction is embarrassingly parallel (mapInPandas over
the file table, no shuffle); the only shuffles are the final
groupBy(src_repo, dst_repo) weight aggregation and the two broadcast-sized
dimension joins (the vertex dimension is tiny relative to the file table —
#repos ≪ #files by orders of magnitude at 10^12 files).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

# matches the link syntaxes of FIXTURES.md / fixtures.py:
#   import repoNNNNN/..., require("repoNNNNN/..."), use repoNNNNN/...;
_LINK_RE = re.compile(r"(repo\d{5})/[\w/.\-]*")


def with_sha256(repos: DataFrame) -> DataFrame:
    """Append the per-row content hash (invariant column) — pure column
    expression, pushed through codegen."""
    return repos.withColumn("content_sha256", F.sha2(F.col("content"), 256))


def extract_links(repos: DataFrame) -> DataFrame:
    """(repo, content) → (src_repo, dst_repo) link rows, one per reference
    occurrence. Vectorized: pandas str.findall over Arrow batches."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hits = pdf["content"].str.findall(_LINK_RE)
            out = pd.DataFrame(
                {"src_repo": pdf["repo"].values, "targets": hits.values}
            ).explode("targets")
            out = out.dropna(subset=["targets"])
            out = out[out["src_repo"] != out["targets"]]
            yield out.rename(columns={"targets": "dst_repo"})[
                ["src_repo", "dst_repo"]
            ]

    return repos.select("repo", "content").mapInPandas(
        extract, schema="src_repo string, dst_repo string"
    )


def vertex_dimension(repos: DataFrame, partitions: int | None = None) -> DataFrame:
    """Dense vertex ids for every repo (vid: long, repo: string),
    deterministic: vid = rank of the repo name in global sort order
    (identical to SQL ``dense_rank() OVER (ORDER BY repo) - 1`` — the
    oracle's definition — since repos are distinct).

    Distributed two-pass assignment, NOT a global window (an empty-over()
    dense_rank funnels every row through ONE task — fine for thousands of
    repos, a bottleneck at 10^8): see graph.dense_ids."""
    from graphanalytics_spark.graph import dense_ids

    return dense_ids(
        repos.select("repo"), "repo", "vid", partitions=partitions
    ).select("vid", "repo")


def build_edges(repos: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full ingest: returns (edges, vertex_dim) where edges is the directed
    weighted repo-link table (src, dst, weight=link count) over dense ids.
    """
    links = extract_links(repos)
    weighted = links.groupBy("src_repo", "dst_repo").agg(
        F.count("*").cast("double").alias("weight")
    )
    dim = vertex_dimension(repos)
    e = (
        weighted.join(
            F.broadcast(dim.withColumnRenamed("repo", "src_repo")), "src_repo"
        )
        .withColumnRenamed("vid", "src")
        .join(F.broadcast(dim.withColumnRenamed("repo", "dst_repo")), "dst_repo")
        .withColumnRenamed("vid", "dst")
        .select("src", "dst", "weight")
    )
    return e, dim
