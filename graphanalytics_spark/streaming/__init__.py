"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.8 — its 'streaming' is HLS
dataflow FIFOs inside a kernel, not an unbounded-data semantic), so
streaming is a thin, optional layer here: incremental edge ingestion and
windowed event aggregation, demonstrating that the engine's edge model and
metrics plumbing compose with ``readStream``/``writeStream``.
"""
