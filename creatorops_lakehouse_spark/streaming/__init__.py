"""Structured Streaming slice: the Bronze→Silver contract pipe and windowed
KPI aggregation as streams (SURVEY.md §2.8 streaming-parity surface).

The reference is batch-only by design (README.md:112); this package is the
engine's streaming upgrade path: readStream NDJSON → the SAME silver
transform functions (they are pure DataFrame→DataFrame, so batch and
streaming share one implementation) → watermarked windowed aggregates /
foreachBatch table sinks.
"""
