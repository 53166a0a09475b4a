"""Medallion pipelines: Bronze ingest → Silver contract split → Gold KPIs.

Each stage is a pure ``DataFrame -> DataFrame`` transform plus a thin
``run_*`` wrapper doing table I/O — the purity is what lets the driver
harness and unit tests exercise the same code over arbitrary inputs.
"""
