"""Storage layer: table formats, NDJSON sources, lakehouse layout."""
