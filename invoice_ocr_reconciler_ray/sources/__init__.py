"""Sources: parquet/CSV/JSON readers and the deterministic page synthesizer."""
