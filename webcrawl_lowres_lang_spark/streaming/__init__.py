"""Incremental crawl-round loop (iterative batch, SURVEY T1-T7) with
snapshot checkpoints and resume."""
