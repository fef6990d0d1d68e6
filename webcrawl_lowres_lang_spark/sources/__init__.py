"""Sources: deterministic synthetic fixtures (the closed 'web' used for
crawl parity testing — FIXTURES.md) and the snapshot-table storage layer."""
