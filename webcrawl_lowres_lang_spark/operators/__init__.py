"""Engine operators: URL-seen set (Bloom + exact), priority frontier,
politeness scheduler, synthetic fetcher, language scoring, dedup,
similarity search, text statistics."""
