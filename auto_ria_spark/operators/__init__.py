"""Custom crawl operators: Bloom seen-set, politeness top-B, robots gate."""
