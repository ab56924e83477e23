"""Crawl plans: the wave-loop frontier scheduler."""
