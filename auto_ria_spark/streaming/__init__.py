"""Structured Streaming surfaces: continuous crawl mode + metrics stream."""
