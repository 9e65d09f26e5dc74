"""Crawl frontier: seen-filter shards, politeness, round scheduler,
checkpoint/resume, BFS ordering oracle."""
