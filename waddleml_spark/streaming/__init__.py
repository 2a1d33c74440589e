"""Streaming path (SURVEY.md §2.10): live metric broadcast, windowed
aggregation, and the sampler feed."""
