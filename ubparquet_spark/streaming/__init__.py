"""Structured Streaming surface over event-time tables."""
