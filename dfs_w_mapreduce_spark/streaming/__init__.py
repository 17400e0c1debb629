"""Structured Streaming surface over the events fixture table."""
