"""Operator library: relational surface + LLM-pipeline extensions."""
