"""Structured Streaming surface (see stream_pipeline.py)."""
