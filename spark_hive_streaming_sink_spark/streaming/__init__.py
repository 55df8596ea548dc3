"""Streaming modules (sink + streaming operators)."""
