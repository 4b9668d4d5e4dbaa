"""Streaming-backed registry queries (availableNow replay → batch result).

Placeholder — filled in as the streaming pipelines land.
"""
