"""Structured Streaming adapters.

The crawl engine itself is a micro-batch *driver loop* (the
parse->frontier feedback edge is cyclic — inexpressible as one
streaming query, SURVEY.md §2.5).  This package holds the acyclic
streaming surfaces: live metrics aggregation and items tailing over
the epoch-versioned state dirs.
"""
