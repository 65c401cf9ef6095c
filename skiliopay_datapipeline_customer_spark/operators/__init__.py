"""Distributed operator library.

Relational primitives live directly in queries (they ARE single DataFrame
expressions); this package holds the composite operators: dedup families,
similarity search, text analysis, multimodal plumbing, exact stats.
"""
