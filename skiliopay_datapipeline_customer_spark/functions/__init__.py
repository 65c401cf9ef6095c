"""Scalar/feature column library — the engine's F1-F19 surface (SURVEY §2.8)."""
