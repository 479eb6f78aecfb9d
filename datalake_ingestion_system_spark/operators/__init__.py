"""Reusable dataset-level operators (dedup, similarity, text, as-of, media).

Each operator takes and returns DataFrames so Catalyst sees one connected
plan — filters keep pushing down through them and AQE re-plans shuffles.
"""
