"""Curation batch 2 (r05) — filled in this round."""
