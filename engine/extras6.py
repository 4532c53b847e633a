"""Extras batch 6 (r05) — filled in this round."""
