"""Vendored model artifacts (mini-BPE merges; see tools/train_bpe.py)."""
