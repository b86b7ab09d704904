"""Command-line drivers (the reference's train.py / evaluate.py family)."""
