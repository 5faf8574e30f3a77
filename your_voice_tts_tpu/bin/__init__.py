"""CLI entry points (reference train.py / synthesize.py / distribute.py)."""
