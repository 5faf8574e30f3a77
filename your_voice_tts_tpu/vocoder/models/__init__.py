"""Vocoder model zoo."""
