"""Utilities: colormaps, LPIPS, profiling, logging."""
