"""Utilities: image IO, PSNR, profiling scopes, graph dumps."""
