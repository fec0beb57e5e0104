"""Multimodal (binary) column plumbing."""
