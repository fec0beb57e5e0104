"""Distributed operators composing the engine's capability surface."""
