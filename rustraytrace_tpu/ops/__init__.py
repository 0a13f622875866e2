"""Compute ops: sampling, intersection, shading, textures, integrators."""
