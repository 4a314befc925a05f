"""Compute ops: encodings, MLPs, contraction, samplers, rendering, losses,
metrics. Pure-functional jnp/Pallas; params are explicit pytrees."""
