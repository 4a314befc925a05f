"""Training engine: per-param-group optimizers, the jit/pjit train step,
trainer loop with eval cadence + Orbax checkpointing, and the method-registry
CLI."""
