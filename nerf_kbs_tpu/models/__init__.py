"""Model families: vanilla NeRF, nerfacto, semantic NeRF-W. Pure-functional:
each model exposes init(key, cfg) -> params, forward(params, cfg, rays, ...) ->
outputs dict, loss(cfg, outputs, batch) -> (scalar, aux)."""
