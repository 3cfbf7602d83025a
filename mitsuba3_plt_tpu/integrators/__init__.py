"""Integrator registry (analog of the reference's plugin name lookup)."""


def make_integrator(cfg: dict):
    t = cfg.get("type", "path")
    if t in ("path", "mispath", "direct"):
        from .path import PathIntegrator

        return PathIntegrator(
            max_depth=int(cfg.get("max_depth", 6 if t != "direct" else 2)),
            rr_depth=int(cfg.get("rr_depth", 5)),
        )
    if t == "depth":
        from .aov import DepthIntegrator

        return DepthIntegrator()
    if t in ("plt",):
        from .plt import PLTIntegrator

        return PLTIntegrator(
            max_depth=int(cfg.get("max_depth", 6)),
            rr_depth=int(cfg.get("rr_depth", 5)),
        )
    raise ValueError(f"unknown integrator type {t!r}")
