"""Physics module registry: input-deck name -> module class.

Reference: src/physics/physicsImporter.cpp:48-199.
"""

from __future__ import annotations

__all__ = ["register", "import_physics", "available_modules"]

_REGISTRY: dict[str, type] = {}


def register(deck_name: str):
    def deco(cls):
        _REGISTRY[deck_name] = cls
        return cls
    return deco


def available_modules():
    _ensure_imported()
    return sorted(_REGISTRY)


def import_physics(names, settings=None, dim=2):
    """Instantiate physics modules from deck names (comma list or list)."""
    _ensure_imported()
    if isinstance(names, str):
        names = [n.strip() for n in names.split(",") if n.strip()]
    modules = []
    for n in names:
        # 'use crystal elasticity' swaps the anisotropic variant in
        # (reference: linearelasticity.cpp useCE constructs a
        # CrystalElastic for computeStress)
        if (n == "linearelasticity" and settings
                and settings.get("use crystal elasticity", False)):
            n = "crystal elasticity"
        if n not in _REGISTRY:
            raise KeyError(f"unknown physics module {n!r}; "
                           f"available: {available_modules()}")
        modules.append(_REGISTRY[n](settings or {}, dim))
    return modules


def _ensure_imported():
    # import all module files so their @register decorators run
    import importlib
    for mod in ("thermal", "ode", "cdr", "burgers", "linearelasticity",
                "stokes", "navierstokes", "shallowwater", "helmholtz",
                "porous", "porous_mixed", "porous_mixed_hybrid",
                "porous_weak_galerkin", "maxwell", "shallowwater_hybridized",
                "msphasefield",
                "hartmann", "shallowice", "kuramoto_sivashinsky",
                "euler", "cns", "variable_density_ns", "incompressible_saturation",
                "llamas", "physics_test", "maxwells_fp",
                "crystal_elasticity", "phasesolidification"):
        try:
            importlib.import_module(f"mrhyde_tpu.physics.{mod}")
        except ImportError:
            pass
