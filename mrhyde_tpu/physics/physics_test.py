"""physicsTest module (reference: src/physics/physics_test.cpp):
a procedural test module exercising basis/solution-field plumbing;
its residual is simple diffusion so the pipeline can be validated.
"""

from __future__ import annotations

from mrhyde_tpu.physics.base import PhysicsModule
from mrhyde_tpu.physics.registry import register

__all__ = ["PhysicsTest"]


@register("physicsTest")
class PhysicsTest(PhysicsModule):
    name = "physicsTest"

    def variables(self):
        return [("e", "HGRAD", 1)]

    def define_functions(self, fm, fs):
        fm.add_function("test source", self._f(fs, "test source", 0.0),
                        "ip")

    def volume_residual(self, wk):
        wk.add_source("e", wk.sol_dot("e") - wk.qp(wk.f("test source")))
        wk.add_flux("e", wk.grad("e"))
