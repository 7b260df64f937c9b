from mrhyde_tpu.physics.base import PhysicsModule  # noqa: F401
from mrhyde_tpu.physics.registry import import_physics, register  # noqa: F401
