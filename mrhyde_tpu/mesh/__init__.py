from mrhyde_tpu.mesh.structured import Mesh, box_mesh  # noqa: F401
