from mrhyde_tpu.analysis.adjoint import make_stage_solver  # noqa: F401
from mrhyde_tpu.analysis.forward_ad import DifferentiableForward  # noqa: F401
