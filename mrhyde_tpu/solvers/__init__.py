from mrhyde_tpu.solvers.linear import solve_linear  # noqa: F401
from mrhyde_tpu.solvers.nonlinear import newton_solve  # noqa: F401
from mrhyde_tpu.solvers.time_integration import (  # noqa: F401
    butcher_tableau, bdf_weights, TransientIntegrator)
