from mrhyde_tpu.assembly.discretization import Discretization  # noqa: F401
from mrhyde_tpu.assembly.assembler import Assembler  # noqa: F401
from mrhyde_tpu.assembly.workset import Workset  # noqa: F401
