from mrhyde_tpu.functions.parser import parse_expression  # noqa: F401
from mrhyde_tpu.functions.manager import FunctionManager  # noqa: F401
