from mrhyde_tpu.postprocess.errors import ErrorCalculator  # noqa: F401
