from mrhyde_tpu.multiscale.subgrid import SubgridDtN  # noqa: F401
