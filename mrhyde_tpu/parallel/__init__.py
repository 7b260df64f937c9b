from mrhyde_tpu.parallel.sharding import (  # noqa: F401
    make_mesh, shard_assembler_arrays, sharded_newton_cg_step)
