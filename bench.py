"""Benchmark: element-Jacobian assembly throughput on TPU.

The BASELINE.json headline metric. Assembles the full element-block
Jacobian + residual (gather -> AD seeding -> physics kernel -> jacfwd ->
segment-sum scatter) for a 2D thermal problem, and reports throughput in
GDOF/s = (n_elem * ndof_per_elem) / wall_time / 1e9 — global element-dof
rows assembled per second.

The reference publishes no numbers (BASELINE.md); vs_baseline is
measured against a fixed reference target of 1 GDOF/s so the ratio is
comparable across rounds.

Prints ONE JSON line.
"""

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp

    nx = int(os.environ.get("BENCH_NX", "512"))
    reps = int(os.environ.get("BENCH_REPS", "5"))

    from mrhyde_tpu.assembly.assembler import TimeCoeffs
    from mrhyde_tpu.problem import Problem

    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": nx, "NY": nx},
        "Functions": {
            "thermal source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"e": {"all boundaries": 0.0}}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state"},
    }
    p = Problem(cfg)
    asm = p.assembler
    dtype = jnp.zeros(0).dtype
    tc = TimeCoeffs.steady(p.n_dof, dtype=dtype)
    u = jnp.zeros(p.n_dof, dtype=dtype)

    inner = int(os.environ.get("BENCH_INNER", "10"))

    @jax.jit
    def assemble_loop(u, tc):
        # chain `inner` assemblies inside ONE device program so the
        # measurement reflects device throughput, not host dispatch
        def body(carry, _):
            u = carry
            r = asm.residual(u, tc, None)
            J = asm.jacobian(u, tc, None)
            u = u + 1e-12 * (r + J.vol.sum() * 0)
            return u, jnp.sum(J.vol)
        u, s = jax.lax.scan(body, u, None, length=inner)
        return u, s

    uo, s = assemble_loop(u, tc)
    s.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(reps):
        uo, s = assemble_loop(u, tc)
    s.block_until_ready()
    dt = (time.perf_counter() - t0) / (reps * inner)

    n_elem = asm.lids.shape[0]
    nd = asm.lids.shape[1]
    gdofs = n_elem * nd / dt / 1e9
    print(json.dumps({
        "metric": "element_jacobian_assembly",
        "value": round(gdofs, 4),
        "unit": "GDOF/s",
        "vs_baseline": round(gdofs / 1.0, 4),
    }))


if __name__ == "__main__":
    main()
