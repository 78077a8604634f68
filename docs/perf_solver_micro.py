"""Microbench: which Newton-body op scales superlinearly with batch?

Times isolated vmapped ops on humanoid-like shapes (nv=27, nefc=500)
at several batch sizes.  Round-5: B=1024->4096 made the measured cost
per Newton iteration ~18x, so one of these lowers pathologically.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    nv, nefc = 27, 500
    for B in (1024, 2048, 4096):
        key = jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        A = jax.random.normal(k1, (B, nv, nv), jnp.float32)
        H = jnp.einsum("bij,bkj->bik", A, A) + 10 * jnp.eye(nv)
        g = jax.random.normal(k2, (B, nv), jnp.float32)
        J = jax.random.normal(k3, (B, nefc, nv), jnp.float32)
        x = jax.random.normal(k4, (B, nv), jnp.float32)
        hw = jnp.abs(jax.random.normal(k1, (B, nefc), jnp.float32))

        from dm_control_tpu.ops import linalg as ops_linalg

        chol = jax.jit(jax.vmap(ops_linalg.chol_solve))
        t_chol = timeit(chol, H, g)

        jx = jax.jit(lambda J, x: jnp.einsum("bev,bv->be", J, x))
        t_jx = timeit(jx, J, x)

        jtd = jax.jit(lambda J, hw: jnp.einsum("bev,be->bv", J, hw))
        t_jtd = timeit(jtd, J, hw)

        hbuild = jax.jit(lambda J, hw: jnp.einsum(
            "bev,be,bew->bvw", J, hw, J))
        t_h = timeit(hbuild, J, hw)

        # row-space elementwise chain (the _cost_terms analogue)
        def rows(jar):
            for _ in range(6):
                jar = jnp.where(jar > 0, jar * 1.01, jar * 0.99) + 0.1
            return jar
        rows_j = jax.jit(rows)
        jar = jnp.abs(jax.random.normal(k2, (B, nefc), jnp.float32))
        t_rows = timeit(rows_j, jar)

        print(f"B={B}: chol={t_chol:.2f}ms Jx={t_jx:.2f}ms "
              f"JTd={t_jtd:.2f}ms Hbuild={t_h:.2f}ms rows={t_rows:.2f}ms",
              flush=True)


if __name__ == "__main__":
    main()
