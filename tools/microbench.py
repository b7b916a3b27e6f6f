#!/usr/bin/env python
"""Numerical-kernel micro-benchmarks (parity with the reference's
verification scripts misc/svd_speed.py and misc/eigen.py).

Compares, on the current backend:
  * batched weighted Procrustes: Horn/Jacobi (ours) vs jnp.linalg.svd --
    the experiment that justifies avoiding a general SVD on TPU, mirroring
    the reference's CPU-vs-GPU SVD study;
  * NSM leading eigenvector: fixed power iteration vs jnp.linalg.eigh,
    reporting accuracy agreement and wall time.

Usage: python tools/microbench.py [--batch 4096] [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=20):
    import jax

    jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--k", type=int, default=40)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pointdsc_tpu.ops.eig import power_iteration
    from pointdsc_tpu.ops.procrustes import rotation_from_covariance
    from pointdsc_tpu.ops.se3 import integrate_trans

    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()} {jax.devices()[0]}")

    # ---- Procrustes rotation: Horn/Jacobi vs jnp SVD --------------------
    H = jnp.asarray(rng.normal(size=(args.batch, 3, 3)).astype(np.float32))

    @jax.jit
    def horn(H):
        return rotation_from_covariance(H)

    @jax.jit
    def svd_rot(H):
        U, S, Vt = jnp.linalg.svd(H)
        V = jnp.swapaxes(Vt, -1, -2)
        d = jnp.sign(jnp.linalg.det(V @ jnp.swapaxes(U, -1, -2)))
        D = jnp.zeros_like(H).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
        D = D.at[..., 2, 2].set(d)
        return V @ D @ jnp.swapaxes(U, -1, -2)

    R_h = horn(H)
    R_s = svd_rot(H)
    agreement = float(jnp.max(jnp.abs(R_h - R_s)))
    t_h = timeit(horn, H, iters=args.iters)
    t_s = timeit(svd_rot, H, iters=args.iters)
    print(f"[procrustes {args.batch}x3x3] horn={t_h*1e3:.3f}ms "
          f"jnp.svd={t_s*1e3:.3f}ms speedup={t_s/t_h:.2f}x "
          f"max|dR|={agreement:.2e}")

    # ---- leading eigenvector: power iteration vs eigh -------------------
    A = rng.normal(size=(args.batch, args.k, args.k)).astype(np.float32)
    M = jnp.asarray(np.abs(A @ np.swapaxes(A, -1, -2)))

    @jax.jit
    def power(M):
        return power_iteration(M, 10)

    @jax.jit
    def eigh_lead(M):
        _, V = jnp.linalg.eigh(M)
        return V[..., -1]

    v_p = power(M)
    v_e = eigh_lead(M)
    cos = jnp.abs(jnp.sum(v_p * v_e, -1)) / (
        jnp.linalg.norm(v_p, axis=-1) * jnp.linalg.norm(v_e, axis=-1)
    )
    t_p = timeit(power, M, iters=args.iters)
    t_e = timeit(eigh_lead, M, iters=args.iters)
    print(f"[leading-eig {args.batch}x{args.k}x{args.k}] power={t_p*1e3:.3f}ms "
          f"eigh={t_e*1e3:.3f}ms speedup={t_e/t_p:.2f}x "
          f"median cos agreement={float(jnp.median(cos)):.6f}")


if __name__ == "__main__":
    main()
