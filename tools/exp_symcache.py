#!/usr/bin/env python
"""Experiment: symmetric int8 compat-cache build (upper triangle + mirror).

The spatial-consistency matrix is exactly symmetric (every term of the
gram-form distance math commutes entrywise), so computing the strict lower
triangle is redundant: build the B(B+1)/2 upper-triangular square tiles via
a scalar-prefetched linear grid, then mirror the strictly-upper tiles into
the lower half with an aliased transpose-copy pass.

Validates bitwise equality vs the production builder and times both.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("PROFILE_N", 20480))
BLK = int(os.environ.get("SYM_BLOCK", 1024))
ITERS = int(os.environ.get("PROFILE_ITERS", 16))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import bench
    from pointdsc_tpu.kernels.sc_attention import (
        _compat_cache_kernel, _build_compat_cache_single, pack_geometry)
    from pointdsc_tpu.data.synthetic import SyntheticPairDataset

    b = BLK
    nb = N // b
    # upper-triangular (incl. diagonal) tile list
    ut = np.array([(i, j) for i in range(nb) for j in range(i, nb)],
                  dtype=np.int32)
    # strictly-upper list (mirror sources)
    su = np.array([(i, j) for i in range(nb) for j in range(i + 1, nb)],
                  dtype=np.int32)
    qs_u, ks_u = jnp.asarray(ut[:, 0]), jnp.asarray(ut[:, 1])
    qs_s, ks_s = jnp.asarray(su[:, 0]), jnp.asarray(su[:, 1])

    def tri_kernel(qs_ref, ks_ref, sigma_ref, gq_ref, gk_ref, out_ref):
        _compat_cache_kernel(sigma_ref, gq_ref, gk_ref, out_ref)

    @jax.jit
    def build_tri(geom, sigma):
        sig = jnp.asarray(sigma, jnp.float32).reshape(1, 1)
        return pl.pallas_call(
            tri_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(len(ut),),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((16, b), lambda i, qs, ks: (0, qs[i])),
                    pl.BlockSpec((16, b), lambda i, qs, ks: (0, ks[i])),
                ],
                out_specs=pl.BlockSpec((b, b), lambda i, qs, ks: (qs[i], ks[i])),
            ),
            out_shape=jax.ShapeDtypeStruct((N, N), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=(32 * 1024 * 1024 if b >= 2048 else None)),
        )(qs_u, ks_u, sig, geom, geom)

    def mirror_kernel(qs_ref, ks_ref, in_ref, out_ref):
        out_ref[:] = in_ref[:].T

    @jax.jit
    def mirror(cache):
        return pl.pallas_call(
            mirror_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(len(su),),
                in_specs=[
                    pl.BlockSpec((b, b), lambda i, qs, ks: (qs[i], ks[i])),
                ],
                out_specs=pl.BlockSpec((b, b), lambda i, qs, ks: (ks[i], qs[i])),
            ),
            out_shape=jax.ShapeDtypeStruct((N, N), jnp.int8),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=(40 * 1024 * 1024 if b >= 2048 else None)),
        )(qs_s, ks_s, cache)

    @jax.jit
    def build_sym(geom, sigma):
        return mirror(build_tri(geom, sigma))

    ds = SyntheticPairDataset(num_pairs=1, num_corr=N, inlier_ratio=0.3, seed=7)
    p = ds[0]
    sk = jnp.asarray(p["src_keypts"])
    tk = jnp.asarray(p["tgt_keypts"])
    geom = pack_geometry(sk, tk, None)

    ref = np.asarray(bench.fetch(_build_compat_cache_single(geom, 0.1)))
    sym = np.asarray(bench.fetch(build_sym(geom, 0.1)))
    eq = np.array_equal(ref, sym)
    print(f"bitwise equal vs production builder: {eq}")
    if not eq:
        d = np.abs(ref.astype(np.int32) - sym.astype(np.int32))
        print(f"  max |diff| {d.max()}, frac diff {np.mean(d > 0):.2e}")

    def timed(name, make_body, *args):
        @jax.jit
        def run(a, n_iters):
            def body(i, c):
                return make_body(i, c, *a)
            return jax.lax.fori_loop(0, n_iters, body, jnp.asarray(0.0))

        bench.fetch(run(args, ITERS))
        r = bench._loop_measure(run, (args,), iters=ITERS, iters_short=4)
        print(f"{name:34s} {r['per_iter']*1000:8.3f} ms"
              f"  (diff {r['device_diff']*1000:.3f})", flush=True)

    def prod_body(i, c, geom):
        out = _build_compat_cache_single(geom + 0.0 * c, 0.1)
        return out[777, 777].astype(jnp.float32)

    def tri_body(i, c, geom):
        out = build_tri(geom + 0.0 * c, 0.1)
        return out[777, 777].astype(jnp.float32)

    def sym_body(i, c, geom):
        out = build_sym(geom + 0.0 * c, 0.1)
        return out[777, 777].astype(jnp.float32)

    print(f"symmetric cache experiment N={N} block={b} tiles {len(ut)}"
          f"+{len(su)} vs {nb*nb}")
    timed("production builder (full grid)", prod_body, geom)
    timed("triangular compute only", tri_body, geom)
    timed("triangular + mirror (total)", sym_body, geom)


if __name__ == "__main__":
    main()
