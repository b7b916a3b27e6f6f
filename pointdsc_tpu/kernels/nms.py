"""Fused seed-NMS local-max kernel (Pallas TPU).

The matrix-parallel NMS (ops/nms.py, reference PointDSC.py:199-217) needs
the [N, N] source-keypoint distance matrix. In fused-attention mode that
matrix is the last remaining O(N^2) HBM object; this kernel computes the
per-point local-max flag tile-by-tile from a packed [8, N] coordinate strip
instead:

    is_local_max[i] = all_j ( score[i] >= score[j]  or  dist(i, j) >= R )

Top-k selection over scores * is_local_max stays outside (it is O(N)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def pack_nms_geometry(src: jnp.ndarray, scores: jnp.ndarray,
                      mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """[8, N] strip: rows 0-2 src xyz, row 3 |src|^2, row 4 scores (invalid
    entries forced to -1e9 so they never suppress), rows 5-7 zeros."""
    n = src.shape[0]
    src_t = src.T.astype(jnp.float32)
    sq = jnp.sum(src * src, axis=-1)[None].astype(jnp.float32)
    s = scores[None].astype(jnp.float32)
    if mask is not None:
        s = jnp.where(mask[None], s, _NEG)
    zeros = jnp.zeros((3, n), jnp.float32)
    return jnp.concatenate([src_t, sq, s, zeros], axis=0)


def _nms_kernel(radius_ref, gq_ref, gk_ref, out_ref, acc):
    kj = pl.program_id(1)

    @pl.when(kj == 0)
    def _init():
        acc[:] = jnp.ones_like(acc)

    r = radius_ref[0, 0]
    gq = gq_ref[:]  # (8, TQ)
    gk = gk_ref[:]  # (8, TK)
    src_q, src_k = gq[0:3, :], gk[0:3, :]
    sq_q, sq_k = gq[3:4, :], gk[3:4, :]
    s_q, s_k = gq[4:5, :], gk[4:5, :]

    inner = jax.lax.dot_general(
        src_q, src_k, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TQ, TK)
    d2 = jnp.maximum(sq_q.T + sq_k - 2.0 * inner, 0.0)
    free = (s_q.T >= s_k) | (d2 >= r * r)  # (TQ, TK)
    tile_ok = jnp.min(free.astype(jnp.float32), axis=-1, keepdims=True)  # (TQ, 1)
    acc[:, 0:1] = jnp.minimum(acc[:, 0:1], tile_ok)

    @pl.when(kj == pl.num_programs(1) - 1)
    def _finalize():
        out_ref[:] = acc[:, 0:1].T  # (1, TQ)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _nms_local_max_single(geom, radius, block_q=512, block_k=1024,
                          interpret=False):
    n = geom.shape[1]
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    assert n % block_q == 0 and n % block_k == 0
    grid = (n // block_q, n // block_k)
    r = jnp.asarray(radius, jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        _nms_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, block_q), lambda qi, kj, *_: (0, qi)),
                pl.BlockSpec((8, block_k), lambda qi, kj, *_: (0, kj)),
            ],
            out_specs=pl.BlockSpec((1, block_q), lambda qi, kj, *_: (0, qi)),
            scratch_shapes=[pltpu.VMEM((block_q, 128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        interpret=interpret,
    )(r, geom, geom)
    return out[0]


def nms_local_max(src, scores, radius, mask=None, block_q=512, block_k=1024,
                  interpret=None):
    """Batched fused local-max flags [B, N] (floats in {0, 1})."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    geom = jax.vmap(lambda s, sc, m: pack_nms_geometry(s, sc, m))(
        src, scores, mask if mask is not None else jnp.ones(scores.shape, bool)
    )
    return jax.vmap(
        lambda g: _nms_local_max_single(
            g, radius, block_q=block_q, block_k=block_k, interpret=interpret
        )
    )(geom)


def pick_seeds_nms_fused(src, scores, radius, max_num, mask=None,
                         interpret=None):
    """Drop-in fused variant of ops.nms.pick_seeds_nms (same semantics)."""
    is_local_max = nms_local_max(src, scores, radius, mask=mask,
                                 interpret=interpret)
    key = scores * is_local_max
    if mask is not None:
        key = jnp.where(mask, key, -jnp.inf)
    _, idx = jax.lax.top_k(key, max_num)
    return idx


def pick_seeds_nms_prefiltered(src, scores, radius, max_num, mask=None,
                               prefilter=None, interpret=None):
    """Exact NMS seed picking through a top-M score prefilter (large-N path).

    Any suppressor of a top-M-scored point has a strictly higher score and is
    therefore itself inside the top-M set, so local-max flags computed within
    that subset are exact for its members. The selection is provably equal to
    the full-N result whenever the max_num-th selected key STRICTLY exceeds
    max(tau_M, 0), where tau_M is the M-th raw score: an outside point's key
    is its raw score (< tau_M) if unsuppressed and exactly 0 if suppressed,
    and the strict inequality also forbids cross-boundary ties (including the
    all-zeros tail when fewer than max_num positive local maxima exist, where
    the reference's index-order tie-break would otherwise be unreproducible).
    When the certificate fails the full O(N^2) kernel runs inside lax.cond —
    still exact, just at the unfiltered cost.

    CALLER CONSTRAINT: must not itself be wrapped in vmap/pmap. Batching is
    handled internally so the fallback cond stays SCALAR; an outer vmap
    would lower the cond to a select that executes both branches on every
    call, making the prefilter pure overhead (correct, just slow). A
    multi-device wrapper should shard the batch axis (shard_map/pjit keep
    the cond scalar per shard), not vmap it.

    At N=20480/S=2048 the full kernel costs ~1.0 ms on v5e (the K=3 distance
    matmul occupies the MXU like a K=128 one); the prefiltered path costs
    ~0.45 ms (top-8192 0.24 ms + the kernel on 16% of the tile grid).
    """
    n = src.shape[-2]
    if prefilter is None:
        prefilter = max(4 * max_num, 4096)
    # the NMS kernel tiles at 512/1024 and top_k needs at least max_num
    # candidates: round any (user-supplied) prefilter up to a 1024 multiple
    # and clamp to >= max_num
    prefilter = -(-max(prefilter, max_num) // 1024) * 1024
    if 2 * prefilter > n:
        # the prefilter only pays for itself when it prunes most of the
        # tile grid; below ~2x it just adds a top-M pass
        return pick_seeds_nms_fused(src, scores, radius, max_num, mask=mask,
                                    interpret=interpret)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = prefilter
    has_mask = mask is not None
    msk = mask if has_mask else jnp.ones(scores.shape, bool)

    def topm(sc, mk):
        sc_ranked = jnp.where(mk, sc, -jnp.inf) if has_mask else sc
        return jax.lax.top_k(sc_ranked, m)

    vals_m, idx_m = jax.vmap(topm)(scores, msk)

    def full_batch(_):
        return pick_seeds_nms_fused(src, scores, radius, max_num,
                                    mask=mask, interpret=interpret)

    def prefiltered(_):
        def one(s, sc, mk, vm, im):
            tau_m = vm[-1]
            sub = (jnp.take(s, im, axis=0), jnp.take(sc, im, axis=0),
                   jnp.take(mk, im, axis=0))
            geom = pack_nms_geometry(sub[0], sub[1],
                                     sub[2] if has_mask else None)
            flags = _nms_local_max_single(geom, radius, interpret=interpret)
            key_m = sub[1] * flags
            if has_mask:
                key_m = jnp.where(sub[2], key_m, -jnp.inf)
            kvals, kidx = jax.lax.top_k(key_m, max_num)
            certificate = kvals[-1] > jnp.maximum(tau_m, 0.0)
            return jnp.take(im, kidx), certificate

        pre_idx, certs = jax.vmap(one)(src, scores, msk, vals_m, idx_m)

        # ONE scalar cond for the whole batch: a vmapped lax.cond lowers to
        # a select that executes BOTH branches, which would run the full
        # O(N^2) kernel on every call and make the prefilter a pure
        # overhead. With the scalar predicate the fallback executes only
        # when some batch element's certificate fails (then the whole batch
        # pays the full kernel).
        return jax.lax.cond(jnp.all(certs), lambda _: pre_idx,
                            full_batch, None)

    # Positivity precheck: the certificate needs max_num STRICTLY POSITIVE
    # selected keys (kvals[-1] > max(tau_M, 0) >= 0), and a key can only be
    # positive where the raw score is, so it is implied that the max_num-th
    # raw score in the top-M exceeds 0. When it does not (e.g. a model
    # whose confidence logits are all negative: every suppressed point's
    # key is +/-0.0 and outranks every raw score, a tie regime the subset
    # provably cannot certify), skip the subset NMS + selection work and go
    # straight to the exact full kernel. Pure skip -- the selected indices
    # are identical either way.
    precheck = jnp.all(vals_m[:, max_num - 1] > 0.0)
    return jax.lax.cond(precheck, prefiltered, full_batch, None)
