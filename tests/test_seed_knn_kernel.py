"""Fused exact seed-kNN kernel (kernels/seed_knn.py) equivalence.

The kernel's per-chunk winners + union second stage must return exactly the
same neighbor index set as the dense reference (full [S, N] distances +
top-k) — including self-exclusion, masking, and the padded-seed-rows path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointdsc_tpu.kernels.seed_knn import seed_knn_exact


def _dense_ref(features, seeds, k, mask=None):
    f = np.asarray(features)
    b, n, _ = f.shape
    out = []
    for bi in range(b):
        sf = f[bi][np.asarray(seeds)[bi]]
        d = 2.0 - 2.0 * sf @ f[bi].T
        d[np.arange(len(sf)), np.asarray(seeds)[bi]] = 1e9
        if mask is not None:
            d[:, ~np.asarray(mask)[bi]] = 1e9
        out.append(np.argsort(d, axis=-1, kind="stable")[:, :k])
    return np.stack(out)


@pytest.mark.parametrize("masked", [False, True])
# 192 stays below the 256 row tile (single-tile path); 300 pads to 512, the
# only value here that actually exercises the padded-seed-rows truncation
@pytest.mark.parametrize("s", [256, 192, 300])
def test_matches_dense_reference(rng, masked, s):
    n, c, k = 2048, 64, 8
    f = rng.normal(size=(2, n, c)).astype(np.float32)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    seeds = np.stack(
        [rng.choice(n, s, replace=False) for _ in range(2)]
    ).astype(np.int32)
    mask = None
    if masked:
        m = np.ones((2, n), bool)
        m[:, n - 300:] = False
        mask = jnp.asarray(m)

    got = np.asarray(
        seed_knn_exact(jnp.asarray(f), jnp.asarray(seeds), k, mask=mask)
    )
    ref = _dense_ref(f, seeds, k, mask=None if mask is None else mask)

    # continuous random features -> no exact ties: index sets must agree
    # row for row (order may differ only under ties, which cannot occur)
    assert got.shape == ref.shape
    same = (np.sort(got, axis=-1) == np.sort(ref, axis=-1)).all(axis=-1)
    assert same.mean() == 1.0, f"{(~same).sum()} rows diverge"


def test_model_wiring(rng, monkeypatch):
    """The exact fused model path must route through the kernel at large N
    (forced small here) and produce the same output as the XLA exact path."""
    import pointdsc_tpu.models.pointdsc as mp
    from pointdsc_tpu.models.pointdsc import PointDSC

    n = 1024
    corr = rng.normal(size=(1, n, 6)).astype(np.float32)
    src = rng.uniform(-1, 1, (1, n, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (1, n, 3)).astype(np.float32)
    model = PointDSC(in_dim=6, num_layers=2, num_channels=32, k=8,
                     ratio=0.1, refine_iters=2)
    variables = model.init(
        jax.random.key(0), jnp.asarray(corr), jnp.asarray(src),
        jnp.asarray(tgt),
    )
    args = (jnp.asarray(corr), jnp.asarray(src), jnp.asarray(tgt))
    base = model.apply(variables, *args, testing=True, fused_attention=True)
    monkeypatch.setattr(mp, "_SEED_KNN_FUSED_MIN_N", 0)
    kern = model.apply(variables, *args, testing=True, fused_attention=True)
    np.testing.assert_allclose(
        np.asarray(kern.final_trans), np.asarray(base.final_trans), atol=1e-5
    )
    agree = (
        np.asarray(kern.final_labels) == np.asarray(base.final_labels)
    ).mean()
    assert agree == 1.0


def test_heavy_padding_fewer_valid_than_k(rng):
    """When a sample has fewer valid correspondences than k, the kernel
    must still return real (unique) column indices containing every valid
    non-self neighbor — regression for padding lanes (value ties at -1e30)
    promoting a fabricated index 0 into the result."""
    n, c, k, n_valid, s = 2048, 32, 40, 30, 256
    f = rng.normal(size=(1, n, c)).astype(np.float32)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    m = np.zeros((1, n), bool)
    m[:, :n_valid] = True
    seeds = rng.choice(n_valid, s, replace=True).astype(np.int32)[None]

    got = np.asarray(
        seed_knn_exact(jnp.asarray(f), jnp.asarray(seeds), k,
                       mask=jnp.asarray(m))
    )[0]
    for row, seed in zip(got, seeds[0]):
        assert len(set(row.tolist())) == k, "duplicate neighbor indices"
        valid_others = set(range(n_valid)) - {int(seed)}
        assert valid_others.issubset(set(row.tolist())), (
            "a valid neighbor was displaced by a padding candidate"
        )
