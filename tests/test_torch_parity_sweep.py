"""Config-sweep cross-implementation parity vs the reference torch models.

Round-2 verdict item 3: the original parity harness (test_torch_parity.py)
pins one configuration (3DMatch, in_dim=6, k=40, 12 layers). This sweep
parametrizes over every config axis that selects a different code path:

- KITTI config (inlier_threshold=0.6 -> the thr=1.2 post-refinement branch
  at models/pointdsc.py mirroring reference PointDSC.py:414; sigma_d=1.2;
  KITTI-scale ~60 m coordinates), multiple seeds
- in_dim in {3, 9, 12, 70} (reference ThreeDMatch.py:144-168 encodings)
- k in {20, 40}, num_layers in {6, 12}
- OANet shared-prefix parity (reference OANet.py:89-156 returns features
  early; we transfer its weights incl. the dead `output` head and compare
  logits, which are a linear map of the shared-prefix features)

Any branch divergence from the reference fails a named case. Slow suite
(--runslow): each case builds + runs a fresh torch model in float64.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

enable_x64 = lambda: jax.enable_x64(True)

from pointdsc_tpu.compat.torch_weights import (
    from_torch_oanet_state_dict,
    from_torch_state_dict,
)
from pointdsc_tpu.models import PointDSC
from pointdsc_tpu.models.oanet import OANet

REF = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

from models.OANet import OANet as TorchOANet  # noqa: E402
from models.PointDSC import PointDSC as TorchPointDSC  # noqa: E402

pytestmark = pytest.mark.slow

BASE_CFG = dict(
    in_dim=6, num_layers=12, num_channels=128, num_iterations=10,
    ratio=0.1, inlier_threshold=0.10, sigma_d=0.10, k=40, nms_radius=0.10,
)

# (name, config overrides, data regime, rng seed)
CASES = [
    # KITTI: inlier_threshold != 0.10 selects the 1.2 m refinement
    # threshold (reference PointDSC.py:414); sigma_d drives the spatial
    # compat scale; coordinates at LiDAR scale stress f32->f64 paths
    ("kitti_seed0", dict(inlier_threshold=0.6, sigma_d=1.2, nms_radius=0.6),
     "kitti", 0),
    ("kitti_seed1", dict(inlier_threshold=0.6, sigma_d=1.2, nms_radius=0.6),
     "kitti", 1),
    ("in_dim_3", dict(in_dim=3), "indoor", 2),
    ("in_dim_9", dict(in_dim=9), "indoor", 3),
    ("in_dim_12", dict(in_dim=12), "indoor", 4),
    ("in_dim_70", dict(in_dim=70), "indoor", 5),
    ("k_20", dict(k=20), "indoor", 6),
    ("layers_6", dict(num_layers=6), "indoor", 7),
    ("default_seed8", dict(), "indoor", 8),
]


def make_pair_sweep(rng, in_dim, regime, bs, n):
    """Synthetic correspondences with the reference's in_dim encodings."""
    from pointdsc_tpu.data import transforms_np as T
    from pointdsc_tpu.data.pipeline import make_corr_pos

    if regime == "kitti":
        span, tmax, noise, inl_ratio = 30.0, 10.0, 0.05, 0.4
    else:
        span, tmax, noise, inl_ratio = 1.5, 0.5, 0.005, 0.4

    corr_pos = np.zeros((bs, n, in_dim), np.float32)
    src = rng.uniform(-span, span, (bs, n, 3)).astype(np.float32)
    tgt = np.zeros_like(src)
    for b in range(bs):
        trans = T.integrate_trans(
            T.rotation_matrix(3, 1.0, rng), T.translation_matrix(tmax, rng)
        )
        warped = T.transform(src[b], trans)
        inl = rng.random(n) < inl_ratio
        tgt[b] = np.where(
            inl[:, None],
            warped + rng.normal(size=(n, 3)) * noise,
            rng.uniform(-span, span, (n, 3)),
        ).astype(np.float32)
        if in_dim == 12:
            # [src, src_normal, tgt, tgt_normal]; random unit "normals" are
            # fine for MODEL parity (both models see identical inputs)
            ns = rng.normal(size=(n, 3)).astype(np.float32)
            nt = rng.normal(size=(n, 3)).astype(np.float32)
            ns /= np.linalg.norm(ns, axis=-1, keepdims=True)
            nt /= np.linalg.norm(nt, axis=-1, keepdims=True)
            corr_pos[b] = np.concatenate([src[b], ns, tgt[b], nt], axis=-1)
        else:
            desc_s = rng.normal(size=(n, 32)).astype(np.float32)
            desc_t = rng.normal(size=(n, 32)).astype(np.float32)
            corr_pos[b] = make_corr_pos(src[b], tgt[b], in_dim, desc_s, desc_t)
    return corr_pos, src, tgt


@pytest.fixture(scope="module", autouse=True)
def torch_f64():
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(prev)


def build_models(cfg):
    torch.manual_seed(11)
    tm = TorchPointDSC(**cfg).double()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
        tm.sigma.fill_(1.1)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    with enable_x64():
        variables = from_torch_state_dict(sd, cfg["num_layers"], dtype=np.float64)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
    # feed torch's f32-rounded sigma_spat constant (PointDSC.py:98)
    jm = PointDSC(**{**cfg, "sigma_d": float(np.float32(cfg["sigma_d"]))})
    return tm, jm, variables


@pytest.mark.parametrize("name,overrides,regime,seed",
                         CASES, ids=[c[0] for c in CASES])
def test_config_sweep_parity(name, overrides, regime, seed):
    cfg = {**BASE_CFG, **overrides}
    tm, jm, variables = build_models(cfg)
    rng = np.random.default_rng(seed)

    # ---- train branch (bs=2): M, confidence, final_trans
    corr_pos, src, tgt = make_pair_sweep(rng, cfg["in_dim"], regime, bs=2, n=192)
    tm.train()
    with torch.no_grad():
        tout = tm({
            "corr_pos": torch.from_numpy(corr_pos).double(),
            "src_keypts": torch.from_numpy(src).double(),
            "tgt_keypts": torch.from_numpy(tgt).double(),
        })
    with enable_x64():
        jout, _ = jm.apply(
            variables,
            jnp.asarray(corr_pos, jnp.float64),
            jnp.asarray(src, jnp.float64),
            jnp.asarray(tgt, jnp.float64),
            train=True, mutable=["batch_stats"],
        )
        np.testing.assert_allclose(
            np.asarray(jout.M), tout["M"].numpy(), atol=1e-8,
            err_msg=f"[{name}] M diverged",
        )
        np.testing.assert_allclose(
            np.asarray(jout.confidence), tout["final_labels"].numpy(),
            atol=1e-8, err_msg=f"[{name}] confidence diverged",
        )
        scale = max(1.0, float(np.abs(tout["final_trans"].numpy()).max()))
        np.testing.assert_allclose(
            np.asarray(jout.final_trans), tout["final_trans"].numpy(),
            atol=1e-6 * scale, err_msg=f"[{name}] train final_trans diverged",
        )

    # ---- testing branch (bs=1): NMS, NSM, hypothesis selection, refinement
    corr_pos, src, tgt = make_pair_sweep(rng, cfg["in_dim"], regime, bs=1, n=192)
    tm.eval()
    with torch.no_grad():
        tout = tm({
            "corr_pos": torch.from_numpy(corr_pos).double(),
            "src_keypts": torch.from_numpy(src).double(),
            "tgt_keypts": torch.from_numpy(tgt).double(),
            "testing": True,
        })
    with enable_x64():
        jout = jm.apply(
            variables,
            jnp.asarray(corr_pos, jnp.float64),
            jnp.asarray(src, jnp.float64),
            jnp.asarray(tgt, jnp.float64),
            testing=True,
        )
    scale = max(1.0, float(np.abs(tout["final_trans"].numpy()).max()))
    np.testing.assert_allclose(
        np.asarray(jout.final_trans), tout["final_trans"].numpy(),
        atol=1e-6 * scale, err_msg=f"[{name}] test final_trans diverged",
    )
    np.testing.assert_array_equal(
        np.asarray(jout.final_labels), tout["final_labels"].numpy(),
        err_msg=f"[{name}] inlier labels diverged",
    )


class TestOANetParity:
    """Shared-prefix parity for the OANet ablation architecture.

    The reference forward returns the l1_2 features early (OANet.py:156);
    its `output` head weights exist in the state dict but are dead code.
    We transfer all weights and compare logits = output(features): a match
    verifies the whole shared prefix (l1_1, diff_pool, OAFilters,
    diff_unpool, l1_2) plus the head mapping.
    """

    CFG = dict(in_dim=6, num_layers=6, num_channels=64)

    def _models(self):
        torch.manual_seed(5)
        tm = TorchOANet(**self.CFG).double()
        with torch.no_grad():
            for m in tm.modules():
                if isinstance(m, torch.nn.BatchNorm1d):
                    m.weight.uniform_(0.5, 1.5)
                    m.bias.uniform_(-0.3, 0.3)
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.5, 1.5)
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        with enable_x64():
            variables = from_torch_oanet_state_dict(
                sd, self.CFG["num_layers"], dtype=np.float64
            )
            variables = jax.tree_util.tree_map(jnp.asarray, variables)
        jm = OANet(**self.CFG)
        return tm, jm, variables

    def test_logits_parity_eval(self, rng):
        tm, jm, variables = self._models()
        corr_pos, src, tgt = make_pair_sweep(rng, 6, "indoor", bs=2, n=160)

        tm.eval()
        with torch.no_grad():
            feats = tm({"corr_pos": torch.from_numpy(corr_pos).double()})
            # the reference returns [bs, C, N] features early; apply its own
            # (dead) head to get logits comparable with ours
            ref_logits = tm.output(feats).squeeze(1).numpy()

        with enable_x64():
            jout = jm.apply(
                variables,
                jnp.asarray(corr_pos, jnp.float64),
                jnp.asarray(src, jnp.float64),
                jnp.asarray(tgt, jnp.float64),
            )
        np.testing.assert_allclose(
            np.asarray(jout["final_labels"]), ref_logits, atol=1e-8,
            err_msg="OANet shared-prefix logits diverged",
        )

    def test_final_trans_matches_reference_dead_head_semantics(self, rng):
        """Our completed head follows the reference's (dead) Procrustes
        recipe: weights = relu(tanh(logits)). Verify the transform equals an
        independent weighted fit on the reference logits."""
        from pointdsc_tpu.ops.procrustes import weighted_procrustes

        tm, jm, variables = self._models()
        corr_pos, src, tgt = make_pair_sweep(rng, 6, "indoor", bs=1, n=160)

        tm.eval()
        with torch.no_grad():
            feats = tm({"corr_pos": torch.from_numpy(corr_pos).double()})
            ref_logits = tm.output(feats).squeeze(1).numpy()

        with enable_x64():
            jout = jm.apply(
                variables,
                jnp.asarray(corr_pos, jnp.float64),
                jnp.asarray(src, jnp.float64),
                jnp.asarray(tgt, jnp.float64),
            )
            w = jnp.maximum(jnp.tanh(jnp.asarray(ref_logits)), 0.0)
            want = weighted_procrustes(
                jnp.asarray(src, jnp.float64), jnp.asarray(tgt, jnp.float64), w
            )
        np.testing.assert_allclose(
            np.asarray(jout["final_trans"]), np.asarray(want), atol=1e-9
        )
