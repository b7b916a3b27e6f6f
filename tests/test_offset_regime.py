"""Offset-softmax validity-regime guard (models/regime.py + eval/runner.py).

The eval fast path's offset-softmax kernels are exact while the per-row
bound slack stays under the -80-nat floor; a checkpoint imported from
outside this repo (reference torch training never constrained activation
norms) can exceed it, and before round 4 such rows degraded SILENTLY
toward near-uniform attention. These tests pin the guard: the slack
measurement separates in-regime from out-of-regime weights, the Evaluator
flips to the running-max flash kernels for the latter, and the fallback
output matches the dense reference forward — so no silent degradation is
reachable from user weights (exactness contract of the reference softmax,
/root/reference/models/PointDSC.py:41-44).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointdsc_tpu.data.synthetic import SyntheticPairDataset
from pointdsc_tpu.models.pointdsc import PointDSC
from pointdsc_tpu.models.regime import (
    OFFSET_REGIME_MAX_SLACK,
    offset_regime_slack,
)


def _setup(n=256, num_layers=3, seed=0):
    model = PointDSC(
        in_dim=6, num_layers=num_layers, num_channels=128, k=20, ratio=0.1
    )
    s = SyntheticPairDataset(num_pairs=1, num_corr=n, seed=seed)[0]
    args = tuple(
        jnp.asarray(s[k])[None]
        for k in ("corr_pos", "src_keypts", "tgt_keypts")
    )
    variables = model.init(jax.random.key(0), *args)
    return model, variables, args, s


def _inflate_keys(variables, factor=100.0):
    """Scale every projection_k Dense by `factor`: key norms (and the
    offset bound) inflate by x`factor` while typical logits inflate
    alongside, so the bound SLACK inflates x`factor` too — the imported-
    weights failure mode the guard exists for."""
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # copy
    enc = variables["params"]["encoder"]
    new_enc = dict(enc)
    for name in list(enc.keys()):
        if name.startswith("NonLocal_layer_"):
            layer = dict(enc[name])
            pk = dict(layer["projection_k"])
            pk["kernel"] = pk["kernel"] * factor
            pk["bias"] = pk["bias"] * factor
            layer["projection_k"] = pk
            new_enc[name] = layer
    params = dict(variables["params"])
    params["encoder"] = new_enc
    return {**variables, "params": params}


class TestSlackMeasurement:
    def test_in_regime_for_bn_initialized_weights(self):
        model, variables, args, _ = _setup()
        slack = offset_regime_slack(model, variables, *args)
        assert np.isfinite(slack)
        assert slack < OFFSET_REGIME_MAX_SLACK, slack

    def test_out_of_regime_for_inflated_key_norms(self):
        model, variables, args, _ = _setup()
        bad = _inflate_keys(variables, 100.0)
        slack_good = offset_regime_slack(model, variables, *args)
        slack_bad = offset_regime_slack(model, bad, *args)
        assert slack_bad >= OFFSET_REGIME_MAX_SLACK, slack_bad
        assert slack_bad > slack_good * 10

    def test_masked_rows_ignored(self):
        model, variables, args, s = _setup()
        mask = jnp.ones(args[0].shape[:2], bool)
        slack_full = offset_regime_slack(model, variables, *args, mask=mask)
        mask_half = mask.at[:, ::2].set(False)
        slack_half = offset_regime_slack(
            model, variables, *args, mask=mask_half
        )
        assert np.isfinite(slack_half)
        # masking can only change the measured slack moderately, never blow
        # it up (padded keys are excluded from the row max but a looser
        # kmax over fewer keys can move it either way)
        assert abs(slack_half - slack_full) < 40.0


class TestEvaluatorGuard:
    def _dense_forward(self, model, variables, args, mask):
        out = model.apply(
            variables, *args, mask=mask, testing=True, fused_attention=False
        )
        return np.asarray(out.final_trans)[0]

    def test_in_regime_keeps_offset_kernels(self):
        from pointdsc_tpu.eval.runner import Evaluator

        model, variables, args, s = _setup()
        ev = Evaluator(model, variables, fused_attention=True)
        sample = dict(s)
        sample["gt_labels"] = np.asarray(s["gt_labels"])
        ev.run_pair(sample)
        assert ev.model.offset_softmax is True

    def test_out_of_regime_falls_back_and_matches_dense(self):
        from pointdsc_tpu.eval.runner import Evaluator

        model, variables, args, s = _setup()
        bad = _inflate_keys(variables, 100.0)
        ev = Evaluator(model, bad, fused_attention=True)
        sample = dict(s)
        _, trans = ev.run_pair(sample)
        # the guard must have flipped the kernel selection
        assert ev.model.offset_softmax is False
        mask = jnp.ones(args[0].shape[:2], bool)
        ref = self._dense_forward(model, bad, args, mask)
        np.testing.assert_allclose(trans, ref, rtol=0, atol=5e-3)

    def test_offset_model_flag_false_matches_dense_directly(self):
        # the static flag alone (no guard) selects the running-max kernels
        model, variables, args, s = _setup()
        bad = _inflate_keys(variables, 100.0)
        mask = jnp.ones(args[0].shape[:2], bool)
        m_flash = model.clone(offset_softmax=False)
        out_flash = m_flash.apply(
            bad, *args, mask=mask, testing=True, fused_attention=True
        )
        ref = self._dense_forward(model, bad, args, mask)
        np.testing.assert_allclose(
            np.asarray(out_flash.final_trans)[0], ref, rtol=0, atol=5e-3
        )

    def test_second_pair_only_violation_flips(self):
        # The slack is PAIR-dependent, not only weight-dependent: a probe
        # of the first pair alone plus the 20-nat margin can miss a
        # heterogeneous scene (VERDICT r4 item 7). The guard therefore
        # probes the first few pairs; a violation appearing only on the
        # SECOND pair (same shape bucket, so no bucket-warmup probe) must
        # still flip the kernel selection.
        from pointdsc_tpu.eval.runner import Evaluator

        model, variables, args, s = _setup()
        ev = Evaluator(model, variables, fused_attention=True)
        ev.run_pair(dict(s))
        assert ev.model.offset_softmax is True  # pair 1 in regime

        # pair 2: same bucket, coordinates scaled x50 — activations (and
        # with them the offset bound slack) blow up through the eval-mode
        # BN, which normalizes with the frozen init statistics
        bad = {
            key: (np.asarray(s[key]) * 50.0 if key in
                  ("corr_pos", "src_keypts", "tgt_keypts") else s[key])
            for key in s
        }
        ev.run_pair(dict(bad))
        assert ev.model.offset_softmax is False

    def test_offset_true_would_have_degraded(self):
        # sanity that the guard is actually load-bearing: with inflated
        # keys the offset kernels' attention diverges from dense
        model, variables, args, s = _setup()
        bad = _inflate_keys(variables, 100.0)
        mask = jnp.ones(args[0].shape[:2], bool)
        out_off = model.apply(
            bad, *args, mask=mask, testing=True, fused_attention=True
        )
        ref = self._dense_forward(model, bad, args, mask)
        err = np.max(np.abs(np.asarray(out_off.final_trans)[0] - ref))
        if err < 1e-4:
            pytest.skip(
                "offset kernels happened to stay in regime at this seed"
            )
        assert err > 1e-4
