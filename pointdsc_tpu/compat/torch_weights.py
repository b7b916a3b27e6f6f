"""Import reference PyTorch PointDSC checkpoints into flax params.

The reference ships weights as ``torch.save(model.state_dict())`` pickles
(``snapshot/<id>/models/model_best.pkl``, /root/reference/libs/trainer.py:224-226).
This module maps that state dict onto the pointdsc_tpu flax tree so a user of
the reference can carry trained weights over unchanged:

  torch Conv1d(k=1) weight [out, in, 1]  ->  flax Dense kernel [in, out]
  torch BatchNorm1d weight/bias          ->  MaskedBatchNorm scale/bias
  torch BatchNorm1d running_mean/var     ->  batch_stats mean/var

Key layout on the torch side (see /root/reference/models/PointDSC.py:80-127):
  sigma, sigma_spat
  encoder.layer0.{weight,bias}
  encoder.blocks.PointCN_layer_{i}.0.*        (Conv1d)
  encoder.blocks.PointCN_layer_{i}.1.*        (BatchNorm1d)
  encoder.blocks.NonLocal_layer_{i}.projection_{q,k,v}.*
  encoder.blocks.NonLocal_layer_{i}.fc_message.{0,3,6}.*  (Conv1d)
  encoder.blocks.NonLocal_layer_{i}.fc_message.{1,4}.*    (BatchNorm1d)
  classification.{0,2,4}.*                    (Conv1d)
"""

from __future__ import annotations

import numpy as np


def _conv1d(w):  # [out, in, 1] -> [in, out]
    return np.ascontiguousarray(np.asarray(w)[:, :, 0].T)


def _vec(w):
    return np.asarray(w).reshape(-1)


def from_torch_state_dict(sd: dict, num_layers: int, dtype=np.float32) -> dict:
    """Build {'params': ..., 'batch_stats': ...} flax variables from a
    reference state dict (values: numpy arrays or anything np.asarray eats).

    Raises KeyError on a missing expected key, so silent shape drift is
    impossible. `dtype` is float32 for deployment; the float64 option exists
    for the cross-implementation parity tests.
    """
    sd = {k: np.asarray(v, dtype) for k, v in sd.items()}

    def dense(prefix):
        return {"kernel": _conv1d(sd[f"{prefix}.weight"]),
                "bias": _vec(sd[f"{prefix}.bias"])}

    def bn_params(prefix):
        return {"scale": _vec(sd[f"{prefix}.weight"]),
                "bias": _vec(sd[f"{prefix}.bias"])}

    def bn_stats(prefix):
        return {"mean": _vec(sd[f"{prefix}.running_mean"]),
                "var": _vec(sd[f"{prefix}.running_var"])}

    enc_p: dict = {"layer0": dense("encoder.layer0")}
    enc_s: dict = {}
    for i in range(num_layers):
        pcn = f"encoder.blocks.PointCN_layer_{i}"
        nl = f"encoder.blocks.NonLocal_layer_{i}"
        enc_p[f"PointCN_layer_{i}"] = {
            "Dense_0": dense(f"{pcn}.0"),
            "MaskedBatchNorm_0": bn_params(f"{pcn}.1"),
        }
        enc_s[f"PointCN_layer_{i}"] = {"MaskedBatchNorm_0": bn_stats(f"{pcn}.1")}
        enc_p[f"NonLocal_layer_{i}"] = {
            "projection_q": dense(f"{nl}.projection_q"),
            "projection_k": dense(f"{nl}.projection_k"),
            "projection_v": dense(f"{nl}.projection_v"),
            "fc_message_0": dense(f"{nl}.fc_message.0"),
            "fc_message_bn0": bn_params(f"{nl}.fc_message.1"),
            "fc_message_1": dense(f"{nl}.fc_message.3"),
            "fc_message_bn1": bn_params(f"{nl}.fc_message.4"),
            "fc_message_2": dense(f"{nl}.fc_message.6"),
        }
        enc_s[f"NonLocal_layer_{i}"] = {
            "fc_message_bn0": bn_stats(f"{nl}.fc_message.1"),
            "fc_message_bn1": bn_stats(f"{nl}.fc_message.4"),
        }

    params = {
        "sigma": _vec(sd["sigma"]),
        "encoder": enc_p,
        "classification_0": dense("classification.0"),
        "classification_1": dense("classification.2"),
        "classification_2": dense("classification.4"),
    }
    return {"params": params, "batch_stats": {"encoder": enc_s}}


def from_torch_oanet_state_dict(sd: dict, num_layers: int, dtype=np.float32) -> dict:
    """Map a reference OANet state dict (/root/reference/models/OANet.py:89-145)
    onto the pointdsc_tpu OANet flax tree.

    Torch Sequential index layout ('post' act order):
      l1_1: [Conv1d(in,C)] + per layer [Conv1d, ContextNorm, BatchNorm1d, ReLU]
            -> convs at 0, 1+4j; BNs at 3+4j     (num_layers//2 layers)
      l1_2: same with Conv1d(2C,C) input and num_layers//2 - 1 layers
      down1/up1: conv = Sequential(InstanceNorm, BN, ReLU, Conv1d)
            -> BN at .conv.1, Conv at .conv.3
      l2.{i} (OAFilter): conv1 = [IN, BN, ReLU, Conv, Transpose] -> BN 1, Conv 3
                         conv2 = [BN, ReLU, Conv]                -> BN 0, Conv 2
                         conv3 = [Transpose, IN, BN, ReLU, Conv] -> BN 2, Conv 4
      output: Conv1d(C, 1)
    """
    sd = {k: np.asarray(v, dtype) for k, v in sd.items()}

    def dense(prefix):
        return {"kernel": _conv1d(sd[f"{prefix}.weight"]),
                "bias": _vec(sd[f"{prefix}.bias"])}

    def bn_params(prefix):
        return {"scale": _vec(sd[f"{prefix}.weight"]),
                "bias": _vec(sd[f"{prefix}.bias"])}

    def bn_stats(prefix):
        return {"mean": _vec(sd[f"{prefix}.running_mean"]),
                "var": _vec(sd[f"{prefix}.running_var"])}

    def stack(prefix, n_inner):
        p = {"Dense_0": dense(f"{prefix}.0")}
        s = {}
        for j in range(n_inner):
            p[f"Dense_{j + 1}"] = dense(f"{prefix}.{1 + 4 * j}")
            p[f"MaskedBatchNorm_{j}"] = bn_params(f"{prefix}.{3 + 4 * j}")
            s[f"MaskedBatchNorm_{j}"] = bn_stats(f"{prefix}.{3 + 4 * j}")
        return p, s

    half = num_layers // 2
    params: dict = {}
    stats: dict = {}
    params["l1_1"], stats["l1_1"] = stack("l1_1", half)
    params["l1_2"], stats["l1_2"] = stack("l1_2", half - 1)
    for name in ("down1", "up1"):
        params[name] = {
            "Dense_0": dense(f"{name}.conv.3"),
            "MaskedBatchNorm_0": bn_params(f"{name}.conv.1"),
        }
        stats[name] = {"MaskedBatchNorm_0": bn_stats(f"{name}.conv.1")}
    for i in range(half):
        params[f"oa_{i}"] = {
            "Dense_0": dense(f"l2.{i}.conv1.3"),
            "MaskedBatchNorm_0": bn_params(f"l2.{i}.conv1.1"),
            "Dense_1": dense(f"l2.{i}.conv2.2"),
            "MaskedBatchNorm_1": bn_params(f"l2.{i}.conv2.0"),
            "Dense_2": dense(f"l2.{i}.conv3.4"),
            "MaskedBatchNorm_2": bn_params(f"l2.{i}.conv3.2"),
        }
        stats[f"oa_{i}"] = {
            "MaskedBatchNorm_0": bn_stats(f"l2.{i}.conv1.1"),
            "MaskedBatchNorm_1": bn_stats(f"l2.{i}.conv2.0"),
            "MaskedBatchNorm_2": bn_stats(f"l2.{i}.conv3.2"),
        }
    params["output"] = dense("output")
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str, num_layers: int) -> dict:
    """Load a reference ``model_best.pkl`` (torch pickle) from disk.

    Needs torch importable (CPU build suffices) to unpickle the tensor
    storage format; the result is plain numpy, usable without torch.
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in raw.items()}
    return from_torch_state_dict(sd, num_layers)
