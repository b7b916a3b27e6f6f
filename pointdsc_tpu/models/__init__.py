"""Flax model modules."""

from pointdsc_tpu.models.blocks import (
    MaskedBatchNorm,
    ContextNorm,
    PointCNLayer,
    NonLocalBlock,
    NonLocalNet,
)
from pointdsc_tpu.models.pointdsc import PointDSC, PointDSCOutput
from pointdsc_tpu.models.oanet import OANet
