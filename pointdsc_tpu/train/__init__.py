"""Training: losses, metrics, config/snapshot system, trainer."""

from pointdsc_tpu.train.losses import (
    classification_loss,
    spectral_matching_loss,
    transformation_loss,
    classification_metrics,
)
from pointdsc_tpu.train.config import Config, get_config
