"""Determinism helper (reference evaluation/benchmark_utils.py:27-37).

JAX programs are deterministic by construction given a PRNG key; the only
global state to pin is numpy/python randomness used by the host-side data
pipeline.
"""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int = 51) -> None:
    random.seed(seed)
    np.random.seed(seed)
