"""Dataset statistics tool: inlier-ratio histograms per split
(parity with /root/reference/datasets/stats.py:8-48)."""

from __future__ import annotations

import numpy as np


def process_split(dataset, num_samples: int | None = None, bins: int = 20):
    """Iterate a dataset and histogram the per-pair inlier ratios.

    Returns dict with 'ratios' [n], 'hist' [bins], 'edges' [bins+1],
    'mean', 'median'.
    """
    n = len(dataset) if num_samples is None else min(num_samples, len(dataset))
    ratios = np.zeros(n)
    for i in range(n):
        sample = dataset[i]
        labels = sample["gt_labels"]
        ratios[i] = float(labels.mean()) if len(labels) else 0.0
    hist, edges = np.histogram(ratios, bins=bins, range=(0.0, 1.0))
    return {
        "ratios": ratios,
        "hist": hist,
        "edges": edges,
        "mean": float(ratios.mean()),
        "median": float(np.median(ratios)),
    }


def print_split_report(name: str, stats: dict) -> None:
    print(f"Split {name}: {len(stats['ratios'])} pairs, "
          f"mean inlier ratio {stats['mean']:.3f}, median {stats['median']:.3f}")
    for lo, hi, c in zip(stats["edges"][:-1], stats["edges"][1:], stats["hist"]):
        bar = "#" * int(50 * c / max(stats["hist"].max(), 1))
        print(f"  [{lo:.2f},{hi:.2f}) {c:5d} {bar}")
