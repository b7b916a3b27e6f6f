from pointdsc_tpu.baselines.classical import (
    spectral_matching,
    ransac_registration,
    least_squares_fit,
    pmc_registration,
)
