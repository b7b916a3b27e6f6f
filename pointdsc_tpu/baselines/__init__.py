from pointdsc_tpu.baselines.classical import (
    spectral_matching,
    ransac_registration,
    gc_ransac_registration,
    gc_ransac_registration_pygc,
    least_squares_fit,
    pmc_registration,
)
