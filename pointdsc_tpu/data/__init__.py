from pointdsc_tpu.data.pipeline import (
    build_correspondences,
    pad_to_bucket,
    collate_batch,
    Loader,
    bucket_size,
)
from pointdsc_tpu.data.synthetic import SyntheticPairDataset
