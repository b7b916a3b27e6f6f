from pointdsc_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from pointdsc_tpu.parallel.seq_parallel import sp_encode, sp_testing_forward
