from pointdsc_tpu.compat.torch_weights import (
    from_torch_state_dict,
    load_torch_checkpoint,
)
