from pointdsc_tpu.kernels.sc_attention import (
    fused_sc_attention,
    pack_geometry,
    make_sc_attention_fn,
)
