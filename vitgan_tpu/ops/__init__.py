from vitgan_tpu.ops.attention import (  # noqa: F401
    attention_chunked,
    attention_reference,
    dispatch_attention,
    flash_attention,
    use_pallas_attention,
)
from vitgan_tpu.ops.augment import apply_augment  # noqa: F401
from vitgan_tpu.ops.fused_mlp import dispatch_ln_mlp, fused_ln_mlp  # noqa: F401
from vitgan_tpu.ops.policy import get_policy, set_policy  # noqa: F401
