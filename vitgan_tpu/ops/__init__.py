from vitgan_tpu.ops.attention import flash_attention, use_pallas_attention  # noqa: F401
