from sap3d_tpu.ops.pallas.flash_attention import flash_attend_tokens  # noqa: F401
