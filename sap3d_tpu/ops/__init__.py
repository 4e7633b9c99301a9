from sap3d_tpu.ops.layers import (  # noqa: F401
    ConvNormRelu,
    Norm,
    TransposeConvNormRelu,
    max_pool3d,
    pool3d,
    smooth_l1_loss,
    unpool_zero_interleave,
)
from sap3d_tpu.ops.attention import NonLocal3D, SelfAttention3D  # noqa: F401
from sap3d_tpu.ops.cbam import CBAM, SEBlock3D  # noqa: F401
