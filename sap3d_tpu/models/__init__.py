from sap3d_tpu.models.p3d import P3DEncoder, P3DSaliency  # noqa: F401
from sap3d_tpu.models.registry import MODEL_REGISTRY, build_model  # noqa: F401
