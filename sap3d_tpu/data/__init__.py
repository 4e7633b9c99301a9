from sap3d_tpu.data.indexer import ClipIndex, ClipPaths  # noqa: F401
from sap3d_tpu.data.pipeline import ClipLoader, decode_clip, preprocess_frame  # noqa: F401
