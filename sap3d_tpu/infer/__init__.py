from sap3d_tpu.infer.predictor import SlidingWindowPredictor  # noqa: F401
from sap3d_tpu.infer.video import frames_to_video  # noqa: F401
