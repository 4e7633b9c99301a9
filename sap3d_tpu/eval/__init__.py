from sap3d_tpu.eval import metrics, metrics_jax  # noqa: F401
