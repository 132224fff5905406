from crnn_tpu.infra.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from crnn_tpu.infra.metrics import MetricsLogger  # noqa: F401
