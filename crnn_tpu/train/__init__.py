from crnn_tpu.train.loss import make_trajectory_loss  # noqa: F401
from crnn_tpu.train.optimizers import (  # noqa: F401
    adamw_like,
    nadam_like,
    expdecay_adamw,
)
from crnn_tpu.train.loop import TrainState, Trainer, EpochMetrics  # noqa: F401
from crnn_tpu.train.lm import levenberg_marquardt  # noqa: F401
