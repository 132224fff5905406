from crnn_tpu.parallel.mesh import make_mesh, pad_to_multiple  # noqa: F401
from crnn_tpu.parallel.dp import make_dp_train_step, make_dp_eval  # noqa: F401
