from crnn_tpu.ops.crnn_kernels import (  # noqa: F401
    crnn_rhs_batched,
    crnn_rhs_batched_reference,
    crnn_rhs_jac_batched,
    crnn_rhs_jac_batched_reference,
)
