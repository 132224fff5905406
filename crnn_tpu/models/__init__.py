from crnn_tpu.models.crnn import (  # noqa: F401
    R_KCAL,
    make_crnn_rhs,
    make_crnn_arrhenius_rhs,
    make_crnn_scaled_rhs,
    make_crnn_reversible_rhs,
    make_crnn_yeast_rhs,
    make_crnn_qssa_rhs,
    make_cathode_rhs,
    cathode_hrr,
)
from crnn_tpu.models.mlp import mlp_init, mlp_apply  # noqa: F401
