from crnn_tpu.data.truth import TRUTH_REGISTRY  # noqa: F401
from crnn_tpu.data.generate import (  # noqa: F401
    Dataset,
    generate_dataset,
    max_min_scale,
    latin_hypercube,
)
