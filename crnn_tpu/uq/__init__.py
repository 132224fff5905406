from crnn_tpu.uq.svgd import SVGDConfig, rbf_kernel, svgd_step, make_svgd_step  # noqa: F401
