"""Case configurations: thin, declarative assemblies of the library.

The reference ships one standalone script per case (SURVEY.md §1); here
each case module builds a `CaseSetup` from the shared library and the
common runner in `base.py` drives training/checkpointing/plots.

Run any case as:  python -m crnn_tpu.cases.case1 --epochs 500
"""
