"""Unified console entry point: ``crnn-tpu <case> [case args...]``.

The reference is driven by ``julia <case>/<script>.jl`` (README.md:40-61);
here every case is a module with an argparse ``__main__`` block, and this
dispatcher forwards to it so one installed command covers the whole case
matrix:

    crnn-tpu case2 --epochs 10000 --mode batch
    crnn-tpu robertson --epochs 20000
    crnn-tpu cathode_uq --iters 25000
    crnn-tpu list
"""

from __future__ import annotations

import runpy
import sys

CASES = (
    "case1",
    "case1_rev",
    "case2",
    "case3",
    "grn",
    "robertson",
    "robertson_qssa",
    "yeast",
    "hychem",
    "cathode",
    "cathode_uq",
)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "list"):
        print(__doc__)
        print("cases: " + " ".join(CASES))
        return 0
    case, rest = argv[0], argv[1:]
    if case not in CASES:
        print(f"unknown case {case!r}; available: {' '.join(CASES)}",
              file=sys.stderr)
        return 2
    sys.argv = [f"crnn-tpu {case}"] + rest
    runpy.run_module(f"crnn_tpu.cases.{case}", run_name="__main__")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
