"""Structured metric logging: JSONL + stdout.

Replaces the reference's ProgressBar set_description live line and ad-hoc
@printf blocks (case2/case2.jl:204-205) with an appendable JSONL stream
(one record per epoch) that bench/analysis tooling can consume.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, print_every: int = 0):
        self.path = path
        self.print_every = print_every
        self._n = 0
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")
        else:
            self._fh = None

    def log(self, **kwargs) -> None:
        rec = {"ts": time.time(), **kwargs}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        self._n += 1
        if self.print_every and self._n % self.print_every == 0:
            pretty = " ".join(
                f"{k}={v:.4e}" if isinstance(v, float) else f"{k}={v}"
                for k, v in kwargs.items()
            )
            print(pretty, flush=True)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
