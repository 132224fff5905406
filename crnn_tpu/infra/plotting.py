"""Observability plots + weight pretty-printing.

Rebuilds the reference's callback layer: per-experiment prediction-vs-data
panels (``cbi``, case2/case2.jl:139-152), log-log loss/grad-norm curves
(``cb``, case2.jl:157-181) and the learned-weight pretty printer
(``display_p``, case2.jl:101-110).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_experiment(ts, data, pred, path: str,
                    species: Optional[Sequence[str]] = None,
                    logx: bool = False) -> None:
    """Scatter data vs predicted trajectories, one panel per species."""
    ts = np.asarray(ts)
    data = np.asarray(data)
    pred = np.asarray(pred)
    ns = data.shape[1]
    ncol = int(np.ceil(np.sqrt(ns)))
    nrow = int(np.ceil(ns / ncol))
    fig, axes = plt.subplots(nrow, ncol, figsize=(3.2 * ncol, 2.6 * nrow))
    axes = np.atleast_1d(axes).ravel()
    for i in range(ns):
        ax = axes[i]
        ax.scatter(ts, data[:, i], s=8, facecolors="none", edgecolors="C0",
                   label="data")
        ax.plot(ts, pred[:, i], "C1-", label="CRNN")
        name = species[i] if species else f"y{i + 1}"
        ax.set_ylabel(name)
        if logx:
            ax.set_xscale("log")
        if i == 0:
            ax.legend(frameon=False, fontsize=8)
    for ax in axes[ns:]:
        ax.axis("off")
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_loss_curves(history: dict, path: str, log_x: bool = True) -> None:
    fig, axes = plt.subplots(1, 2, figsize=(8, 3))
    axes[0].plot(history["loss_train"], label="train")
    axes[0].plot(history["loss_val"], label="val")
    axes[0].set_yscale("log")
    if log_x:
        axes[0].set_xscale("log")
    axes[0].set_xlabel("Epoch")
    axes[0].set_ylabel("Loss")
    axes[0].legend(frameon=False)
    if "grad_norm" in history and history["grad_norm"]:
        axes[1].plot(history["grad_norm"], label="grad_norm", color="C2")
        axes[1].set_yscale("log")
        if log_x:
            axes[1].set_xscale("log")
        axes[1].set_xlabel("Epoch")
        axes[1].set_ylabel("Grad norm")
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=110)
    plt.close(fig)


def display_weights(weights, dydt_scale=None) -> str:
    """Pretty-print learned stoichiometry for mechanism inspection
    (display_p equivalents across all cases). Returns the string and prints."""
    lines = ["species (column) reaction (row)"]
    w_in = np.asarray(weights.w_in)
    w_b = np.asarray(weights.w_b)
    w_out = np.asarray(weights.w_out)
    lines.append("w_in:")
    lines.append(np.array2string(w_in.T, precision=3, suppress_small=True))
    lines.append("exp(w_b):")
    lines.append(np.array2string(np.exp(w_b), precision=3, suppress_small=True))
    if dydt_scale is not None:
        w_out_scale = w_out.T * np.asarray(dydt_scale)[None, :] * np.exp(w_b)[:, None]
        denom = np.max(np.abs(w_out_scale), axis=1, keepdims=True)
        lines.append("w_out_scale (row-normalised):")
        lines.append(np.array2string(w_out_scale / denom, precision=3,
                                     suppress_small=True))
    else:
        lines.append("w_out:")
        lines.append(np.array2string(w_out.T, precision=3, suppress_small=True))
    out = "\n".join(lines)
    print(out, flush=True)
    return out
