"""Slice the top-k restarts out of a hunt snapshot for a continuation run.

The hunt scripts (yeast_restarts.py, robertson_restarts.py pattern) save
``hunt_p_<tag>.npz`` (stacked best-params pytree leaves, restart-major)
and ``hunt_val_<tag>.npy`` (best val per restart). A continuation stage
at decayed lr on only the top basins is cheap (step cost scales ~linearly
in R), so the standard recipe is: 5k-epoch wide hunt -> top-k slice ->
10k-epoch deep run via --init-from.

Usage: python scripts/hunt_topk.py runs/yeast_hunt hunt_p_r64_w5 --k 8
       -> writes hunt_p_<tag>_top<k>.npz next to the input.

--extra appends single-params snapshots (p_opt.npz-style, unstacked
leaves in the same tree order) as additional restart rows — e.g. to seed
a deep continuation with the incumbent champion lineage alongside the
hunt's top basins; the per-lane best-val carry in the hunt driver makes
an incumbent lane risk-free (its recorded best can only improve).
"""

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir")
    ap.add_argument("stem", help="e.g. hunt_p_r64_w5 (no .npz)")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--extra", action="append", default=[],
                    help="single-params .npz to append as one more row")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    val = np.load(os.path.join(args.dir, args.stem.replace("hunt_p_", "hunt_val_") + ".npy"))
    p = np.load(os.path.join(args.dir, args.stem + ".npz"))
    order = np.argsort(val)[: args.k]
    leaves = [p[k][order] for k in p.files]
    for path in args.extra:
        ex = np.load(path)
        ex_leaves = [ex[k] for k in ex.files]
        if len(ex_leaves) != len(leaves):
            raise SystemExit(f"{path}: {len(ex_leaves)} leaves, "
                             f"hunt has {len(leaves)}")
        leaves = [np.concatenate([l, e[None].astype(l.dtype)])
                  for l, e in zip(leaves, ex_leaves)]
    out = args.out or os.path.join(
        args.dir,
        f"{args.stem}_top{args.k}"
        + (f"_x{len(args.extra)}" if args.extra else "") + ".npz")
    np.savez(out, *leaves)
    print(f"top-{args.k} restarts {list(map(int, order))} "
          f"vals {[f'{val[i]:.3e}' for i in order]} "
          f"+ {len(args.extra)} extra -> {out}")


if __name__ == "__main__":
    main()
