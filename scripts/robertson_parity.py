"""Quantitative Robertson parity vs the reference's published table.

The reference's only numeric convergence target is the converged 6-reaction
weight table and slope in /root/reference/robertson/ReadMe.md:15-36. This
script loads a trained parameter vector, row-matches our row-normalised
w_out_scale against that table (brute-force over the 720 reaction
permutations, optional sign flip = reaction direction), and writes
runs/robertson_long/parity.md with numeric deltas.

Usage: python scripts/robertson_parity.py runs/robertson_long/p_final.npy
"""
import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Reference converged table, robertson/ReadMe.md:15-36 (julia display_p(p)).
# Columns: species A, B, C. Rows: the 6 proposed reactions.
REF_W_IN = np.array([
    [2.5,      1.61821, 1.82531],
    [0.194654, 1.81441, 0.0],
    [0.0,      1.71672, 1.82568],
    [0.0,      0.0,     0.0],
    [0.826669, 0.0,     0.0],
    [1.68456,  0.0,     0.0],
])
REF_W_OUT_SCALE = np.array([
    [-1.44505e-6, -0.0173522,  -1.0],
    [-0.983493,   -0.0022889,   1.0],
    [1.0,         -0.953462,   -0.950537],
    [0.204039,     6.61854e-6,  1.0],
    [-1.0,         6.15126e-6,  0.678017],
    [-0.00164248,  1.0,         1.74355e-6],
])
REF_SLOPE = 1.0110600333418567

# The true Robertson mechanism expressed in the same row-normalised
# w_out_scale coordinates (rober_crnn.jl:50-57: A->B, 2B->B+C, B+C->A+C).
TRUE_ROWS = {
    "A -> B":      np.array([-1.0, 1.0, 0.0]),
    "2B -> B + C": np.array([0.0, -1.0, 1.0]),
    "B + C -> A + C": np.array([1.0, -1.0, 0.0]),
}


def row_normalise(w):
    return w / np.abs(w).max(axis=1, keepdims=True)


def match(ours, ref):
    """Best permutation (+ optional per-row sign flip) minimising total L1."""
    n = ref.shape[0]
    best = (np.inf, None, None)
    for perm in itertools.permutations(range(n)):
        signs, cost = [], 0.0
        for i, j in enumerate(perm):
            d_pos = np.abs(ours[j] - ref[i]).sum()
            d_neg = np.abs(-ours[j] - ref[i]).sum()
            if d_neg < d_pos:
                signs.append(-1)
                cost += d_neg
            else:
                signs.append(1)
                cost += d_pos
        if cost < best[0]:
            best = (cost, perm, signs)
    return best


def main(p_path, out_md, seed=1234):
    import jax.numpy as jnp

    from crnn_tpu.cases.robertson import RobertsonConfig, build
    from crnn_tpu.transforms.p2vec import p2vec_robertson

    p = np.load(p_path)
    setup = build(RobertsonConfig(seed=seed))
    w = p2vec_robertson(jnp.asarray(p, jnp.float64), 3, 6)
    w_in = np.asarray(w.w_in).T          # (nr, ns): reaction rows
    w_out = np.asarray(w.w_out).T        # (nr, ns)
    dydt_scale = np.asarray(setup.dydt_scale)
    ours_scale = row_normalise(w_out * dydt_scale)
    slope = float(np.abs(p)[-1])

    cost, perm, signs = match(ours_scale, REF_W_OUT_SCALE)
    lines = []
    lines.append("# Robertson parity vs robertson/ReadMe.md:15-36\n")
    lines.append(f"Trained params: `{p_path}`\n")
    lines.append(f"\n**slope**: ours {slope:.6f} vs reference {REF_SLOPE:.6f} "
                 f"(delta {abs(slope-REF_SLOPE):.4f}, "
                 f"{abs(slope-REF_SLOPE)/REF_SLOPE*100:.2f}%)\n")
    lines.append("\n## Row-normalised w_out_scale (reaction rows matched by "
                 "brute-force permutation; sign flip = learned direction)\n")
    lines.append("| ref row | ref w_out_scale | ours (matched) | sign | L1 delta |")
    lines.append("|---|---|---|---|---|")
    total = 0.0
    for i, j in enumerate(perm):
        ours_row = signs[i] * ours_scale[j]
        d = np.abs(ours_row - REF_W_OUT_SCALE[i]).sum()
        total += d
        lines.append(
            f"| {i+1} | {np.round(REF_W_OUT_SCALE[i], 3).tolist()} "
            f"| {np.round(ours_row, 3).tolist()} | {signs[i]:+d} | {d:.3f} |")
    lines.append(f"\nTotal L1 over all 18 entries: **{total:.3f}** "
                 f"(mean per entry {total/18:.3f}).\n")

    # w_in comparison under the same permutation
    lines.append("\n## w_in (reaction orders) under the same matching\n")
    lines.append("| ref row | ref w_in | ours (matched) | L1 delta |")
    lines.append("|---|---|---|---|")
    for i, j in enumerate(perm):
        d = np.abs(w_in[j] - REF_W_IN[i]).sum()
        lines.append(f"| {i+1} | {np.round(REF_W_IN[i], 3).tolist()} "
                     f"| {np.round(w_in[j], 3).tolist()} | {d:.3f} |")

    # essential-mechanism recovery: nearest learned row per true reaction
    lines.append("\n## Essential 3-reaction mechanism (truth, "
                 "rober_crnn.jl:50-57)\n")
    lines.append("Because the 6-reaction proposal is over-parameterised, the "
                 "converged table is NOT unique across seeds/frameworks (the "
                 "reference ReadMe itself says the 6-reaction ansatz is chosen "
                 "for optimisability and reduced post-hoc); the invariant "
                 "content is the essential mechanism:\n")
    lines.append("| true reaction | w_out_scale | closest learned row | cos |")
    lines.append("|---|---|---|---|")
    for name, row in TRUE_ROWS.items():
        cosv = ours_scale @ row / (np.linalg.norm(ours_scale, axis=1)
                                   * np.linalg.norm(row))
        jbest = int(np.argmax(np.abs(cosv)))
        lines.append(f"| {name} | {row.tolist()} "
                     f"| row {jbest+1}: {np.round(ours_scale[jbest], 3).tolist()} "
                     f"| {cosv[jbest]:+.3f} |")
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_md}; slope delta "
          f"{abs(slope-REF_SLOPE)/REF_SLOPE*100:.2f}%, total L1 {total:.3f}")


if __name__ == "__main__":
    p_path = sys.argv[1] if len(sys.argv) > 1 else "runs/robertson_long/p_final.npy"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1234
    main(p_path, "runs/robertson_long/parity.md", seed=seed)
