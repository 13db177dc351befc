#!/usr/bin/env python3
"""Generate the committed miniature original-format BAL fixture
(tests/data/mini-bal-12-48-pre.txt).

Real BAL archives cannot be downloaded in this environment (no
network), so the fixture is a synthetic scene written with the ORIGINAL
BAL camera model and magnitudes (Rodrigues rotation, translation,
f ~ 500 px, k1/k2 radial distortion, pixel-scale observations with the
BAL -z projection convention, bal_problem.cpp:306-471 reader grammar):
everything a real problem-*-pre.txt exercises in the loader and the
--create-dataset randomizer. Deterministic; regenerate with
`python scripts/gen_bal_fixture.py`.
"""

import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "data", "mini-bal-12-48-pre.txt")


def rodrigues(axis_angle):
    th = np.linalg.norm(axis_angle)
    if th < 1e-12:
        return np.eye(3)
    k = axis_angle / th
    K = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]]
    )
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def main():
    rng = np.random.default_rng(20260819)
    n_cams, n_lms = 12, 48

    # cameras on an arc ~10 units from the scene, looking at origin
    cams = []
    for i in range(n_cams):
        ang = (i / n_cams - 0.5) * 0.8
        # cameras at z ~ +10 so the scene sits down the BAL -z axis
        center = np.array(
            [10 * np.sin(ang), 0.5 * rng.standard_normal(),
             10 * np.cos(ang)]
        )
        # rotation: look roughly at the origin (BAL: X_cam = R X + t)
        rot_vec = np.array([0.02, -ang, 0.01]) + 0.01 * (
            rng.standard_normal(3)
        )
        R = rodrigues(rot_vec)
        t = -R @ center
        f = 500.0 + 40.0 * rng.standard_normal()
        k1 = -1e-7 * (1 + 0.3 * rng.standard_normal())
        k2 = 1e-13 * (1 + 0.3 * rng.standard_normal())
        cams.append((rot_vec, t, f, k1, k2, R))

    lms = rng.standard_normal((n_lms, 3)) * np.array([3.0, 2.0, 1.5])

    obs = []
    for j, X in enumerate(lms):
        # each landmark seen by 3-5 nearby cameras
        start = rng.integers(0, n_cams - 3)
        for i in range(start, min(start + int(rng.integers(3, 6)),
                                  n_cams)):
            rot_vec, t, f, k1, k2, R = cams[i]
            P = R @ X + t
            if P[2] >= -1e-3:  # BAL looks down -z
                continue
            p = -P[:2] / P[2]
            r = 1 + k1 * (p @ p) + k2 * (p @ p) ** 2
            uv = f * r * p + 0.5 * rng.standard_normal(2)
            obs.append((i, j, uv[0], uv[1]))

    # every landmark needs >= 2 observations for the filter to keep it
    counts = np.bincount([o[1] for o in obs], minlength=n_lms)
    keep = counts >= 2
    remap = -np.ones(n_lms, int)
    remap[keep] = np.arange(keep.sum())
    obs = [(c, remap[l], u, v) for c, l, u, v in obs if keep[l]]
    lms = lms[keep]
    n_lms = len(lms)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        fh.write(f"{n_cams} {n_lms} {len(obs)}\n")
        for c, l, u, v in obs:
            fh.write(f"{c} {l} {u:.6e} {v:.6e}\n")
        for rot_vec, t, f, k1, k2, _ in cams:
            for x in (*rot_vec, *t, f, k1, k2):
                fh.write(f"{x:.16e}\n")
        for X in lms:
            for x in X:
                fh.write(f"{x:.16e}\n")
    print(f"wrote {OUT}: {n_cams} cams, {n_lms} lms, {len(obs)} obs")


if __name__ == "__main__":
    main()
