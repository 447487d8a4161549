"""Visual walkthrough of the pose post-processing stages.

The reference validated its pipeline with exploratory notebooks
(notebooks/hand.ipynb visualized blur -> threshold -> connected components;
notebooks/detectHand.ipynb checked box placement — SURVEY.md §4). This script
is the executable equivalent: it renders each device-op stage to PNGs so a
human can eyeball the same things, using synthetic heatmaps (no weights
needed) or a real image when checkpoints are available.

    python examples/pipeline_stages.py [--out /tmp/stages]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def colorize(m):
    import cv2

    m = np.asarray(m, np.float32)
    m = (m - m.min()) / max(m.max() - m.min(), 1e-9)
    return cv2.applyColorMap((m * 255).astype(np.uint8), cv2.COLORMAP_JET)


def main():
    import cv2

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from islx.ops.blur import gaussian_blur
    from islx.ops.hand_peaks import _label_components, find_hand_peaks
    from islx.ops.peaks import _nms_mask, find_peaks

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/islx_stages")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    rng = np.random.RandomState(0)
    h = w = 120
    yy, xx = np.mgrid[0:h, 0:w]
    heat = np.zeros((h, w), np.float32)
    for cy, cx, a in [(30, 40, 0.9), (80, 70, 0.6), (55, 100, 0.4)]:
        heat += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 5.0 ** 2))
    heat += rng.randn(h, w).astype(np.float32) * 0.02

    def save(name, img):
        path = os.path.join(args.out, name)
        cv2.imwrite(path, img)
        print("wrote", path)

    save("1_heatmap.png", colorize(heat))

    blurred = gaussian_blur(jnp.asarray(heat), 3.0)
    save("2_blurred.png", colorize(blurred))

    mask = _nms_mask(jnp.asarray(np.asarray(blurred))[:, :, None], 0.1)[:, :, 0]
    vis = colorize(heat)
    ys, xs = np.nonzero(np.asarray(mask))
    for y, x in zip(ys, xs):
        cv2.circle(vis, (int(x), int(y)), 4, (255, 255, 255), 1)
    save("3_nms_peaks.png", vis)

    pk = find_peaks(jnp.asarray(heat)[:, :, None], 0.1, k=8)
    print("peaks:", np.asarray(pk.xy[0][: int(pk.count[0])]).tolist())

    binary = np.asarray(blurred) > 0.05
    labels = np.asarray(_label_components(jnp.asarray(binary)))
    lab_vis = np.zeros((h, w, 3), np.uint8)
    for i, root in enumerate(np.unique(labels[labels < h * w])):
        color = tuple(int(c) for c in rng.randint(60, 255, 3))
        lab_vis[labels == root] = color
    save("4_components.png", lab_vis)

    hp = find_hand_peaks(jnp.asarray(heat)[:, :, None], 0.05)
    print("hand-style peak (largest-mass blob):",
          np.asarray(hp.xy[0]).tolist())


if __name__ == "__main__":
    main()
