"""Write a real handwritten-digit dataset in the MNIST .npz layout.

This machine has no network egress, so the reference's MNIST download
(neuralode_examples/odenet_mnist.py:304-307, torchvision loader) cannot
run.  scikit-learn ships the UCI Optical Recognition of Handwritten
Digits dataset (1,797 real 8x8 digit scans) offline; this helper resizes
them to 28x28 and stores x_train (N, 28, 28) uint8 / y_train (N,) so
`examples/odenet_mnist.py --mnist-npz` exercises its real-data path on
real images end to end.

  python examples/make_digits_npz.py /tmp/digits28.npz
"""
from __future__ import annotations

import sys

import numpy as np


def make_digits_npz(path: str, seed: int = 0) -> int:
    try:
        from sklearn.datasets import load_digits
    except ImportError as e:  # pragma: no cover - sklearn is baked in here
        raise SystemExit(f"scikit-learn unavailable: {e}")
    from scipy.ndimage import zoom

    x, y = load_digits(return_X_y=True)
    imgs = x.reshape(-1, 8, 8) / 16.0  # pixel range 0..16 in this dataset
    imgs = zoom(imgs, (1, 3.5, 3.5), order=1)  # bilinear 8x8 -> 28x28
    imgs = np.clip(imgs * 255.0, 0, 255).astype(np.uint8)
    # class-ordered on disk; shuffle so the driver's head/tail split is iid
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(y))
    np.savez_compressed(path, x_train=imgs[perm],
                        y_train=y[perm].astype(np.int64))
    return len(y)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/digits28.npz"
    n = make_digits_npz(out)
    print(f"wrote {n} real digit images to {out}")
