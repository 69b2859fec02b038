"""Side-by-side ODEnet validation vs the torch reference architecture.

The reference validates odenet_mnist on real MNIST (acc ~0.996,
neuralode_examples/odenet_mnist.py:304-376); this environment has no
egress and no bundled MNIST, so this driver performs the
reference-faithful substitute: it trains the REFERENCE'S OWN torch model
(ODEfunc/ODEBlock/conv downsampling imported from the reference checkout,
integrated by the vendored torchdiffeq) and this repo's JAX ODEnet on the
SAME synthetic structured-digit dataset with the same architecture
(dim=64, GroupNorm, time-concat convs), solver (dopri5, rtol=atol=tol),
optimizer (SGD momentum 0.9) and batch schedule, then reports learning
curves, test accuracy, and NFE-F/NFE-B side by side.

  PYTHONPATH=/root/repo python examples/odenet_parity_eval.py \
      --iters 300 --eval-every 50

The recorded table lives in examples/README.md ("ODEnet parity eval").
NFE-B note: both columns train WITHOUT the continuous adjoint (the
reference's default, --adjoint False), where torch backprops through the
autograd graph (b_nfe = 0 by its own meter) and this repo backprops
discretely through the bounded-mode scan — so NFE-B is 0/derived for
both and the comparable meters are accuracy and NFE-F.
"""
from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time
import types

import numpy as np

REFERENCE = "/root/reference"


def load_reference_odenet():
    """Import the reference's model classes without torchvision (absent
    here) and without triggering its argparse-at-import on our argv."""
    path = os.path.join(REFERENCE, "neuralode_examples", "odenet_mnist.py")
    if not os.path.exists(path):
        raise SystemExit("reference checkout not available")
    for name in ("torchvision", "torchvision.datasets",
                 "torchvision.transforms"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].datasets = sys.modules["torchvision.datasets"]
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"]
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)  # vendored torchdiffeq
    argv = sys.argv
    sys.argv = [path]  # reference parses args at module scope
    try:
        spec = importlib.util.spec_from_file_location("ref_odenet_mnist",
                                                      path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.argv = argv
    return mod


def build_reference_model(mod, torch, nn, dim=64):
    """The reference main's conv-downsampling odenet stack
    (odenet_mnist.py:286-304), assembled from its own classes."""
    downsampling = [
        nn.Conv2d(1, dim, 3, 1),
        mod.norm(dim), nn.ReLU(inplace=True),
        nn.Conv2d(dim, dim, 4, 2, 1),
        mod.norm(dim), nn.ReLU(inplace=True),
        nn.Conv2d(dim, dim, 4, 2, 1),
    ]
    feature = [mod.ODEBlock(mod.ODEfunc(dim))]
    fc = [mod.norm(dim), nn.ReLU(inplace=True),
          nn.AdaptiveAvgPool2d((1, 1)), mod.Flatten(),
          nn.Linear(dim, 10)]
    model = nn.Sequential(*downsampling, *feature, *fc)
    return model, feature[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--n-data", type=int, default=4096)
    ap.add_argument("--skip-torch", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # one host, like-for-like
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from odenet_mnist import synthetic_digits

    from bayesian_ode_tpu import odeint, odeint_with_stats
    from bayesian_ode_tpu.models import odenet

    x, y = synthetic_digits(jax.random.PRNGKey(0), args.n_data)
    n_train = int(0.9 * x.shape[0])
    x_train, y_train = x[:n_train], y[:n_train]
    x_test, y_test = x[n_train:], y[n_train:]
    rng = np.random.RandomState(0)
    batches = [rng.randint(0, n_train, args.batch_size)
               for _ in range(args.iters)]

    # ---------------- this repo (JAX) ----------------
    params = odenet.init_params(jax.random.PRNGKey(1), dim=args.dim)
    tx = optax.sgd(args.lr, momentum=0.9)
    opt_state = tx.init(params)
    # max_steps_per_interval=8: at tol=1e-3 the block takes ~4 accepted
    # steps over [0, 1]; the bounded (masked-scan) backprop pays for the
    # full bound, so a tight one quarters the CPU train cost vs the
    # example driver's 32
    solve = lambda f, h0, t: odeint(
        f, h0, t, rtol=args.tol, atol=args.tol, method="dopri5",
        options={"mode": "bounded", "max_steps_per_interval": 8})

    @jax.jit
    def step(params, opt_state, xb, yb):
        loss = odenet.make_loss(solve, xb, yb)
        val, g = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val

    @jax.jit
    def evaluate(params):
        acc = odenet.accuracy(params, x_test[:448], y_test[:448], solve)
        h = odenet.downsample(params["down"], x_test[:8])
        _, st = odeint_with_stats(
            lambda t, hh: odenet.ode_field(params["odefunc"], t, hh), h,
            jnp.asarray([0.0, 1.0]), args.tol, args.tol, "dopri5")
        return acc, st["nfe"]

    jax_rows = []
    t0 = time.time()
    for i, idx in enumerate(batches, 1):
        params, opt_state, val = step(params, opt_state, x_train[idx],
                                      y_train[idx])
        if i % args.eval_every == 0:
            acc, nfe = evaluate(params)
            row = {"iter": i, "loss": float(val), "acc": float(acc),
                   "nfe_f": int(nfe), "sec": time.time() - t0}
            jax_rows.append(row)
            print("jax  ", row, flush=True)

    if args.skip_torch:
        return

    # ---------------- reference (torch) ----------------
    import torch
    import torch.nn as nn

    mod = load_reference_odenet()
    torch.manual_seed(1)
    model, odeblock = build_reference_model(mod, torch, nn, args.dim)
    opt = torch.optim.SGD(model.parameters(), lr=args.lr, momentum=0.9)
    crit = nn.CrossEntropyLoss()
    # NCHW for torch
    xt = torch.tensor(np.moveaxis(np.asarray(x), -1, 1), dtype=torch.float32)
    yt = torch.tensor(np.asarray(y), dtype=torch.long)
    xt_train, yt_train = xt[:n_train], yt[:n_train]
    xt_test, yt_test = xt[n_train:][:448], yt[n_train:][:448]

    torch_rows = []
    t0 = time.time()
    for i, idx in enumerate(batches, 1):
        model.train()
        opt.zero_grad()
        odeblock.nfe = 0
        out = model(xt_train[idx])
        loss = crit(out, yt_train[idx])
        nfe_f = odeblock.nfe
        odeblock.nfe = 0
        loss.backward()
        nfe_b = odeblock.nfe
        opt.step()
        if i % args.eval_every == 0:
            model.eval()
            with torch.no_grad():
                pred = model(xt_test).argmax(1)
                acc = float((pred == yt_test).float().mean())
            row = {"iter": i, "loss": float(loss), "acc": acc,
                   "nfe_f": nfe_f, "nfe_b": nfe_b,
                   "sec": time.time() - t0}
            torch_rows.append(row)
            print("torch", row, flush=True)

    print("\n| iter | jax acc | torch acc | jax NFE-F | torch NFE-F |")
    print("|---|---|---|---|---|")
    for j, t in zip(jax_rows, torch_rows):
        print(f"| {j['iter']} | {j['acc']:.3f} | {t['acc']:.3f} "
              f"| {j['nfe_f']} | {t['nfe_f']} |")


if __name__ == "__main__":
    main()
