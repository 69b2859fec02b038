"""Experiment CLI: `python -m bayesian_ode_tpu.experiments.run
--json-dir DIR --id N [--experiment vanderpol|toy]`.

Same invocation pattern as the reference drivers (gp.py:529-541,
toy_plots.py:405-417): a JSON config selected by integer id; the
multiprocessing fan-out is replaced by vmapped chains inside the worker.
Dataset regeneration replaces the reference's data pickle: the config's
"data" block carries {ode, N, T, t_max, noise, seed}.

`--id all` runs the WHOLE grid: every process of a multi-host launch
(see parallel/runtime.py) takes its contiguous slice of the sorted config
ids — the reference's `--array=1-81` SLURM fan-out
(/root/reference/scripts/vanderpol/vanderpol_gp.slrm) collapsed into one
SPMD command per host; single-host it simply runs all ids in sequence.
"""
from __future__ import annotations

import argparse
import glob
import os

import jax

from ..models import make_dataset
from ..utils import enable_persistent_cache
from .config import load_config
from .toy import run_toy
from .vanderpol_gp import worker


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-dir", required=True)
    ap.add_argument("--id", required=True,
                    help="integer config id, or 'all' for this process's "
                         "slice of the whole grid (multi-host aware)")
    ap.add_argument("--experiment", default="vanderpol",
                    choices=["vanderpol", "toy"])
    ap.add_argument("--data-pickle", default=None,
                    help="load a reference-format data pickle "
                         "({N,R,noise,x0,t,X,Y,ODE} dict, gp.py:544) "
                         "instead of regenerating the dataset")
    ap.add_argument("--no-plots", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="resume an interrupted sampling run from its "
                         "sampler_ckpt.npz (requires config ckpt_every>0; "
                         "the resumed chain equals an uninterrupted run, "
                         "PRNG stream included)")
    args = ap.parse_args(argv)

    enable_persistent_cache()
    if args.id == "all":
        from ..parallel import init_runtime, process_slice

        rt = init_runtime()
        ids = sorted(
            int(os.path.splitext(os.path.basename(p))[0])
            for p in glob.glob(os.path.join(args.json_dir, "*.json"))
            if os.path.splitext(os.path.basename(p))[0].isdigit()
        )
        mine = ids[process_slice(len(ids), rt)]
        print(f"[process {rt.process_index}/{rt.process_count}] "
              f"config ids {mine}")
        for rid in mine:
            _run_one(args, rid)
        return
    _run_one(args, int(args.id))


def _run_one(args, run_id: int):
    blob = load_config(args.json_dir, run_id)
    output = blob["output"]

    if args.experiment == "toy":
        for cfg in blob["configs"]:
            print(run_toy(cfg, output, make_plots=not args.no_plots))
        return

    if args.data_pickle:
        import pickle

        import jax.numpy as jnp
        import numpy as np

        with open(args.data_pickle, "rb") as f:
            raw = pickle.load(f)
        data = {
            k: (jnp.asarray(np.asarray(v))
                if k in ("x0", "t", "X", "Y") else v)
            for k, v in raw.items()
        }
    else:
        dspec = blob.get("data", {})
        data = make_dataset(
            jax.random.PRNGKey(dspec.get("seed", 0)),
            ode=dspec.get("ode", "vdp"),
            N=dspec.get("N", 5),
            T=dspec.get("T", 60),
            t_max=dspec.get("t_max", 6.0),
            noise=dspec.get("noise", 0.05),
            x0_scale=dspec.get("x0_scale", 1.5),
        )
    for cfg in blob["configs"]:
        if args.resume:
            cfg = dict(cfg, resume=True)
        print(worker(cfg, data, output, make_plots=not args.no_plots))


if __name__ == "__main__":
    main()
