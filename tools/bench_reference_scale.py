#!/usr/bin/env python
"""Reproducible reference-scale wall-clock measurements.

Builds the HBN-shaped synthetic cohort (2000 subjects, clinical 7-d +
rois 444-d, 15% missing) once under ``--workdir`` and times the headline
end-to-end stages on the default jax backend:

* ``train``: the 550-epoch CLI training path (chunked driver), for each
  requested ``--save-optimizer`` policy;
* ``daa``: the "/!\\ Long run" Digital Avatars workflow at the reference's
  published scale (n_validation=20, n_samples=150, n_subjects=50, M=1000)
  against the last trained run.

Prints one JSON line per stage (wall seconds, key config) so BASELINE.md
rows can be regenerated with a single command:

    python tools/bench_reference_scale.py --stages train
    python tools/bench_reference_scale.py --stages train,daa \
        --save-optimizer latest

Timing caveat for the relay-attached TPU (BASELINE.md): the shared pool's
congestion varies by several x between windows — record best-of-windows.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # runnable from any cwd


def ensure_cohort(workdir: str) -> str:
    datadir = os.path.join(workdir, "data")
    marker = os.path.join(datadir, ".complete")
    if not os.path.isfile(marker):  # a bare dir may be an aborted build
        shutil.rmtree(datadir, ignore_errors=True)
        from multivae_tpu.data import make_synthetic_cohort

        make_synthetic_cohort(datadir, n_subjects=2000, n_scores=7,
                              n_rois=444, missing_rate=0.15, seed=0,
                              signal_strength=2.0)
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return datadir


def bench_train(workdir: str, datadir: str, save_optimizer: str,
                num_epochs: int = 550) -> dict:
    from multivae_tpu.workflows import train_exp

    outdir = os.path.join(workdir, f"out_{save_optimizer}")
    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir)
    t0 = time.perf_counter()
    run = train_exp(dataset="synthetic", datasetdir=datadir, outdir=outdir,
                    input_dims=[7, 444], latent_dim=20, style_dim=[3, 20],
                    num_epochs=num_epochs, batch_size=256,
                    learning_rate=0.001, use_tensorboard=False,
                    log_every=100, save_optimizer=save_optimizer)
    wall = time.perf_counter() - t0
    return {"stage": "train", "wall_s": round(wall, 1),
            "epochs": num_epochs, "batch_size": 256,
            "save_optimizer": save_optimizer, "run": run, "outdir": outdir}


def bench_daa(workdir: str, datadir: str, outdir: str, run: str,
              artifact: str = "full") -> dict:
    from multivae_tpu.workflows import daa_exp

    # distinct seed per artifact mode -> distinct result dirs, so both can
    # be timed against the same trained run without clobbering each other
    seed = {"full": 1037, "stats-only": 1038,
            "sampled": 1039}[artifact]
    t0 = time.perf_counter()
    daa_exp(dataset="synthetic", datasetdir=datadir, outdir=outdir,
            run=run, n_validation=20, n_samples=150, n_subjects=50,
            M=1000, trust_level=0.7, seed=seed, artifact=artifact)
    wall = time.perf_counter() - t0
    return {"stage": "daa", "wall_s": round(wall, 1),
            "grid": "20x150x50 M=1000", "artifact": artifact, "run": run}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/.bench_data_r3")
    ap.add_argument("--stages", default="train")
    ap.add_argument("--save-optimizer", default="all",
                    help="comma list of policies to time (train stage)")
    ap.add_argument("--num-epochs", type=int, default=550)
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    datadir = ensure_cohort(args.workdir)
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    last_train = None
    for stage in stages:
        if stage == "train":
            for pol in args.save_optimizer.split(","):
                res = bench_train(args.workdir, datadir, pol.strip(),
                                  num_epochs=args.num_epochs)
                last_train = res
                print(json.dumps(res), flush=True)
        elif stage in ("daa", "daa-stats", "daa-sampled"):
            if last_train is None:
                # reuse the newest trained run already in the workdir, so
                # DAA can be re-timed alone (e.g. in a better relay window)
                import glob

                runs = sorted(glob.glob(os.path.join(
                    args.workdir, "out_*", "synthetic_*")))
                if not runs:
                    print(json.dumps({"error": "daa needs a trained run: "
                                               "use --stages train first"}))
                    sys.exit(1)
                last_train = {"outdir": os.path.dirname(runs[-1]),
                              "run": os.path.basename(runs[-1])}
            print(json.dumps(bench_daa(
                args.workdir, datadir, last_train["outdir"],
                last_train["run"],
                artifact={"daa-stats": "stats-only",
                          "daa-sampled": "sampled",
                          "daa": "full"}[stage])), flush=True)
        else:
            print(json.dumps({"error": f"unknown stage {stage!r}"}))
            sys.exit(1)


if __name__ == "__main__":
    main()
