"""Command-line interface.

Command surface mirrors the reference's fire map (``experiments/experiments.py:
21-34``): train, daa, anova, daa-plot-most-connected, daa-plot-score-metric,
rsa, rsa-plot, hist-plot, daa-analysis, daa-robustness, univariate-tests —
implemented with argparse (python-fire is not in the image). Function
signatures drive the argument parsers, so flags match the workflow-function
parameters exactly (e.g. ``--input-dims 7 444``, ``--method joint_elbo``).
"""

from __future__ import annotations

import argparse
import inspect
import sys
from typing import Callable, Dict, Sequence

def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (shared helper; see
    ``utils/compile_cache.py`` — the env-var spelling of the option is
    ignored by this jax build, so ``jax.config.update`` is required)."""
    from .utils.compile_cache import enable_compile_cache

    enable_compile_cache()


def _add_args_from_signature(parser: argparse.ArgumentParser,
                             fn: Callable) -> None:
    sig = inspect.signature(fn)
    for name, param in sig.parameters.items():
        flag = "--" + name.replace("_", "-")
        aliases = []
        if flag.lower() != flag:
            aliases.append(flag.lower())  # e.g. --M also accepts --m
        default = param.default
        required = default is inspect.Parameter.empty
        kw: Dict = {"required": required}
        if not required:
            kw["default"] = default
        # PEP 563 (from __future__ import annotations) stringizes
        # annotations, so accept both forms
        ann = {int: int, float: float, str: str,
               "int": int, "float": float, "str": str}.get(param.annotation)
        if ann is not None:
            kw["type"] = ann
        elif isinstance(default, bool):
            kw["type"] = lambda v: str(v).lower() in ("1", "true", "yes")
        elif isinstance(default, int):
            kw["type"] = int
        elif isinstance(default, float):
            kw["type"] = float
        elif isinstance(default, (list, tuple)):
            kw["nargs"] = "+"
            elem = default[0] if len(default) else 0
            kw["type"] = type(elem) if elem is not None else str
            kw["default"] = list(default)
        elif default is None or isinstance(default, str):
            kw["type"] = str
        else:
            kw["type"] = str
        # names that are int/float lists in the workflows
        if name in ("input_dims", "style_dim"):
            kw["nargs"] = "+"
            kw["type"] = int
        # hist-plot compares cohorts: aligned str lists (one score per
        # cohort entry), like the reference's fire-parsed list args
        if name in ("datasets", "datasetdirs", "scores"):
            kw["nargs"] = "+"
            kw["type"] = str
        if aliases:
            kw["dest"] = name
        parser.add_argument(flag, *aliases, **kw)


def _commands() -> Dict[str, Callable]:
    from . import workflows as wf
    from .analysis import avatars as av
    cmds = {
        "train": wf.train_exp,
        "resume": wf.resume_exp,
        "eval": wf.eval_exp,
        "daa": wf.daa_exp,
        "anova": wf.anova_exp,
        "daa-plot-most-connected": wf.daa_plot_most_connected,
        "daa-plot-score-metric": wf.daa_plot_score_metric,
        "rsa": wf.rsa_exp,
        "rsa-plot": wf.rsa_plot_exp,
        "hist-plot": wf.hist_plot_exp,
        "avatar-plot": wf.avatar_plot_exp,
        "daa-analysis": av.analyze_avatars,
        "daa-robustness": av.assess_robustness,
        "univariate-tests": av.univariate_tests,
    }
    return cmds


def main(argv: Sequence[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    _enable_compile_cache()
    parser = argparse.ArgumentParser(
        prog="multivae_tpu",
        description="TPU-native multimodal-VAE training and "
                    "interpretability workflows")
    sub = parser.add_subparsers(dest="command", required=True)
    cmds = _commands()
    for name, fn in cmds.items():
        p = sub.add_parser(name, help=(fn.__doc__ or "").split("\n")[0])
        _add_args_from_signature(p, fn)
        p.set_defaults(_fn=fn)
    args = parser.parse_args(argv)
    fn = args._fn
    kwargs = {k: v for k, v in vars(args).items()
              if k not in ("command", "_fn")}
    fn(**kwargs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
