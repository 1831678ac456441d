"""Hyper-parameter search around ``train_once``.

Reference analogue: the Optuna TPE tuner in ``cli.py:56-96``. Optuna is used
when importable; otherwise a built-in seeded random-search sampler covers the
same search-space YAML schema (typed specs: int ranges with optional step,
float ranges with optional ``log``, and ``categorical`` choices applied by
dotted config path). Saves ``best_params.json`` and the normalised best
config.
"""

from __future__ import annotations

import math
import os
import random
import time
from typing import Any, Dict, List, Mapping

import numpy as np

from .config import PipelineConfig, load_yaml, save_yaml
from .train import train_once
from .utils.logging import console
from .utils.metadata import save_json

try:  # pragma: no cover - environment dependent
    import optuna  # type: ignore

    HAS_OPTUNA = True
except Exception:  # noqa: BLE001
    optuna = None
    HAS_OPTUNA = False


def _set_dotted(cfg: Dict[str, Any], path: str, value: Any) -> None:
    node = cfg
    parts = path.split(".")
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


def _sample_spec(rng: random.Random, spec: Mapping[str, Any]) -> Any:
    kind = str(spec.get("type", "float"))
    if kind == "categorical":
        return rng.choice(list(spec["choices"]))
    if kind == "int":
        low, high = int(spec["low"]), int(spec["high"])
        step = int(spec.get("step", 1))
        n = (high - low) // step
        return low + rng.randint(0, n) * step
    low, high = float(spec["low"]), float(spec["high"])
    if spec.get("log"):
        return math.exp(rng.uniform(math.log(low), math.log(high)))
    return rng.uniform(low, high)


def _suggest_optuna(trial, path: str, spec: Mapping[str, Any]) -> Any:
    kind = str(spec.get("type", "float"))
    if kind == "categorical":
        return trial.suggest_categorical(path, list(spec["choices"]))
    if kind == "int":
        return trial.suggest_int(
            path, int(spec["low"]), int(spec["high"]), step=int(spec.get("step", 1))
        )
    return trial.suggest_float(
        path, float(spec["low"]), float(spec["high"]), log=bool(spec.get("log", False))
    )


class MedianPruner:
    """Per-epoch median pruning for the in-repo samplers (the optuna
    MedianPruner analogue, wired through ``train_once``'s ``epoch_hook``).

    A trial stops as soon as its best-so-far selection value at epoch k is
    worse than the median of the previous trials' best-so-far values at
    epoch k. The first ``n_startup`` trials and the first ``warmup_epochs``
    epochs are never pruned. Peers that stopped before epoch k contribute
    their final best (conservative: a pruned peer's bad value keeps the
    median honest without ever making it stricter than observed reality).
    """

    def __init__(self, n_startup: int = 4, warmup_epochs: int = 3) -> None:
        self.n_startup = int(n_startup)
        self.warmup_epochs = int(warmup_epochs)
        self._histories: List[Dict[int, float]] = []

    @staticmethod
    def _best_up_to(history: Mapping[int, float], ep: int) -> float | None:
        vals = [v for e, v in history.items() if e <= ep]
        return min(vals) if vals else None

    def hook(self):
        """A fresh per-trial ``epoch_hook(ep, value) -> should_stop``."""

        completed = list(self._histories)  # previous trials only
        hist: Dict[int, float] = {}
        self._histories.append(hist)

        def epoch_hook(ep: int, value: float) -> bool:
            hist[ep] = float(value)
            if len(completed) < self.n_startup or ep <= self.warmup_epochs:
                return False
            peers = [
                b
                for h in completed
                if (b := self._best_up_to(h, ep)) is not None
            ]
            if len(peers) < self.n_startup:
                return False
            mine = self._best_up_to(hist, ep)
            return mine is not None and mine > float(np.median(peers))

        return epoch_hook


def tune(
    base_cfg: PipelineConfig,
    search_space_path: str,
    n_trials: int | None = None,
    out_dir: str | None = None,
) -> Dict[str, Any]:
    space: Dict[str, Mapping[str, Any]] = load_yaml(search_space_path) or {}
    tuning_cfg = dict(base_cfg.raw.get("tuning") or {})
    trials = int(n_trials or tuning_cfg.get("n_trials", 30))
    seed = int(tuning_cfg.get("seed", 2025))
    out_dir = out_dir or base_cfg.raw.get("artifacts", {}).get("dir", "outputs/artifacts")
    os.makedirs(out_dir, exist_ok=True)

    # ``tuning.objective``: val_nll (reference behaviour, cli.py:74-82) or
    # val_smape — both are the value at the selected checkpoint, so pairing
    # val_smape with ``train.selection_metric: smape`` in the base config
    # makes the tuner optimize exactly what selection optimizes.
    objective_key = str(tuning_cfg.get("objective", "val_nll")).lower()
    if objective_key not in ("val_nll", "nll", "val_smape", "smape"):
        raise ValueError(
            f"tuning.objective must be val_nll or val_smape, got {objective_key!r}"
        )

    def run_with(params: Mapping[str, Any], epoch_hook=None) -> float:
        cfg_dict = base_cfg.to_dict()
        for path, value in params.items():
            _set_dotted(cfg_dict, path, value)
        # Trials share one artifacts dir; never let trial N resume from the
        # train_state.msgpack trial N-1 left behind (shape crashes or silent
        # weight/epoch-counter contamination — the sampler would observe
        # garbage objectives).
        cfg_dict.setdefault("train", {})["resume"] = False
        trial_cfg = PipelineConfig.from_mapping(cfg_dict)
        try:
            best_nll, info = train_once(trial_cfg, epoch_hook=epoch_hook)
        except FloatingPointError as err:
            # a diverged trial is a valid (terrible) observation for the
            # sampler, not a reason to kill the whole study
            console().print(f"[red]trial diverged: {err}[/red]")
            return float("inf")
        if objective_key in ("val_smape", "smape"):
            return float(info["metrics"]["smape"])
        return float(best_nll)

    # ``tuning.timeout_min``: wall-clock cap on the whole study (reference
    # cli.py:70-72,85) — honoured by every sampler branch.
    timeout_min = tuning_cfg.get("timeout_min")
    timeout_s = float(timeout_min) * 60.0 if timeout_min is not None else None
    t_start = time.monotonic()

    def _timed_out() -> bool:
        return timeout_s is not None and (time.monotonic() - t_start) >= timeout_s

    results: Dict[str, Any]
    if HAS_OPTUNA:
        sampler_name = str(tuning_cfg.get("sampler", "tpe")).lower()
        if sampler_name.startswith("random"):
            sampler = optuna.samplers.RandomSampler(seed=seed)
        else:
            sampler = optuna.samplers.TPESampler(
                seed=seed, multivariate="multivariate" in sampler_name
            )
        pruner = (
            optuna.pruners.MedianPruner()
            if tuning_cfg.get("pruner", "median") == "median"
            else optuna.pruners.NopPruner()
        )
        study = optuna.create_study(direction="minimize", sampler=sampler, pruner=pruner)

        def objective(trial):
            params = {path: _suggest_optuna(trial, path, spec) for path, spec in space.items()}

            def epoch_hook(ep: int, value: float) -> bool:
                # per-epoch intermediate reports: optuna's MedianPruner gets
                # real curves to prune on (the reference reports once at the
                # end, cli.py:79-81, which never actually prunes)
                trial.report(float(value), step=int(ep))
                return bool(trial.should_prune())

            value = run_with(params, epoch_hook=epoch_hook)
            if trial.should_prune():
                raise optuna.TrialPruned()
            return value

        study.optimize(objective, n_trials=trials, timeout=timeout_s)
        best_params = dict(study.best_params)
        best_value = float(study.best_value)
    else:
        sampler_name = str(tuning_cfg.get("sampler", "tpe")).lower()
        # per-epoch median pruning (same default as the optuna branch);
        # ``tuning.pruner: none`` disables it
        pruner = (
            MedianPruner()
            if str(tuning_cfg.get("pruner", "median")).lower() == "median"
            else None
        )
        def _persist_best(value: float, params: dict) -> None:
            # Written on every improvement, not just at study end: a study
            # killed mid-trial (driver round close, stage timeout) must
            # still leave its best-so-far usable by the winner-confirmation
            # runner instead of silently keeping a stale previous study's.
            save_json(
                {"best_value": value, "objective": objective_key,
                 "best_params": params},
                os.path.join(out_dir, "best_params.json"),
            )
            cfg_out = base_cfg.to_dict()
            for path, v in params.items():
                _set_dotted(cfg_out, path, v)
            save_yaml(
                PipelineConfig.from_mapping(cfg_out).to_dict(),
                os.path.join(out_dir, "best_config.yaml"),
            )

        if sampler_name.startswith("random"):
            console().print("[yellow]built-in seeded random search.[/yellow]")
            rng = random.Random(seed)
            best_params = {}
            best_value = float("inf")
            for i in range(trials):
                if _timed_out():
                    console().print("[yellow]tuning.timeout_min reached; stopping.[/yellow]")
                    break
                params = {path: _sample_spec(rng, spec) for path, spec in space.items()}
                value = run_with(
                    params, epoch_hook=pruner.hook() if pruner else None
                )
                console().print(
                    f"[cyan]trial {i + 1}/{trials}: {objective_key}={value:.6f} {params}[/cyan]"
                )
                if value < best_value:
                    best_value = value
                    best_params = dict(params)
                    _persist_best(best_value, best_params)
        else:
            # In-repo TPE (same algorithm family as optuna's default sampler)
            # so environments without optuna still get model-based search.
            from .tpe import TPESampler

            console().print(
                "[yellow]optuna unavailable; using the built-in TPE sampler.[/yellow]"
            )
            sampler = TPESampler(
                space, seed=seed,
                n_startup=min(5, max(2, trials // 3)),
            )
            best_params = {}
            best_value = float("inf")
            for i in range(trials):
                if _timed_out():
                    console().print("[yellow]tuning.timeout_min reached; stopping.[/yellow]")
                    break
                params = sampler.suggest()
                value = run_with(
                    params, epoch_hook=pruner.hook() if pruner else None
                )
                sampler.observe(value, params)
                console().print(
                    f"[cyan]trial {i + 1}/{trials}: {objective_key}={value:.6f} {params}[/cyan]"
                )
                if value < best_value:
                    best_value = value
                    best_params = dict(params)
                    _persist_best(best_value, best_params)

    save_json(
        {"best_value": best_value, "objective": objective_key, "best_params": best_params},
        os.path.join(out_dir, "best_params.json"),
    )
    best_cfg = base_cfg.to_dict()
    for path, value in best_params.items():
        _set_dotted(best_cfg, path, value)
    save_yaml(
        PipelineConfig.from_mapping(best_cfg).to_dict(),
        os.path.join(out_dir, "best_config.yaml"),
    )
    console().print(
        f"[bold green]Best trial:[/bold green] {objective_key}={best_value:.6f} params={best_params}"
    )
    return {"best_value": best_value, "best_params": best_params}
