"""Drive the PyTorch reference's train/predict for the head-to-head benchmark.

The reference CLI (`timesnet_forecast/cli.py`) imports optuna at module
level and optuna is not installed here, so this calls ``train_once`` /
``predict_once`` directly with the same config loader the CLI uses.

Usage:
    python tools/run_reference.py {train,predict} --config configs/reference_subset.yaml
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/reference/src")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["train", "predict"])
    ap.add_argument("--config", required=True)
    ap.add_argument("--override", nargs="*", default=[])
    args = ap.parse_args()

    import torch

    torch.set_num_threads(1)  # single-core host; avoid oversubscription thrash

    # the reference passes prefetch_factor even with num_workers=0
    # (train.py:226), which current torch rejects — shim it out.
    import timesnet_forecast.train as ref_train
    from torch.utils.data import DataLoader as _DL

    def _dataloader(*a, **kw):
        if kw.get("num_workers", 0) == 0:
            kw.pop("prefetch_factor", None)
        return _DL(*a, **kw)

    ref_train.DataLoader = _dataloader

    # the reference fills its int64 sample-submission template with float
    # predictions via .loc, which modern pandas rejects (silent dtype
    # coercion removed) — upcast numeric template columns first.
    import timesnet_forecast.utils.submission as ref_sub

    def _wrap_fill(cls):
        orig = cls.__dict__.get("_fill_template")
        if orig is None:
            return

        def _fill_float(self, template, predictions, context, _orig=orig):
            int_cols = template.select_dtypes(
                include=["int16", "int32", "int64"]
            ).columns
            if len(int_cols):
                template = template.astype({c: "float64" for c in int_cols})
            return _orig(self, template, predictions, context)

        cls._fill_template = _fill_float

    _wrap_fill(ref_sub.SubmissionWriter)
    for _cls in ref_sub.SubmissionWriter.__subclasses__():
        _wrap_fill(_cls)

    from timesnet_forecast.config import PipelineConfig

    cfg = PipelineConfig.from_files(args.config, overrides=args.override)
    if args.cmd == "train":
        from timesnet_forecast.train import train_once

        out = train_once(cfg)
        print(f"train_once -> {out}")
    else:
        from timesnet_forecast.predict import predict_once

        predict_once(cfg)


if __name__ == "__main__":
    main()
