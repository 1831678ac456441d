"""Summarize the multi-seed head-to-head (VERDICT r2 #3).

Scores every outputs/{ours,reference}_subset_s<seed>/submission.csv against
the generator ground truth and pairs it with the best val NLL / val sMAPE
parsed from the corresponding /tmp train logs (while they exist in-session).
Prints one JSON line per run plus a mean ± spread summary per framework.

Usage: python tools/summarize_seeds.py [--seeds 7 8] [--logs /tmp]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from score_submission import load_submission, score, truth_frame  # noqa: E402


def parse_best(log_path: str, ours: bool):
    """(best_val_nll, val_smape_at_best) from a train log."""

    if not os.path.exists(log_path):
        return None, None
    text = open(log_path, errors="replace").read()
    if ours:
        pairs = re.findall(r"val_nll=([0-9.]+) val_smape=([0-9.]+)", text)
    else:
        pairs = re.findall(r"val_nll=([0-9.]+)\s+val_smape=([0-9.]+)", text)
    if not pairs:
        return None, None
    vals = [(float(a), float(b)) for a, b in pairs]
    return min(vals, key=lambda t: t[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", nargs="*", type=int, default=None)
    ap.add_argument("--logs", default="/tmp")
    ap.add_argument("--data-seed", type=int, default=7)
    args = ap.parse_args()

    truth = truth_frame(args.data_seed)
    rows = []
    for path in sorted(glob.glob("outputs/*_subset_s*/submission.csv")):
        m = re.search(r"outputs/(ours|reference)_subset_s(\d+)/", path)
        if not m:
            continue
        fw, seed = m.group(1), int(m.group(2))
        if args.seeds and seed not in args.seeds:
            continue
        try:
            res = score(load_submission(path, truth), truth)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"framework": fw, "seed": seed, "error": str(e)[:200]}))
            continue
        log = os.path.join(
            args.logs, f"{'ours' if fw == 'ours' else 'ref'}_s{seed}_train.log"
        )
        nll, vsmape = parse_best(log, ours=(fw == "ours"))
        rows.append(
            {
                "framework": fw,
                "seed": seed,
                "test_smape": res["smape"],
                "test_wsmape": res["wsmape"],
                "best_val_nll": nll,
                "val_smape_at_best": vsmape,
            }
        )
        print(json.dumps(rows[-1]))

    for fw in ("ours", "reference"):
        sub = [r for r in rows if r["framework"] == fw]
        if not sub:
            continue
        sm = np.array([r["test_smape"] for r in sub])
        ws = np.array([r["test_wsmape"] for r in sub])
        print(
            json.dumps(
                {
                    "framework": fw,
                    "n_seeds": len(sub),
                    "test_smape_mean": round(float(sm.mean()), 4),
                    "test_smape_spread": round(float(sm.max() - sm.min()), 4),
                    "test_wsmape_mean": round(float(ws.mean()), 4),
                    "test_wsmape_spread": round(float(ws.max() - ws.min()), 4),
                }
            )
        )


if __name__ == "__main__":
    main()
