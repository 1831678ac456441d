"""Utilities to compare against the PyTorch reference implementation.

The reference checkout (read-only) is the numerical oracle for the parity
gates (NB-NLL within 1e-5, identical forward outputs with transplanted
weights). Tests importing this module must skip when the checkout is absent.
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict

import numpy as np

REFERENCE_SRC = "/root/reference/src"

HAS_REFERENCE = os.path.isdir(REFERENCE_SRC)
if HAS_REFERENCE and REFERENCE_SRC not in sys.path:
    sys.path.insert(0, REFERENCE_SRC)


def torch_linear(params: Dict[str, Any], state, prefix: str) -> None:
    """Copy a torch Linear's weight/bias into a flax Dense param dict."""

    params["kernel"] = np.asarray(state[f"{prefix}.weight"].detach()).T.copy()
    params["bias"] = np.asarray(state[f"{prefix}.bias"].detach()).copy()


def torch_layernorm(params: Dict[str, Any], state, prefix: str) -> None:
    params["scale"] = np.asarray(state[f"{prefix}.weight"].detach()).copy()
    params["bias"] = np.asarray(state[f"{prefix}.bias"].detach()).copy()


def torch_conv2d_to_tap(state, prefix: str):
    """torch Conv2d weight [Cout, Cin, kh, kw] -> tap kernel [kh, kw, Cin, Cout]."""

    w = np.asarray(state[f"{prefix}.weight"].detach())
    b = np.asarray(state[f"{prefix}.bias"].detach())
    return np.transpose(w, (2, 3, 1, 0)).copy(), b.copy()


def torch_conv1x1(state, prefix: str):
    """torch 1x1 Conv2d weight [Cout, Cin, 1, 1] -> pointwise kernel [Cin, Cout]."""

    w = np.asarray(state[f"{prefix}.weight"].detach())
    b = np.asarray(state[f"{prefix}.bias"].detach())
    return np.transpose(w[:, :, 0, 0], (1, 0)).copy(), b.copy()


def convert_inception_block(state, prefix: str, kernel_set, bottleneck_ratio: float,
                            in_ch: int, out_ch: int) -> Dict[str, Any]:
    """Map a reference InceptionBlock state dict onto flax param names."""

    import math

    out: Dict[str, Any] = {}
    single = math.isclose(bottleneck_ratio, 1.0, rel_tol=1e-9, abs_tol=1e-9)
    for i, _ in enumerate(kernel_set):
        branch: Dict[str, Any] = {}
        base = f"{prefix}.paths.{i}.branch"
        if single:
            k, b = torch_conv2d_to_tap(state, f"{base}.0")
            branch["conv_kernel"], branch["conv_bias"] = k, b
        else:
            k, b = torch_conv1x1(state, f"{base}.0")
            branch["reduce_kernel"], branch["reduce_bias"] = k, b
            k, b = torch_conv2d_to_tap(state, f"{base}.1")
            branch["conv_kernel"], branch["conv_bias"] = k, b
            k, b = torch_conv1x1(state, f"{base}.2")
            branch["expand_kernel"], branch["expand_bias"] = k, b
        out[f"branch_{i}"] = branch
    k, b = torch_conv1x1(state, f"{prefix}.proj")
    out["proj_kernel"], out["proj_bias"] = k, b
    if in_ch != out_ch:
        k, b = torch_conv1x1(state, f"{prefix}.res_proj")
        out["res_kernel"], out["res_bias"] = k, b
    return out


def convert_timesblock(state, prefix: str, kernel_set, bottleneck_ratio: float,
                       d_model: int, d_ff: int) -> Dict[str, Any]:
    return {
        "inception_in": convert_inception_block(
            state, f"{prefix}.inception.0", kernel_set, bottleneck_ratio, d_model, d_ff
        ),
        "inception_out": convert_inception_block(
            state, f"{prefix}.inception.2", kernel_set, bottleneck_ratio, d_ff, d_model
        ),
    }


def convert_timesnet_state(model_torch, cfg) -> Dict[str, Any]:
    """Full reference TimesNet state dict -> flax param tree for our TimesNet.

    ``model_torch`` must already be warm-built (one forward done).
    ``cfg`` is our TimesNetConfig describing the same architecture.
    """

    state = model_torch.state_dict()
    params: Dict[str, Any] = {}

    if cfg.static_dim > 0 and "static_proj.weight" in state:
        sp: Dict[str, Any] = {}
        torch_linear(sp, state, "static_proj")
        params["static_proj"] = sp
        if cfg.static_layernorm and "static_norm.weight" in state:
            sn: Dict[str, Any] = {}
            torch_layernorm(sn, state, "static_norm")
            params["static_norm"] = sn
    if cfg.id_embed_dim > 0 and "series_embedding.weight" in state:
        params["series_embedding"] = {
            "embedding": np.asarray(state["series_embedding.weight"].detach()).copy()
        }
    if "context_norm.weight" in state:
        cn: Dict[str, Any] = {}
        torch_layernorm(cn, state, "context_norm")
        params["context_norm"] = cn
    if "context_coeff.weight" in state:
        cc: Dict[str, Any] = {}
        torch_linear(cc, state, "context_coeff")
        params["context_coeff"] = cc
        params["temporal_context"] = {
            "scale": np.asarray(state["temporal_context.scale"].detach()).copy()
        }
    if "context_proj.weight" in state:
        cp: Dict[str, Any] = {}
        torch_linear(cp, state, "context_proj")
        params["context_proj"] = cp

    emb: Dict[str, Any] = {}
    ve: Dict[str, Any] = {}
    torch_linear(ve, state, "embedding.value_embedding")
    emb["value_embedding"] = ve
    if "embedding.temporal_embedding.weight" in state and cfg.time_features > 0:
        te: Dict[str, Any] = {}
        torch_linear(te, state, "embedding.temporal_embedding")
        emb["temporal_embedding"] = te
    if "embedding.aux_norm.weight" in state:
        an: Dict[str, Any] = {}
        torch_layernorm(an, state, "embedding.aux_norm")
        emb["aux_norm"] = an
        emb["gate"] = np.asarray(state["embedding.gate"].detach()).copy()
    if "embedding.norm.weight" in state:
        nm: Dict[str, Any] = {}
        torch_layernorm(nm, state, "embedding.norm")
        emb["norm"] = nm
    params["embedding"] = emb

    for i in range(cfg.n_layers):
        params[f"blocks_{i}"] = convert_timesblock(
            state,
            f"blocks.{i}",
            cfg.kernel_set,
            cfg.bottleneck_ratio,
            cfg.d_model,
            cfg.hidden_ff,
        )

    ln: Dict[str, Any] = {}
    torch_layernorm(ln, state, "layer_norm")
    params["layer_norm"] = ln
    tp: Dict[str, Any] = {}
    torch_linear(tp, state, "forecast_time_proj")
    params["forecast_time_proj"] = tp
    mu: Dict[str, Any] = {}
    torch_linear(mu, state, "mu_head")
    params["mu_head"] = mu
    sg: Dict[str, Any] = {}
    torch_linear(sg, state, "sigma_head")
    params["sigma_head"] = sg
    if "late_bias_head.weight" in state:
        lb: Dict[str, Any] = {}
        torch_linear(lb, state, "late_bias_head")
        params["late_bias_head"] = lb
        lbn: Dict[str, Any] = {}
        torch_layernorm(lbn, state, "late_bias_norm")
        params["late_bias_norm"] = lbn
        params["late_bias_gate"] = np.asarray(state["late_bias_gate"].detach()).copy()
    return params
