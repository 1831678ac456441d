"""North-star parity gates against the PyTorch reference implementation.

Covers: NB-NLL (<= 1e-5), FFT period selector outputs, and the full TimesNet
forward with transplanted weights (<= 1e-4 elementwise on rate/dispersion).
Skipped when the reference checkout is unavailable.
"""

import numpy as np
import pytest

from torch_ref import HAS_REFERENCE, convert_timesnet_state

pytestmark = pytest.mark.skipif(not HAS_REFERENCE, reason="reference checkout missing")

import jax
import jax.numpy as jnp
import torch

from flow_timesnet_tpu import losses as jlosses
from flow_timesnet_tpu.models.period import select_periods
from flow_timesnet_tpu.models.timesnet import TimesNet, TimesNetConfig

from timesnet_forecast import losses as tlosses
from timesnet_forecast.models.timesnet import (
    FFTPeriodSelector as TorchSelector,
    TimesNet as TorchTimesNet,
)


def test_nb_nll_matches_reference():
    rng = np.random.default_rng(0)
    y = rng.poisson(3.0, size=(4, 7, 5)).astype(np.float32)
    rate = rng.gamma(2.0, 2.0, size=(4, 7, 5)).astype(np.float32)
    disp = rng.gamma(2.0, 0.5, size=(4, 7, 5)).astype(np.float32)
    mask = (rng.random((4, 7, 5)) > 0.3).astype(np.float32)

    ours = float(
        jlosses.negative_binomial_nll(
            jnp.asarray(y), jnp.asarray(rate), jnp.asarray(disp), jnp.asarray(mask)
        )
    )
    theirs = float(
        tlosses.negative_binomial_nll(
            torch.from_numpy(y), torch.from_numpy(rate), torch.from_numpy(disp),
            torch.from_numpy(mask),
        )
    )
    assert abs(ours - theirs) <= 1e-5


def test_nb_nll_nan_targets_are_masked_out():
    """NaN targets are excluded (we improve on the reference, which would
    propagate NaN through ``(ll * weight).sum()`` — its pipeline never feeds
    NaN targets because of fillna(0))."""

    y = np.array([[[0.0], [2.0], [np.nan]]], dtype=np.float32)
    rate = np.array([[[1.0], [2.0], [3.0]]], dtype=np.float32)
    disp = np.array([[[0.5], [0.5], [0.5]]], dtype=np.float32)
    ours = float(
        jlosses.negative_binomial_nll(jnp.asarray(y), jnp.asarray(rate), jnp.asarray(disp))
    )
    finite_only = float(
        tlosses.negative_binomial_nll(
            torch.from_numpy(y[:, :2]), torch.from_numpy(rate[:, :2]),
            torch.from_numpy(disp[:, :2]),
        )
    )
    # reference mean over 2 valid elements vs ours over denom 2
    assert np.isfinite(ours)
    assert abs(ours - finite_only) <= 1e-6


@pytest.mark.parametrize("L,k,pmax,min_thresh", [(48, 3, 48, 1), (28, 2, 28, 7), (96, 4, 96, 2)])
def test_fft_selector_matches_reference(L, k, pmax, min_thresh):
    rng = np.random.default_rng(1)
    t = np.arange(L, dtype=np.float32)
    base = (
        1.5 * np.sin(2 * np.pi * t / 12.0)
        + 0.7 * np.sin(2 * np.pi * t / 6.0)
        + 0.2 * rng.standard_normal(L).astype(np.float32)
    )
    x = np.stack([base + 0.1 * j for j in range(3)], axis=-1)[None].repeat(2, axis=0)
    x = x.astype(np.float32)

    sel = select_periods(jnp.asarray(x), k, pmax, min_thresh)
    torch_sel = TorchSelector(k_periods=k, pmax=pmax, min_period_threshold=min_thresh)
    t_periods, t_amps = torch_sel(torch.from_numpy(x))

    ours_p = np.asarray(sel.periods)[np.asarray(sel.valid)]
    ours_a = np.asarray(sel.amplitudes)[:, np.asarray(sel.valid)]
    assert list(ours_p) == list(t_periods.numpy())
    np.testing.assert_allclose(ours_a, t_amps.numpy(), rtol=1e-5, atol=1e-5)


def _build_pair(seed=0, **overrides):
    """Construct matched (torch reference, ours) models with shared weights."""

    defaults = dict(
        input_len=28,
        pred_len=7,
        d_model=16,
        d_ff=24,
        n_layers=2,
        k_periods=2,
        kernel_set=((3, 3), (5, 5)),
        dropout=0.0,
        activation="gelu",
        mode="direct",
        bottleneck_ratio=2.0,
        min_period_threshold=2,
        c_in=1,
        static_dim=5,
        time_features=8,
        id_vocab=6,
        id_embed_dim=4,
        static_proj_dim=6,
        static_layernorm=True,
        use_zero_mean_context=True,
        context_rank=3,
        context_scale=0.05,
        use_constant_context_bias=False,
        use_late_bias_head=True,
        min_sigma=1e-3,
    )
    defaults.update(overrides)
    cfg = TimesNetConfig(**defaults)

    torch.manual_seed(seed)
    tmodel = TorchTimesNet(
        input_len=cfg.input_len,
        pred_len=cfg.pred_len,
        d_model=cfg.d_model,
        n_layers=cfg.n_layers,
        k_periods=cfg.k_periods,
        kernel_set=[list(k) for k in cfg.kernel_set],
        dropout=cfg.dropout,
        activation=cfg.activation,
        mode=cfg.mode,
        d_ff=cfg.d_ff,
        bottleneck_ratio=cfg.bottleneck_ratio,
        min_period_threshold=cfg.min_period_threshold,
        use_embedding_norm=cfg.use_embedding_norm,
        embed_norm_mode=cfg.embed_norm_mode,
        min_sigma=cfg.min_sigma,
        id_embed_dim=cfg.id_embed_dim,
        static_proj_dim=cfg.static_proj_dim,
        static_layernorm=cfg.static_layernorm,
        use_zero_mean_context=cfg.use_zero_mean_context,
        context_rank=cfg.context_rank,
        context_scale=cfg.context_scale,
        use_constant_context_bias=cfg.use_constant_context_bias,
    )
    tmodel.eval()
    return cfg, tmodel


def _warmup_inputs(cfg, B, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(cfg.input_len, dtype=np.float32)
    x = (
        2.0
        + np.sin(2 * np.pi * t / 7.0)[None, :, None]
        + 0.3 * rng.standard_normal((B, cfg.input_len, cfg.c_in)).astype(np.float32)
    ).astype(np.float32)
    marks = rng.standard_normal((B, cfg.input_len, cfg.time_features)).astype(np.float32)
    static = rng.standard_normal((B, cfg.c_in, cfg.static_dim)).astype(np.float32)
    ids = rng.integers(0, cfg.id_vocab, size=(B, cfg.c_in)).astype(np.int64)
    # The reference sizes its lazily-built embedding to max(id) + 1 on the
    # first forward (timesnet.py:1612); pin the max id so both vocabularies
    # match cfg.id_vocab.
    ids[0, 0] = cfg.id_vocab - 1
    return x, marks, static, ids


VARIANTS = {
    "direct": dict(mode="direct"),
    "recursive": dict(mode="recursive"),
    "relu_nobottleneck": dict(activation="relu", bottleneck_ratio=1.0),
    "const_bias": dict(use_constant_context_bias=True, use_zero_mean_context=False,
                       context_rank=0),
    "no_context": dict(static_dim=0, id_embed_dim=0, use_zero_mean_context=False,
                       context_rank=0, time_features=0),
    "layer_norm_mode": dict(embed_norm_mode="layer"),
    "rms_norm_mode": dict(embed_norm_mode="rms"),
    "multi_kernel": dict(kernel_set=((3, 3), (5, 5), (7, 7)), k_periods=3,
                         min_period_threshold=1),
}


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_full_forward_matches_reference(variant):
    cfg, tmodel = _build_pair(**VARIANTS[variant])
    B = 4
    x, marks, static, ids = _warmup_inputs(cfg, B)
    marks_in = marks if cfg.time_features > 0 else None
    static_in = static if cfg.static_dim > 0 else None
    ids_in = ids if cfg.id_embed_dim > 0 else None

    torch_kwargs = {}
    if marks_in is not None:
        torch_kwargs["x_mark"] = torch.from_numpy(marks_in)
    if static_in is not None:
        torch_kwargs["series_static"] = torch.from_numpy(static_in)
    if ids_in is not None:
        torch_kwargs["series_ids"] = torch.from_numpy(ids_in)
    with torch.no_grad():
        t_rate, t_disp = tmodel(torch.from_numpy(x), **torch_kwargs)

    model = TimesNet(cfg)
    key = jax.random.PRNGKey(0)
    # Structure/shape check only: eval_shape traces init without compiling or
    # executing it (the transplanted params are what actually run below).
    variables = jax.eval_shape(
        lambda k: model.init(
            {"params": k},
            jnp.asarray(x),
            jnp.asarray(marks_in) if marks_in is not None else None,
            jnp.asarray(static_in) if static_in is not None else None,
            jnp.asarray(ids_in) if ids_in is not None else None,
            deterministic=True,
        ),
        key,
    )
    transplanted = convert_timesnet_state(tmodel, cfg)
    # Every initialised leaf must be covered by the transplant.
    import flax

    flat_init = flax.traverse_util.flatten_dict(variables["params"])
    flat_new = flax.traverse_util.flatten_dict(transplanted)
    assert set(flat_init) == set(flat_new), (
        sorted(set(flat_init) - set(flat_new)),
        sorted(set(flat_new) - set(flat_init)),
    )
    for path, leaf in flat_init.items():
        assert np.asarray(flat_new[path]).shape == leaf.shape, path
    params = flax.traverse_util.unflatten_dict(
        {k: jnp.asarray(v, jnp.float32) for k, v in flat_new.items()}
    )

    # jit: one persisted program per variant (eager apply = ~100s of per-op
    # compiles, each re-looked-up from the persistent cache on every run)
    fwd = jax.jit(lambda p, *a: model.apply({"params": p}, *a, deterministic=True))
    rate, disp = fwd(
        params,
        jnp.asarray(x),
        jnp.asarray(marks_in) if marks_in is not None else None,
        jnp.asarray(static_in) if static_in is not None else None,
        jnp.asarray(ids_in) if ids_in is not None else None,
    )
    np.testing.assert_allclose(
        np.asarray(rate), t_rate.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(disp), t_disp.numpy(), rtol=1e-4, atol=1e-4
    )


def test_forward_nll_delta_within_tolerance():
    """End-to-end NB-NLL computed from both stacks agrees within 1e-5."""

    cfg, tmodel = _build_pair()
    B = 4
    x, marks, static, ids = _warmup_inputs(cfg, B, seed=3)
    rng = np.random.default_rng(9)
    y = rng.poisson(2.0, size=(B, cfg.pred_len, cfg.c_in)).astype(np.float32)

    with torch.no_grad():
        t_rate, t_disp = tmodel(
            torch.from_numpy(x),
            x_mark=torch.from_numpy(marks),
            series_static=torch.from_numpy(static),
            series_ids=torch.from_numpy(ids),
        )
    t_nll = float(
        tlosses.negative_binomial_nll(
            torch.from_numpy(y), t_rate, t_disp,
            tlosses.negative_binomial_mask(torch.from_numpy(y), t_rate, t_disp),
        )
    )

    import flax

    model = TimesNet(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(x), jnp.asarray(marks), jnp.asarray(static), jnp.asarray(ids),
        deterministic=True,
    )
    flat_new = flax.traverse_util.flatten_dict(convert_timesnet_state(tmodel, cfg))
    params = flax.traverse_util.unflatten_dict(
        {k: jnp.asarray(v, jnp.float32) for k, v in flat_new.items()}
    )
    rate, disp = jax.jit(
        lambda p, *a: model.apply({"params": p}, *a, deterministic=True)
    )(params, jnp.asarray(x), jnp.asarray(marks), jnp.asarray(static), jnp.asarray(ids))
    ours = float(
        jlosses.negative_binomial_nll(
            jnp.asarray(y), rate, disp,
            jlosses.negative_binomial_mask(jnp.asarray(y), rate, disp),
        )
    )
    assert abs(ours - t_nll) <= 1e-5


def test_fft_selector_fuzz_vs_reference():
    """Seeded fuzz over lengths/k/bounds with random inputs."""

    rng = np.random.default_rng(7)
    for trial in range(25):
        L = int(rng.integers(4, 128))
        C = int(rng.integers(1, 5))
        B = int(rng.integers(1, 4))
        k = int(rng.integers(1, 6))
        pmax = int(rng.integers(1, L + 8))
        min_thresh = int(rng.integers(1, 10))
        x = rng.standard_normal((B, L, C)).astype(np.float32)

        sel = select_periods(jnp.asarray(x), k, pmax, min_thresh)
        torch_sel = TorchSelector(k_periods=k, pmax=pmax, min_period_threshold=min_thresh)
        t_periods, t_amps = torch_sel(torch.from_numpy(x))

        ours_p = np.asarray(sel.periods)[np.asarray(sel.valid)]
        ours_a = np.asarray(sel.amplitudes)[:, np.asarray(sel.valid)]
        ctx = dict(trial=trial, L=L, C=C, k=k, pmax=pmax, min_thresh=min_thresh)
        assert list(ours_p) == list(t_periods.numpy()), ctx
        if ours_a.size:
            np.testing.assert_allclose(ours_a, t_amps.numpy(), rtol=1e-4, atol=1e-5,
                                       err_msg=str(ctx))


def test_gradients_match_reference():
    """NB-NLL parameter gradients agree with torch autograd on the same
    transplanted weights — validates the whole backward (incl. the tap-conv
    VJP) end to end."""

    import flax

    cfg, tmodel = _build_pair()
    tmodel.train()  # dropout=0.0, so train mode only affects nothing here
    B = 4
    x, marks, static, ids = _warmup_inputs(cfg, B, seed=5)
    rng = np.random.default_rng(11)
    y = rng.poisson(2.5, size=(B, cfg.pred_len, cfg.c_in)).astype(np.float32)

    xt = torch.from_numpy(x)
    t_rate, t_disp = tmodel(
        xt, x_mark=torch.from_numpy(marks), series_static=torch.from_numpy(static),
        series_ids=torch.from_numpy(ids),
    )
    t_loss = tlosses.negative_binomial_nll(torch.from_numpy(y), t_rate, t_disp)
    t_loss.backward()
    t_grads = {name: p.grad for name, p in tmodel.named_parameters() if p.grad is not None}

    model = TimesNet(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(x), jnp.asarray(marks), jnp.asarray(static), jnp.asarray(ids),
        deterministic=True,
    )
    flat_new = flax.traverse_util.flatten_dict(convert_timesnet_state(tmodel, cfg))
    params = flax.traverse_util.unflatten_dict(
        {k: jnp.asarray(v, jnp.float32) for k, v in flat_new.items()}
    )

    def loss_fn(p):
        rate, disp = model.apply(
            {"params": p},
            jnp.asarray(x), jnp.asarray(marks), jnp.asarray(static), jnp.asarray(ids),
            deterministic=True,
        )
        return jlosses.negative_binomial_nll(jnp.asarray(y), rate, disp)

    loss_val, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert abs(float(loss_val) - float(t_loss)) <= 1e-5

    def t2j_linear(g):  # torch Linear grad [out,in] -> Dense kernel grad [in,out]
        return np.asarray(g).T

    checks = [
        (("mu_head", "kernel"), t2j_linear(t_grads["mu_head.weight"])),
        (("mu_head", "bias"), np.asarray(t_grads["mu_head.bias"])),
        (("sigma_head", "kernel"), t2j_linear(t_grads["sigma_head.weight"])),
        (("forecast_time_proj", "kernel"), t2j_linear(t_grads["forecast_time_proj.weight"])),
        (("embedding", "value_embedding", "kernel"),
         t2j_linear(t_grads["embedding.value_embedding.weight"])),
        (("series_embedding", "embedding"),
         np.asarray(t_grads["series_embedding.weight"])),
        (("layer_norm", "scale"), np.asarray(t_grads["layer_norm.weight"])),
        (("temporal_context", "scale"), np.asarray(t_grads["temporal_context.scale"])),
        (("blocks_0", "inception_in", "proj_kernel"),
         np.transpose(np.asarray(t_grads["blocks.0.inception.0.proj.weight"])[:, :, 0, 0], (1, 0))),
        (("blocks_0", "inception_in", "branch_0", "conv_kernel"),
         np.transpose(np.asarray(t_grads["blocks.0.inception.0.paths.0.branch.1.weight"]),
                      (2, 3, 1, 0))),
    ]
    flat_grads = flax.traverse_util.flatten_dict(grads)
    for path, expected in checks:
        got = np.asarray(flat_grads[path])
        denom = max(1e-6, float(np.abs(expected).max()))
        np.testing.assert_allclose(
            got, expected, rtol=5e-3, atol=5e-4 * denom,
            err_msg=str(path),
        )


def test_training_dynamics_match_reference():
    """Four full AdamW steps (grad clip 1.0, weight decay 1e-6) from
    transplanted weights on identical batches: per-step losses must track the
    reference trajectory — validates optimizer math + clipping end to end."""

    import flax

    from flow_timesnet_tpu.engine import Engine

    cfg, tmodel = _build_pair()
    B = 8
    x, marks, static, ids = _warmup_inputs(cfg, B, seed=2)
    rng = np.random.default_rng(3)
    y = rng.poisson(2.0, size=(B, cfg.pred_len, cfg.c_in)).astype(np.float32)

    # torch side
    with torch.no_grad():  # warm-build
        tmodel(torch.from_numpy(x[:1]), x_mark=torch.from_numpy(marks[:1]),
               series_static=torch.from_numpy(static[:1]),
               series_ids=torch.from_numpy(ids[:1]))
    opt = torch.optim.AdamW(tmodel.parameters(), lr=1e-3, weight_decay=1e-6)
    torch_losses = []
    for _ in range(4):
        opt.zero_grad(set_to_none=True)
        rate, disp = tmodel(
            torch.from_numpy(x), x_mark=torch.from_numpy(marks),
            series_static=torch.from_numpy(static), series_ids=torch.from_numpy(ids),
        )
        loss = tlosses.negative_binomial_nll(torch.from_numpy(y), rate, disp)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tmodel.parameters(), 1.0)
        opt.step()
        torch_losses.append(float(loss))

    # ours, from the SAME initial weights (transplant before any torch step —
    # rebuild the reference to reset)
    cfg2, tmodel2 = _build_pair()
    with torch.no_grad():
        tmodel2(torch.from_numpy(x[:1]), x_mark=torch.from_numpy(marks[:1]),
                series_static=torch.from_numpy(static[:1]),
                series_ids=torch.from_numpy(ids[:1]))
    engine = Engine(cfg2, use_loss_masking=False, grad_clip_norm=1.0,
                    weight_decay=1e-6, num_series=cfg2.id_vocab)
    batch = {
        "x": jnp.asarray(x), "y": jnp.asarray(y),
        "mask": jnp.ones_like(jnp.asarray(y)),
        "x_mark": jnp.asarray(marks), "y_mark": None,
        "static": jnp.asarray(static), "ids": jnp.asarray(ids),
        "row_valid": jnp.ones(B, jnp.float32),
    }
    state = engine.init_state(jax.random.PRNGKey(0), batch)
    flat_new = flax.traverse_util.flatten_dict(convert_timesnet_state(tmodel2, cfg2))
    params = flax.traverse_util.unflatten_dict(
        {k: jnp.asarray(v, jnp.float32) for k, v in flat_new.items()}
    )
    state = state.replace(params=params, opt_state=engine.tx.init(params))
    our_losses = []
    for i in range(4):
        state, loss, _ = engine.train_step(
            state, 1e-3, jax.random.PRNGKey(100 + i), batch, True
        )
        our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses, torch_losses, rtol=2e-4, atol=2e-5)


def test_full_forward_fuzz_random_architectures():
    """Randomized architectures (dims, kernel sets, flags) must all match the
    reference with transplanted weights — catches flag interactions the fixed
    variant matrix misses."""

    import flax

    rng = np.random.default_rng(99)
    for trial in range(6):
        kernel_pool = [(3, 3), (5, 5), (1, 3), (3, 5), (7, 7)]
        n_kernels = int(rng.integers(1, 3))
        kernel_set = tuple(
            kernel_pool[i] for i in rng.choice(len(kernel_pool), n_kernels, replace=False)
        )
        overrides = dict(
            input_len=int(rng.integers(12, 40)),
            pred_len=int(rng.integers(2, 8)),
            d_model=int(rng.integers(2, 5)) * 4,
            d_ff=int(rng.integers(2, 7)) * 4,
            n_layers=int(rng.integers(1, 3)),
            k_periods=int(rng.integers(1, 4)),
            kernel_set=kernel_set,
            bottleneck_ratio=float(rng.choice([1.0, 2.0, 4.0])),
            min_period_threshold=int(rng.integers(1, 5)),
            activation=str(rng.choice(["gelu", "relu"])),
            mode=str(rng.choice(["direct", "recursive"])),
            use_zero_mean_context=bool(rng.integers(0, 2)),
            context_rank=int(rng.integers(1, 5)),
            use_constant_context_bias=bool(rng.integers(0, 2)),
            static_layernorm=bool(rng.integers(0, 2)),
            embed_norm_mode=str(rng.choice(["decoupled", "layer", "rms", "none"])),
            id_embed_dim=int(rng.integers(1, 5)),
            static_proj_dim=int(rng.integers(2, 7)),
            time_features=int(rng.integers(1, 6)),
        )
        cfg, tmodel = _build_pair(seed=trial, **overrides)
        B = 3
        x, marks, static, ids = _warmup_inputs(cfg, B, seed=trial)
        with torch.no_grad():
            t_rate, t_disp = tmodel(
                torch.from_numpy(x), x_mark=torch.from_numpy(marks),
                series_static=torch.from_numpy(static), series_ids=torch.from_numpy(ids),
            )
        model = TimesNet(cfg)
        variables = jax.eval_shape(
            lambda k: model.init(
                {"params": k},
                jnp.asarray(x), jnp.asarray(marks), jnp.asarray(static),
                jnp.asarray(ids), deterministic=True,
            ),
            jax.random.PRNGKey(0),
        )
        flat_init = flax.traverse_util.flatten_dict(variables["params"])
        flat_new = flax.traverse_util.flatten_dict(convert_timesnet_state(tmodel, cfg))
        ctx = dict(trial=trial, **{k: v for k, v in overrides.items() if k != "kernel_set"})
        assert set(flat_init) == set(flat_new), (ctx, set(flat_init) ^ set(flat_new))
        params = flax.traverse_util.unflatten_dict(
            {k: jnp.asarray(v, jnp.float32) for k, v in flat_new.items()}
        )
        rate, disp = jax.jit(
            lambda p, *a: model.apply({"params": p}, *a, deterministic=True)
        )(params, jnp.asarray(x), jnp.asarray(marks), jnp.asarray(static),
          jnp.asarray(ids))
        np.testing.assert_allclose(
            np.asarray(rate), t_rate.numpy(), rtol=2e-4, atol=2e-4, err_msg=str(ctx)
        )
        np.testing.assert_allclose(
            np.asarray(disp), t_disp.numpy(), rtol=2e-4, atol=2e-4, err_msg=str(ctx)
        )
