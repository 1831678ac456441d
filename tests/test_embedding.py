"""DataEmbedding / norm / positional / LRTC unit behaviours.

Mirrors the reference ``tests/test_data_embedding.py`` (norm modes preserve
temporal variance) plus LRTC basis properties.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flow_timesnet_tpu.models.embedding import (
    DataEmbedding,
    LayerNorm32,
    RMSNorm,
    lrtc_basis,
    positional_encoding,
    resolve_embed_norm_mode,
)


def _run_embedding(mode, x, marks=None, time_features=0):
    model = DataEmbedding(
        c_in=x.shape[-1], d_model=16, dropout=0.0,
        time_features=time_features, embed_norm_mode=mode,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(marks) if marks is not None else None)
    return np.asarray(
        model.apply(variables, jnp.asarray(x),
                    jnp.asarray(marks) if marks is not None else None)
    )


@pytest.mark.parametrize("mode", ["none", "layer", "rms", "decoupled"])
def test_embedding_modes_preserve_temporal_variance(mode):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 24, 3)).astype(np.float32)
    out = _run_embedding(mode, x)
    assert out.shape == (2, 24, 16)
    # the embedding must not collapse the time axis
    assert float(out.var(axis=1).mean()) > 1e-4


def test_embedding_rejects_bad_mode_and_4d():
    x = np.zeros((2, 8, 1), np.float32)
    with pytest.raises(ValueError, match="embed_norm_mode"):
        _run_embedding("bogus", x)
    model = DataEmbedding(c_in=1, d_model=4, dropout=0.0)
    with pytest.raises(ValueError, match="B, L, C"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 3, 4)))


def test_temporal_marks_change_output():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 12, 1)).astype(np.float32)
    marks = rng.standard_normal((2, 12, 5)).astype(np.float32)
    model = DataEmbedding(c_in=1, d_model=8, dropout=0.0, time_features=5)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(marks))
    with_marks = model.apply(variables, jnp.asarray(x), jnp.asarray(marks))
    zero_marks = model.apply(variables, jnp.asarray(x), jnp.zeros_like(jnp.asarray(marks)))
    assert not np.allclose(np.asarray(with_marks), np.asarray(zero_marks))


def test_positional_encoding_structure():
    pe = np.asarray(positional_encoding(16, 8))
    assert pe.shape == (16, 8)
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-7)  # cos(0)
    # odd d_model truncates the cos term
    pe_odd = np.asarray(positional_encoding(10, 7))
    assert pe_odd.shape == (10, 7)


def test_norms_float32_islands():
    x16 = jnp.ones((2, 4, 8), jnp.bfloat16)
    ln = LayerNorm32(8)
    v = ln.init(jax.random.PRNGKey(0), x16)
    out = ln.apply(v, x16)
    assert out.dtype == jnp.bfloat16
    rn = RMSNorm(8)
    v2 = rn.init(jax.random.PRNGKey(0), x16)
    assert rn.apply(v2, x16).dtype == jnp.bfloat16


def test_lrtc_basis_zero_mean_unit_norm():
    basis = np.asarray(lrtc_basis(24, 5))
    np.testing.assert_allclose(basis.mean(axis=0), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(basis, axis=0), 1.0, atol=1e-5)


def test_resolve_embed_norm_mode_precedence():
    assert resolve_embed_norm_mode(True, None) == "decoupled"
    assert resolve_embed_norm_mode(False, None) == "none"
    assert resolve_embed_norm_mode(False, "rms") == "rms"
    with pytest.raises(ValueError):
        resolve_embed_norm_mode(True, "bogus")
