"""Dense fused gated-attention kernel (kernels/gated_attention.py).

Parity strategy mirrors the other kernel suites: the Mosaic kernels run in
interpret mode on CPU against the unfused einsum reference, forward AND all
five cotangents (dq, dk, dv, dgate, dbias).  Dropout parity injects an
explicit keep-mask through the SAME kernel bodies (``keep_mask=``) because
`pltpu.prng_*` has no CPU lowering; the PRNG path itself (mask determinism,
keep-rate, fwd/bwd mask identity) is verified on real TPU by
benchmarks/check_gated_attention.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rade_tpu.kernels import gated_attention as ga


@pytest.fixture(autouse=True)
def _interpret():
    old = ga.INTERPRET
    ga.INTERPRET = True
    yield
    ga.INTERPRET = old


def _inputs(B=2, H=3, L=50, hd=16, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, L, hd).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(B, H, L, hd).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, H, L, hd).astype(np.float32) * 0.5)
    # positive gates like WavLM's a*(b*c-1)+2 form
    gate = jnp.asarray(rng.uniform(1.0, 4.0, (B, H, L, 1)).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, L, L).astype(np.float32) * 0.5)
    return q, k, v, gate, bias


def test_forward_matches_reference_no_dropout():
    q, k, v, gate, bias = _inputs()
    out = ga.gated_attention(q, k, v, gate, bias, seed=0)
    ref = ga.reference_gated_attention(q, k, v, gate, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_L_is_tile_multiple():
    # no padding branch: L = 128 exactly
    q, k, v, gate, bias = _inputs(L=128)
    out = ga.gated_attention(q, k, v, gate, bias, seed=0)
    ref = ga.reference_gated_attention(q, k, v, gate, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_grads_match_reference_no_dropout():
    q, k, v, gate, bias = _inputs()
    probe = jnp.asarray(
        np.random.RandomState(9).randn(*q.shape).astype(np.float32)
    )

    def loss_k(q, k, v, gate, bias):
        return jnp.sum(ga.gated_attention(q, k, v, gate, bias, seed=0) * probe)

    def loss_r(q, k, v, gate, bias):
        return jnp.sum(
            ga.reference_gated_attention(q, k, v, gate, bias) * probe
        )

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(q, k, v, gate, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(q, k, v, gate, bias)
    for a, b, name in zip(gk, gr, ["dq", "dk", "dv", "dgate", "dbias"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, err_msg=name
        )


def test_dropout_matches_reference_with_injected_mask():
    q, k, v, gate, bias = _inputs(B=2, H=2, L=40)
    p = 0.35
    mask = jnp.asarray(
        np.random.RandomState(5).rand(2, 2, 40, 40) > p
    )
    out = ga.gated_attention(q, k, v, gate, bias, seed=0, dropout_p=p,
                             train=True, keep_mask=mask)
    ref = ga.reference_gated_attention(
        q, k, v, gate, bias, dropout_p=p, keep_mask=mask
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_dropout_grads_match_reference_with_injected_mask():
    q, k, v, gate, bias = _inputs(B=2, H=2, L=40)
    p = 0.25
    mask = jnp.asarray(
        np.random.RandomState(6).rand(2, 2, 40, 40) > p
    )
    probe = jnp.asarray(
        np.random.RandomState(3).randn(*q.shape).astype(np.float32)
    )

    def loss_k(q, k, v, gate, bias):
        return jnp.sum(
            ga.gated_attention(
                q, k, v, gate, bias, seed=0, dropout_p=p, train=True,
                keep_mask=mask,
            ) * probe
        )

    def loss_r(q, k, v, gate, bias):
        return jnp.sum(
            ga.reference_gated_attention(
                q, k, v, gate, bias, dropout_p=p, keep_mask=mask
            ) * probe
        )

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(q, k, v, gate, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(q, k, v, gate, bias)
    for a, b, name in zip(gk, gr, ["dq", "dk", "dv", "dgate", "dbias"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, err_msg=name
        )


def test_bf16_inputs_close_to_f32_reference():
    q, k, v, gate, bias = _inputs(B=1, H=2, L=33)
    outs = ga.gated_attention(
        *(t.astype(jnp.bfloat16) for t in (q, k, v, gate)),
        bias.astype(jnp.bfloat16), seed=0,
    )
    ref = ga.reference_gated_attention(q, k, v, gate, bias)
    assert outs.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(outs, np.float32), np.asarray(ref), atol=0.03
    )


def test_bf16_grads_match_bf16_reference():
    """bf16 fwd + all five cotangents vs the unfused bf16 reference.

    The kernel's bf16 cast points (p.astype(v.dtype) in the forward, the
    dsl/dpad casts in the backward) previously had no CPU coverage — the
    f32 suite never exercised them and only the TPU-side check script did
    (round-4 advisor).  Run both implementations on bf16 inputs and compare
    at bf16-appropriate tolerances.
    """
    q, k, v, gate, bias = _inputs(B=2, H=2, L=40)
    qb, kb, vb, gb, bb = (
        t.astype(jnp.bfloat16) for t in (q, k, v, gate, bias)
    )
    probe = jnp.asarray(
        np.random.RandomState(9).randn(*q.shape).astype(np.float32)
    ).astype(jnp.bfloat16)

    def loss_k(q, k, v, gate, bias):
        out = ga.gated_attention(q, k, v, gate, bias, seed=0)
        return jnp.sum(out.astype(jnp.float32) * probe.astype(jnp.float32))

    def loss_r(q, k, v, gate, bias):
        out = ga.reference_gated_attention(q, k, v, gate, bias)
        return jnp.sum(out.astype(jnp.float32) * probe.astype(jnp.float32))

    outk = ga.gated_attention(qb, kb, vb, gb, bb, seed=0)
    outr = ga.reference_gated_attention(qb, kb, vb, gb, bb)
    assert outk.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(outk, np.float32), np.asarray(outr, np.float32), atol=0.05
    )
    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(qb, kb, vb, gb, bb)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(qb, kb, vb, gb, bb)
    for a, b, name in zip(gk, gr, ["dq", "dk", "dv", "dgate", "dbias"]):
        assert a.dtype == b.dtype == jnp.bfloat16, name
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        # bf16 rounding differs between the fused and unfused orderings;
        # compare at a scale-aware tolerance
        tol = 0.05 * max(1.0, float(np.abs(b32).max()))
        np.testing.assert_allclose(a32, b32, atol=tol, err_msg=name)


def test_eval_train_false_ignores_dropout_p():
    q, k, v, gate, bias = _inputs()
    a = ga.gated_attention(q, k, v, gate, bias, seed=5, dropout_p=0.4,
                           train=False)
    b = ga.reference_gated_attention(q, k, v, gate, bias)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_wavlm_module_fused_flag_falls_back_off_tpu():
    """Off-TPU the module keeps the unfused einsum: outputs identical, so
    CPU-mesh dryruns with the flag on are safe."""
    from rade_tpu.nn.wavlm import WavLMConfig, WavLMAttention

    cfg = WavLMConfig.tiny()
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 30, cfg.hidden_size)
        .astype(np.float32)
    )
    mod = WavLMAttention(cfg, has_relative_position_bias=True)
    variables = mod.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, None, train=False,
    )
    out_ref, _ = mod.apply(variables, x, None, train=False)

    cfg_f = WavLMConfig.tiny(fused_gated_attention=True)
    mod_f = WavLMAttention(cfg_f, has_relative_position_bias=True)
    out_fb, _ = mod_f.apply(variables, x, None, train=False)
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_fb), atol=1e-6
    )
