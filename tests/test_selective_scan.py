"""Selective-scan kernel tests: spec vs associative vs Pallas (interpret mode),
plus an independent torch oracle of the recurrence."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from rade_tpu.kernels.selective_scan import (
    selective_scan,
    selective_scan_pallas,
    selective_scan_ref,
)

pytestmark = pytest.mark.slow  # jit-compiles model forwards on the CPU mesh


def _rand_inputs(bsz=2, L=37, D=24, N=8, seed=0):
    rng = np.random.RandomState(seed)
    u = rng.randn(bsz, L, D).astype(np.float32)
    dt = np.abs(rng.randn(bsz, L, D)).astype(np.float32) * 0.1
    A = -np.abs(rng.randn(D, N)).astype(np.float32)
    Bm = rng.randn(bsz, L, N).astype(np.float32)
    Cm = rng.randn(bsz, L, N).astype(np.float32)
    Dp = rng.randn(D).astype(np.float32)
    return u, dt, A, Bm, Cm, Dp


def _torch_oracle(u, dt, A, Bm, Cm, Dp):
    """Independent sequential implementation of h_t = e^{dtA} h + dtB u."""
    u_t, dt_t = torch.tensor(u), torch.tensor(dt)
    A_t, B_t, C_t = torch.tensor(A), torch.tensor(Bm), torch.tensor(Cm)
    bsz, L, D = u.shape
    N = A.shape[1]
    h = torch.zeros(bsz, D, N)
    ys = []
    for i in range(L):
        a_bar = torch.exp(A_t[None] * dt_t[:, i, :, None])  # (B, D, N)
        b_bar = B_t[:, i, None, :] * dt_t[:, i, :, None]  # (B, D, N)
        h = a_bar * h + b_bar * u_t[:, i, :, None]
        ys.append(torch.sum(h * C_t[:, i, None, :], dim=-1))
    y = torch.stack(ys, dim=1) + u_t * torch.tensor(Dp)
    return y.numpy()


def test_ref_matches_torch_oracle():
    inputs = _rand_inputs()
    ours = np.asarray(selective_scan_ref(*map(jnp.asarray, inputs)))
    oracle = _torch_oracle(*inputs)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-5)


def test_associative_matches_ref():
    inputs = _rand_inputs(seed=1)
    args = list(map(jnp.asarray, inputs))
    y_ref = np.asarray(selective_scan_ref(*args))
    y_assoc = np.asarray(selective_scan(*args))
    np.testing.assert_allclose(y_assoc, y_ref, rtol=1e-4, atol=1e-5)


def test_pallas_interpret_matches_ref():
    inputs = _rand_inputs(bsz=2, L=50, D=16, N=8, seed=2)
    args = list(map(jnp.asarray, inputs))
    y_ref = np.asarray(selective_scan_ref(*args))
    with pltpu.force_tpu_interpret_mode():
        y_pal = np.asarray(selective_scan_pallas(*args, 16))  # chunked: 50 -> 4 chunks
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-4, atol=1e-5)


def test_pallas_chunk_boundary_carry():
    # L exactly at a chunk boundary and L < chunk both work
    for L, chunk in [(32, 16), (10, 16), (16, 16)]:
        inputs = _rand_inputs(bsz=1, L=L, D=8, N=4, seed=L)
        args = list(map(jnp.asarray, inputs))
        y_ref = np.asarray(selective_scan_ref(*args))
        with pltpu.force_tpu_interpret_mode():
            y_pal = np.asarray(selective_scan_pallas(*args, chunk))
        np.testing.assert_allclose(y_pal, y_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "bsz,L,D,N,chunk",
    [
        (2, 37, 24, 8, 16),   # padding in L, D, N; multiple chunks
        (1, 32, 16, 4, 16),   # exact chunk boundary
        (2, 10, 8, 4, 16),    # single partial chunk
        (1, 48, 8, 4, 8),     # many chunks
    ],
)
def test_pallas_backward_matches_associative_grads(bsz, L, D, N, chunk):
    """The native Pallas backward kernel vs jax.grad of the associative scan."""
    inputs = _rand_inputs(bsz=bsz, L=L, D=D, N=N, seed=L + D)
    args = list(map(jnp.asarray, inputs))
    w = jnp.asarray(
        np.random.RandomState(7).randn(bsz, L, D).astype(np.float32)
    )

    def loss_assoc(*a):
        return jnp.sum(selective_scan(*a) * w)

    def loss_pallas(*a):
        return jnp.sum(selective_scan_pallas(*a, chunk) * w)

    g_ref = jax.grad(loss_assoc, argnums=(0, 1, 2, 3, 4, 5))(*args)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for name, gr, gp in zip("u dt A B C D".split(), g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=1e-4, atol=1e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_pallas_backward_bf16_io():
    inputs = _rand_inputs(bsz=1, L=20, D=8, N=4, seed=9)
    args = list(map(jnp.asarray, inputs))
    args16 = [args[0].astype(jnp.bfloat16), args[1].astype(jnp.bfloat16)] + args[2:]

    def loss(*a):
        return jnp.sum(selective_scan_pallas(*a, 16).astype(jnp.float32) ** 2)

    with pltpu.force_tpu_interpret_mode():
        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(*args16)
    assert grads[0].dtype == jnp.bfloat16 and grads[1].dtype == jnp.bfloat16
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g, dtype=np.float32)))


def test_associative_grad_finite():
    inputs = _rand_inputs(bsz=1, L=16, D=8, N=4, seed=3)
    args = list(map(jnp.asarray, inputs))

    def loss(u, dt, A, Bm, Cm, Dp):
        return jnp.sum(selective_scan(u, dt, A, Bm, Cm, Dp) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


def test_bf16_io_fp32_state():
    inputs = _rand_inputs(bsz=1, L=20, D=8, N=4, seed=4)
    args32 = list(map(jnp.asarray, inputs))
    y32 = np.asarray(selective_scan(*args32))
    args16 = [a.astype(jnp.bfloat16) for a in args32[:2]] + args32[2:3] + [
        a.astype(jnp.bfloat16) for a in args32[3:5]
    ] + args32[5:]
    y16 = np.asarray(selective_scan(*args16)).astype(np.float32)
    assert y16.dtype == np.float32
    np.testing.assert_allclose(y16, y32, rtol=0.05, atol=0.05)


def test_mamba_mixer_and_bimamba_shapes():
    from rade_tpu.nn.mamba import MambaMixer, PNBiMambaEncoder

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 24, 16))
    mixer = MambaMixer(d_model=16, d_state=4)
    v = mixer.init(rng, x)
    y = mixer.apply(v, x)
    assert y.shape == x.shape
    enc = PNBiMambaEncoder(d_model=16, d_state=4)
    v2 = enc.init(rng, x)
    y2 = enc.apply(v2, x)
    assert y2.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y2)))


def test_bimamba_is_time_symmetric():
    """Shared fwd/bwd mixer => flipping input flips output (palindrome property)."""
    from rade_tpu.nn.mamba import PNBiMambaEncoder

    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (1, 12, 8))
    enc = PNBiMambaEncoder(d_model=8, d_state=4)
    v = enc.init(rng, x)
    y = enc.apply(v, x)
    y_flip = enc.apply(v, jnp.flip(x, axis=1))
    np.testing.assert_allclose(
        np.asarray(jnp.flip(y, axis=1)), np.asarray(y_flip), rtol=1e-4, atol=1e-5
    )
