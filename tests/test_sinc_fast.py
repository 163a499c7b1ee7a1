"""`sinc_encoder_fast` (packed Pallas chain) vs the SincNetEncoder module."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from rade_tpu.models.dual_stream_se_mamba import SincNetEncoder, sinc_encoder_fast
import pytest

pytestmark = pytest.mark.slow  # jit-compiles model forwards on the CPU mesh


def test_fast_path_matches_module():
    enc = SincNetEncoder(sinc_channels=16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6000).astype(np.float32) * 0.1)
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "freq_aug": jax.random.PRNGKey(1)},
        x, False, False, False,
    )
    want = enc.apply(variables, x, False, False, False)
    with pltpu.force_tpu_interpret_mode():
        got = sinc_encoder_fast(
            variables["params"], variables["batch_stats"], x, sinc_channels=16
        )
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
