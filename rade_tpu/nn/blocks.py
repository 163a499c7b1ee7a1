"""2-D residual conv blocks shared by AASIST / RawGAT-ST / SincNetEncoder.

Port of the reference `Residual_block` (`/root/reference/models/AASIST.py:413-466`)
in TPU-native NHWC layout.  Note: the reference computes a bn1+SELU
pre-activation but then calls ``conv1(x)`` on the raw input, discarding it
(`AASIST.py:449-453`) — the trained network has no first pre-activation, and
we implement exactly that effective computation (no dead bn1 params).
"""

from __future__ import annotations

import jax
from flax import linen as nn


class ResBlock2D(nn.Module):
    """conv(2,3) -> BN -> SELU -> conv(2,3) -> (+identity/1x3-proj) -> maxpool(1,3).

    Input/output ``(B, H, W, C)`` (H = spectral bins, W = time frames).
    conv1 pads H by (1,1) giving H+1; conv2 pads (0,0) giving H back.
    """

    in_ch: int
    out_ch: int
    first: bool = False  # config parity only; see module docstring
    # the Fake-Mamba zoo's vendored Residual_block ships with the pool
    # commented out (`fake_mamba_model.py:2278`); XLSR_AASIST relies on that
    pool: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, freeze_bn: bool = False) -> jax.Array:
        identity = x
        out = nn.Conv(self.out_ch, (2, 3), padding=((1, 1), (1, 1)), name="conv1")(x)
        out = nn.BatchNorm(use_running_average=(not train) or freeze_bn, name="bn2")(out)
        out = jax.nn.selu(out)
        out = nn.Conv(self.out_ch, (2, 3), padding=((0, 0), (1, 1)), name="conv2")(out)
        if self.in_ch != self.out_ch:
            identity = nn.Conv(
                self.out_ch, (1, 3), padding=((0, 0), (1, 1)), name="conv_downsample"
            )(identity)
        out = out + identity
        if not self.pool:
            return out
        return nn.max_pool(out, window_shape=(1, 3), strides=(1, 3))
