"""rade_tpu — TPU-native audio anti-spoofing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`lux-liang/Robust-Audio-Deepfake-Evolution`: raw-waveform frontends (SincConv,
WavLM), bidirectional-Mamba backends with a Pallas selective-scan kernel, the
AASIST / RawNet2 / RawGAT-ST baseline zoo, RawBoost + codec augmentation, the
Phase-6 training recipe (LoRA, FGM, mixup, focal, EMA/SWA) fused into one
jit-compiled train step over a data-parallel TPU mesh, and ASVspoof 2019/2021
EER + t-DCF scoring.
"""

__version__ = "0.1.0"

# Platform override: RADE_PLATFORM=cpu forces the CPU backend even when the
# environment pins JAX_PLATFORMS elsewhere (this image's sitecustomize pins
# the axon TPU relay, which CLI subprocesses can't always reach).
import os as _os

if _os.environ.get("RADE_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["RADE_PLATFORM"])
