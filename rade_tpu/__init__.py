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

# Persistent XLA compilation cache: WavLM-Large training graphs take minutes
# to compile; caching them makes repeat runs (benchmarks, resumed training,
# eval after training) start in seconds.  Disable with RADE_COMPILE_CACHE=0.
# TPU-only, and FAIL CLOSED: CPU AOT cache entries embed host machine
# features and can SIGILL when loaded on a different host (~/.cache is often
# NFS-shared), so the cache is enabled only when the environment EXPLICITLY
# names a TPU backend — never by default.
_plat = (
    _os.environ.get("RADE_PLATFORM") or _os.environ.get("JAX_PLATFORMS") or ""
).lower()
if (
    _os.environ.get("RADE_COMPILE_CACHE", "1") != "0"
    and _plat in ("tpu", "axon")
):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "RADE_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "rade_tpu_xla"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # older jax without these flags
        pass
