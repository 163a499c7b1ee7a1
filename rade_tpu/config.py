"""Reference-compatible `.conf` (JSON) configuration with a typed schema.

The public API stays the reference's raw-JSON config contract
(`/root/reference/src/main.py:166-179` and SURVEY.md §2.8) — same keys, same
string-bool convention, same defaults injected post-load — with a typed
dataclass layer on top so the rest of the framework never touches raw dicts.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Union


def str_to_bool(val: Union[str, bool, int]) -> bool:
    """Reference string-bool convention (`src/utils.py:143-150`)."""
    if isinstance(val, bool):
        return val
    if isinstance(val, (int, float)):
        return bool(val)
    v = str(val).lower()
    if v in ("yes", "true", "t", "y", "1"):
        return True
    if v in ("no", "false", "f", "n", "0"):
        return False
    raise ValueError(f"invalid truth value {val!r}")


@dataclasses.dataclass
class OptimConfig:
    optimizer: str = "adam"
    amsgrad: bool = False
    base_lr: float = 1e-4
    wavlm_lr: Optional[float] = None
    lr_min: float = 5e-6
    betas: Sequence[float] = (0.9, 0.999)
    weight_decay: float = 1e-4
    scheduler: str = "cosine"
    scheduler_config: Dict[str, Any] = dataclasses.field(default_factory=dict)
    epochs: int = 100
    steps_per_epoch: int = 0  # filled in by the trainer

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "OptimConfig":
        d = _drop_comments(d)
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        if "amsgrad" in kwargs:
            kwargs["amsgrad"] = str_to_bool(kwargs["amsgrad"])
        return cls(**kwargs)


@dataclasses.dataclass
class TrainingConfig:
    """Phase 4/5/6 training features (`src/config/Phase6_Proposed.conf`)."""

    use_ocsoftmax: bool = False
    ocsoftmax_r_real: float = 0.9
    ocsoftmax_r_fake: float = 0.5
    ocsoftmax_alpha: float = 20.0
    use_supcon: bool = False
    lambda_supcon: float = 0.1
    use_lora: bool = False
    lora_r: int = 8
    lora_alpha: int = 32
    lora_dropout: float = 0.1
    lora_target_modules: Sequence[str] = ("q_proj", "v_proj")
    use_focal_loss: bool = False
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    label_smoothing: float = 0.0
    freeze_bn: bool = False
    freeze_sincnet: bool = False
    use_ema: bool = False
    ema_decay: float = 0.999
    use_swa: bool = True
    accumulation_steps: int = 1
    warmup_ratio: float = 0.0
    warmup_init_factor: float = 0.1
    use_fgm: bool = False
    fgm_epsilon: float = 0.5
    fgm_emb_name: str = "feature_projection"
    # TPU-native extension: compute the SincNet stream once per micro-batch
    # and share its activations across both FGM passes (the perturbation
    # targets `feature_projection`, which the sinc stream never sees) —
    # its parameter gradient is recovered exactly from ONE backward with the
    # two passes' cotangents summed (VJP linearity).  Requires freeze_bn.
    fgm_share_frontend: bool = True
    # TPU-native extension: compute the WavLM CNN feature extractor once per
    # micro-batch and feed BOTH FGM passes.  The extractor sits UPSTREAM of
    # the perturbed `feature_projection` and is deterministic (convs + norms
    # + GELU, no dropout), so its output is bit-identical in the two passes
    # whenever its params are frozen — the step engages sharing only after
    # checking the trainable mask zeroes the whole extractor subtree
    # (which every supported recipe does; the reference always freezes the
    # extractor, `DualStreamSEMamba.py:338-370`).  Recipe-exact under
    # freq_aug too (the sinc filter-band mask never touches the WavLM
    # stream).
    fgm_share_extractor: bool = True
    use_mixup: bool = False
    mixup_alpha: float = 1.0
    eval_diag_interval: int = 0
    grad_clip_norm: float = 3.0
    # TPU-native extension: bf16 compute with f32 master weights/optimizer
    # (replaces the reference's AMP fp16 + GradScaler; bf16 needs no scaler)
    mixed_precision: bool = False
    # TPU-native extension: 'rbg' jax PRNG (hardware RngBitGenerator) for
    # dropout-mask generation — the threefry masks on the (B, 201, 1024)
    # WavLM activations measured ~72 ms/step on v5e.  Keys saved in
    # checkpoints are impl-shaped: resume with the same setting.
    fast_rng: bool = False
    # TPU-native extensions: checkpoint policy.  Defaults reproduce the
    # reference (EER-stamped best file per new-best epoch, periodic
    # full-state saves every 10 epochs).  On a tunneled device (the axon
    # relay moves ~5 MB/s device->host) saves dominate wall-clock; turn
    # best saves off / periodic saves down for throughput experiments.
    save_best_ckpt: bool = True
    checkpoint_interval: int = 10  # periodic full-state saves; 0 disables

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainingConfig":
        d = _drop_comments(d)
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        for key in (
            "use_ocsoftmax", "use_supcon", "use_lora", "use_focal_loss",
            "freeze_bn", "freeze_sincnet", "use_ema", "use_swa", "use_fgm",
            "use_mixup", "mixed_precision", "fgm_share_frontend",
            "fgm_share_extractor", "fast_rng", "save_best_ckpt",
        ):
            if key in kwargs:
                kwargs[key] = str_to_bool(kwargs[key])
        return cls(**kwargs)


@dataclasses.dataclass
class DataConfig:
    rawboost_algo: int = 0
    use_rawboost: bool = False
    rawboost_p: float = 1.0
    use_codec_aug: bool = False
    codec_p: float = 0.5
    custom_train_protocol: Optional[str] = None
    # TPU-native extension: run RawBoost/codec as jnp inside the train step
    # (fused on-device batches) instead of per-sample host numpy/scipy
    on_device_aug: bool = False
    # TPU-native extension: upload the clean train set to HBM once and
    # gather shuffled micro-batches on device — removes ALL per-step
    # host->device batch traffic (on a tunneled device that traffic
    # dominates wall-clock).  `pad_random`'s crop becomes an on-device
    # per-sample circular time shift; utterances longer than nb_samp are
    # cached from ONE random (seeded) crop start per run, so per-epoch
    # re-cropping of long-utterance tails is approximated, not exact.
    # Host-side RawBoost/codec must be off (use on_device_aug).
    # Single-process only.
    device_cache: bool = False
    device_cache_max_gb: float = 4.0
    # TPU-native extension: decode+pad whole micro-batches in the C++ loader
    # thread pool (rade_tpu/native/loader.cpp) instead of per-sample Python —
    # the runtime replacement for the reference's DataLoader worker processes
    # (/root/reference/src/main.py:914-953).  Falls back to the Python path
    # automatically for non-FLAC/WAV synthetic sets or when g++ is absent.
    native_loader: bool = True

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "DataConfig":
        d = _drop_comments(d)
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        for key in (
            "use_rawboost", "use_codec_aug", "on_device_aug", "device_cache",
            "native_loader",
        ):
            if key in kwargs:
                kwargs[key] = str_to_bool(kwargs[key])
        return cls(**kwargs)


@dataclasses.dataclass
class ParallelConfig:
    """TPU-native extension: mesh layout (`parallel_config` in the .conf).

    The reference is single-GPU (SURVEY.md §2.10); here the trainer builds a
    `jax.sharding.Mesh` from this section.  `model_axis` > 1 selects a 2-D
    (data, model) mesh with Megatron-style tensor parallelism of the SSL
    encoder (rade_tpu/parallel/tp.py); `sequence_parallel` adds the
    companion time-axis activation sharding (rade_tpu/parallel/sp.py) and
    implies `wavlm_sequence_parallel` on the model unless the model config
    overrides it.  `pipeline_axis` > 1 adds a `pipe` mesh axis running the
    SSL encoder layer stack as a GPipe microbatch pipeline
    (rade_tpu/parallel/pp.py + nn/wavlm_pp.py); `pipeline_microbatches`
    sets the microbatch count M (0 = the pipe size).  `data_axis` 0
    (default) means "all remaining devices".  `fsdp` turns on ZeRO-style
    fully-sharded data parallelism (rade_tpu/parallel/tp.py::shard_tree):
    every large parameter leaf — and its optimizer/EMA/SWA mirrors — is
    sharded over the `data` axis (GSPMD all-gathers weights at use and
    reduce-scatters gradients), cutting per-chip state memory ~n_data-fold;
    `fsdp_min_size` is the element-count floor below which leaves stay
    replicated (collectives on tiny tensors cost more than they save).
    """

    data_axis: int = 0
    model_axis: int = 1
    sequence_parallel: bool = False
    pipeline_axis: int = 1
    pipeline_microbatches: int = 0
    fsdp: bool = False
    fsdp_min_size: int = 16384

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ParallelConfig":
        d = _drop_comments(d)
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        for k in ("sequence_parallel", "fsdp"):
            if k in kwargs:
                kwargs[k] = str_to_bool(kwargs[k])
        return cls(**kwargs)


@dataclasses.dataclass
class TestConfig:
    batch_size: int = 64
    num_workers: int = 0
    # TPU-build extension: the COMPRESSED evaluation protocol
    # (`/root/reference/README.md:92` second column).  ``codec_sim`` makes
    # `--eval` score the codec-compressed rendition of the eval set
    # (deterministic per-utterance draw, see data/datasets.py::EvalDataset);
    # ``eval_compressed`` makes the trainer's eval_all_best / final-SWA eval
    # additionally score the compressed protocol so runs report BOTH EERs.
    codec_sim: bool = False
    eval_compressed: bool = False
    codec_seed: int = 0
    codec_inner_p: float = 1.0

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TestConfig":
        d = _drop_comments(d)
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        for key in ("codec_sim", "eval_compressed"):
            if key in kwargs:
                kwargs[key] = str_to_bool(kwargs[key])
        return cls(**kwargs)


@dataclasses.dataclass
class ExperimentConfig:
    """Top-level experiment config (one `.conf` file)."""

    database_path: str = "./LA/"
    asv_score_path: str = ""
    model_path: str = ""
    pretrained_weights: Optional[str] = None
    batch_size: int = 24
    num_epochs: int = 100
    loss: str = "CCE"
    track: str = "LA"
    eval_all_best: bool = True
    eval_output: str = "eval_scores_using_best_dev_model.txt"
    freq_aug: bool = False
    is_eval_2021: bool = False
    auto_eval_2021_df: bool = False
    database_path_2021: Optional[str] = None
    key_file_2021: Optional[str] = None
    model_config: Dict[str, Any] = dataclasses.field(default_factory=dict)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    training: TrainingConfig = dataclasses.field(default_factory=TrainingConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)
    test: TestConfig = dataclasses.field(default_factory=TestConfig)
    raw: Dict[str, Any] = dataclasses.field(default_factory=dict, repr=False)

    @property
    def architecture(self) -> str:
        return self.model_config.get("architecture", "")

    @classmethod
    def from_dict(cls, config: Dict[str, Any]) -> "ExperimentConfig":
        config = _drop_comments(config)
        track = config.get("track", "LA")
        if track not in ("LA", "PA", "DF"):
            raise ValueError(f"invalid track {track!r}")

        optim = OptimConfig.from_dict(config.get("optim_config", {}))
        optim.epochs = int(config.get("num_epochs", optim.epochs))
        training = TrainingConfig.from_dict(config.get("training_config", {}))
        # the reference injects Focal when `loss` says so, and vice versa
        if config.get("loss") == "Focal":
            training.use_focal_loss = True
        if config.get("loss") == "OCSoftmax":
            training.use_ocsoftmax = True
        data = DataConfig.from_dict(config.get("data_config", {}))
        if "rawboost_algo" in config.get("data_config", {}):
            data.use_rawboost = data.use_rawboost or data.rawboost_algo != 0
        parallel = ParallelConfig.from_dict(config.get("parallel_config", {}))
        test = TestConfig.from_dict(config.get("test_config", {}))

        known = {f.name for f in dataclasses.fields(cls)}
        top = {
            k: v
            for k, v in config.items()
            if k in known
            and k not in ("optim", "training", "data", "parallel", "test", "raw")
        }
        for key in ("eval_all_best", "freq_aug", "is_eval_2021", "auto_eval_2021_df"):
            if key in top:
                top[key] = str_to_bool(top[key])
        # reference default: eval_all_best=True, freq_aug=False when absent
        top.setdefault("eval_all_best", True)
        top.setdefault("freq_aug", False)
        return cls(
            optim=optim, training=training, data=data, parallel=parallel,
            test=test, raw=config, **top,
        )

    @classmethod
    def load(cls, path: Union[str, Path]) -> "ExperimentConfig":
        with open(path) as f:
            return cls.from_dict(json.loads(f.read()))

    def model_tag(self, config_path: Union[str, Path], comment: str = "") -> str:
        """Reference experiment-dir naming (`src/main.py:210-216`)."""
        stem = Path(config_path).stem
        tag = f"{self.track}_{stem}_ep{self.num_epochs}_bs{self.batch_size}"
        if comment:
            tag += f"_{comment}"
        return tag


def _drop_comments(d: Dict[str, Any]) -> Dict[str, Any]:
    return {k: v for k, v in d.items() if not k.startswith("_comment")}


def load_config(path: Union[str, Path]) -> ExperimentConfig:
    return ExperimentConfig.load(path)
