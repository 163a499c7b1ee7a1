"""Experiment orchestration: build -> train -> score -> checkpoint.

The TPU-native counterpart of the reference `main()` epoch loop
(`/root/reference/src/main.py:161-796`): per epoch {train epoch -> dev scoring
-> t-DCF/EER -> best-model selection on dev EER -> SWA snapshot}, periodic
checkpoints keep-last-3, optional eval-all-best, final SWA swap + eval, and
metric logging.  Data parallelism: batches sharded over the mesh's 'data'
axis, parameters replicated, one jit'd step.
"""

from __future__ import annotations

import json
import math
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rade_tpu.config import ExperimentConfig
from rade_tpu.data.datasets import EvalDataset, TrainDataset
from rade_tpu.data.pipeline import EvalBatcher, TrainBatcher, prefetch
from rade_tpu.data.protocols import parse_protocol_eval, parse_protocol_labeled
from rade_tpu.evaluate.scoring import calculate_tdcf_eer
from rade_tpu.evaluate.scorer import produce_evaluation_file
from rade_tpu.losses import ocsoftmax_init
from rade_tpu.parallel.mesh import DATA_AXIS, make_mesh
from rade_tpu.registry import build_model
from rade_tpu.train.checkpoint import CheckpointManager, save_state
from rade_tpu.train.optim import make_lr_schedule, make_optimizer, make_trainable_mask
from rade_tpu.train.state import TrainState
from rade_tpu.train.step import make_eval_step, make_train_step


@jax.jit
def _jit_swa_snapshot(state: TrainState) -> TrainState:
    return state.swa_snapshot()


from rade_tpu.train.checkpoint import bridge_wavlm_layout as _bridge_wavlm_layout


def _unmatched_subtrees(template, merged):
    """Top-level keys whose every leaf kept its init after a non-strict merge
    (merge_matching returns the template objects themselves when unmatched,
    so leaf identity is the signal)."""
    out = []
    for k, tv in template.items():
        t_leaves = jax.tree.leaves(tv)
        m_leaves = jax.tree.leaves(merged.get(k))
        if t_leaves and (
            len(t_leaves) != len(m_leaves)
            or all(a is b for a, b in zip(m_leaves, t_leaves))
        ):
            out.append(k)
    return out


def _ocsoftmax_feat_dim(cfg: ExperimentConfig) -> int:
    arch = cfg.architecture
    if any(k in arch for k in ("WavLMMamba", "MoEMambaASV", "DualStreamSEMamba")):
        return int(cfg.model_config.get("emb_size", 144))
    if "CascadeMamba" in arch:
        return 128
    return 160  # AASIST-style last_hidden width (reference default)


class Experiment:
    """Builds the model/state/steps for a config; drives training and eval."""

    @staticmethod
    def _mesh_from_config(cfg: ExperimentConfig):
        """Mesh from `parallel_config`: 1-D data mesh by default; 2-D
        (data, model) when model_axis > 1 (tensor/sequence parallelism);
        3-D (data, pipe, model) when pipeline_axis > 1."""
        n_model = int(getattr(cfg.parallel, "model_axis", 1))
        n_pipe = int(getattr(cfg.parallel, "pipeline_axis", 1))
        n_devs = len(jax.devices())
        if n_pipe > 1:
            from rade_tpu.parallel.pp import make_mesh_pp

            n_data = int(cfg.parallel.data_axis) or n_devs // (n_pipe * n_model)
            return make_mesh_pp(n_data, n_pipe, n_model)
        if n_model > 1:
            from rade_tpu.parallel.tp import make_mesh_2d

            n_data = int(cfg.parallel.data_axis) or n_devs // n_model
            if n_data * n_model > n_devs:
                raise ValueError(
                    f"parallel_config needs {n_data}x{n_model} devices, "
                    f"have {n_devs}"
                )
            return make_mesh_2d(n_data, n_model)
        n_data = int(getattr(cfg.parallel, "data_axis", 0)) or None
        return make_mesh(n_data)

    def __init__(
        self,
        cfg: ExperimentConfig,
        seed: int = 1234,
        mesh=None,
        fast_init: bool = False,
        init_variables=None,
    ):
        self.cfg = cfg
        self.seed = seed
        self.fast_init = bool(fast_init)
        # pre-built model variables ({'params':..,'batch_stats':..}) skip
        # init entirely — benchmarks reuse the entry()-materialized tree
        self._init_variables_override = init_variables
        self.mesh = mesh if mesh is not None else self._mesh_from_config(cfg)
        # register the mesh for sequence-parallel activation constraints
        # (no-op for modules without sequence_parallel; deactivates when the
        # mesh has no model axis so later single-device runs stay unsharded)
        from rade_tpu.parallel import pp as _pp
        from rade_tpu.parallel import sp as _sp

        _sp.activate(self.mesh)
        # register for pipeline parallelism of the SSL encoder stack; the
        # WavLM params convert to the stacked pp layout at the end of init.
        # pipeline_axis > 1 on a pipe-less mesh (e.g. a 1-chip debug run of
        # a pipeline config) keeps the pp layout and runs the bit-identical
        # sequential fallback
        _pp.activate(self.mesh)
        self._use_pp = _pp.pipe_axis_size(self.mesh) > 1 or (
            int(getattr(cfg.parallel, "pipeline_axis", 1)) > 1
        )
        model_config = dict(cfg.model_config)
        if cfg.parallel.sequence_parallel:
            model_config.setdefault("wavlm_sequence_parallel", True)
        # the reference injects LoRA post-hoc (apply_lora_to_wavlm,
        # src/main.py:103-158); here LoRA params are part of the module
        if cfg.training.use_lora and "lora_r" not in model_config:
            model_config["lora_r"] = cfg.training.lora_r
            model_config["lora_alpha"] = cfg.training.lora_alpha
        # the Pallas scan's native backward (kernels/selective_scan.py)
        # measures 7.6 ms fwd+bwd per fused BiMamba call at the Phase-6
        # shapes (32, 201, 288, 16) vs 29.4 ms for associative-scan autodiff
        # — and keeps the (B, L, N, D) state in VMEM instead of HBM, which
        # also shrinks the training footprint.  Default: train AND score on
        # the Pallas kernel; `use_pallas_scan_training: false` opts training
        # back onto the differentiable associative scan (CPU meshes, debug).
        if model_config.get("use_pallas_scan") and not model_config.get(
            "use_pallas_scan_training", True
        ):
            self.model = build_model({**model_config, "use_pallas_scan": False})
            self.eval_model = build_model(model_config)
        else:
            self.model = build_model(model_config)
            self.eval_model = self.model
        self.nb_samp = int(cfg.model_config.get("nb_samp", 64600))
        # hardware RngBitGenerator for dropout masks (see TrainingConfig).
        # The impl must be the process default (raw keys carry no impl
        # metadata through the jit'd step's splits), so set it BOTH ways:
        # a fast_rng=false Experiment built after a fast_rng=true one must
        # not silently inherit rbg (its checkpoints would be unrestorable
        # in a fresh threefry process).
        jax.config.update(
            "jax_default_prng_impl",
            "rbg" if cfg.training.fast_rng else "threefry2x32",
        )
        self.rng = jax.random.PRNGKey(seed)

        # --- init params ---
        init_rngs = {
            "params": self.rng,
            "dropout": jax.random.fold_in(self.rng, 1),
            "freq_aug": jax.random.fold_in(self.rng, 2),
        }
        dummy = jnp.zeros((2, self.nb_samp), jnp.float32)
        variables = self._init_variables(model_config, init_rngs, dummy)
        model_params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        loss_params: Dict[str, Any] = {}
        if cfg.training.use_ocsoftmax:
            loss_params = ocsoftmax_init(
                jax.random.fold_in(self.rng, 3), _ocsoftmax_feat_dim(cfg)
            )
        self.params = {"model": model_params, "loss": loss_params}
        self.batch_stats = batch_stats

        frozen = ()
        stacked_freeze: Dict[str, Any] = {}
        if cfg.training.freeze_sincnet:
            frozen = frozen + ("sinc_stream",)
        if "wavlm_stream" in model_params:
            from rade_tpu.nn.wavlm import wavlm_frozen_paths

            n_freeze = int(cfg.model_config.get("wavlm_freeze_layers", 18))
            stacked = (
                cfg.model_config.get("wavlm_scan_layers") or self._use_pp
            ) and n_freeze > 0 and not cfg.training.use_lora
            if stacked:
                # Stacked layouts (scan / pipeline) hold layers as one leaf
                # with a leading layer axis; bottom-N freezing becomes a
                # per-layer 0/1 lane on that axis (`make_trainable_mask`'s
                # stacked_layer_freeze) — the Phase-4 recipe trains under
                # scan/pp layouts with the same semantics as unrolled.
                n_layers = int(self.model.wavlm_cfg.num_hidden_layers)
                frozen = frozen + wavlm_frozen_paths(
                    -1, use_lora=False
                )  # extractor + projection always frozen
                if self._use_pp:
                    # pp layout: all N layers stacked under layers_pipe;
                    # layer 0's rel_attn_embed is hoisted to the model top
                    vec = (np.arange(n_layers) >= n_freeze).astype(np.float32)
                    stacked_freeze["layers_pipe"] = vec
                    if n_freeze >= 1:
                        frozen = frozen + ("rel_attn_embed",)
                else:
                    # scan layout: layer 0 unrolled + layers 1..N-1 stacked
                    vec = (
                        np.arange(1, n_layers) >= n_freeze
                    ).astype(np.float32)
                    stacked_freeze["layers_scan"] = vec
                    if n_freeze >= 1:
                        frozen = frozen + ("layers_0/",)
            else:
                frozen = frozen + wavlm_frozen_paths(
                    n_freeze, use_lora=cfg.training.use_lora,
                )
        always = ["lora_", "layer_weights"]
        if cfg.training.use_fgm and cfg.training.fgm_emb_name:
            # FGM targets are explicitly unfrozen (reference main.py:516-544)
            always.append(cfg.training.fgm_emb_name)
        self._freeze_spec = (frozen, tuple(always), stacked_freeze)
        self.trainable_mask = (
            make_trainable_mask(
                self.params, frozen, tuple(always),
                stacked_layer_freeze=stacked_freeze or None,
            )
            if (frozen or stacked_freeze)
            else None
        )

        self.eval_step = jax.jit(make_eval_step(self.eval_model, cfg))
        self._batch_sharding = NamedSharding(self.mesh, P(None, DATA_AXIS))
        # scoring runs on a host-LOCAL mesh: in multi-host runs each process
        # scores the full split redundantly (params are replicated, so the
        # local copy is addressable) — avoids cross-host gathers of scores
        self._eval_mesh = (
            make_mesh(devices=jax.local_devices())
            if jax.process_count() > 1 else self.mesh
        )
        self._eval_sharding = NamedSharding(self._eval_mesh, P(DATA_AXIS))

        self.state: Optional[TrainState] = None
        self.tx = None
        self.train_step = None
        self._device_cache = None
        self._cached_step = None

        self._load_ssl_pretrained(model_config)
        if cfg.pretrained_weights and Path(cfg.pretrained_weights).exists():
            self.load_weights(cfg.pretrained_weights, strict=False)

        if self._use_pp:
            # convert the WavLM stream to the stacked pp layout LAST, so the
            # SSL-pretrained splice and warm-start above see the layout they
            # expect (unrolled); checkpoints of this run save/restore in pp
            # layout (converters: nn/wavlm_pp.py)
            if "DualStreamSEMamba" not in cfg.architecture:
                raise ValueError(
                    "pipeline_axis > 1 is implemented for the "
                    "DualStreamSEMamba flagship (WavLM stream); got "
                    f"{cfg.architecture}"
                )
            if model_config.get("wavlm_scan_layers"):
                raise ValueError(
                    "wavlm_scan_layers and pipeline_axis > 1 are exclusive: "
                    "the pipeline already scans the stacked layers per stage"
                )
            if model_config.get("wavlm_weighting", "softmax") != "softmax":
                raise ValueError(
                    "pipeline parallelism supports the softmax layer "
                    "weighting (the flagship recipe)"
                )
            from rade_tpu.nn.wavlm_pp import to_pp_layout

            n_layers = self.model.wavlm_cfg.num_hidden_layers
            self.params["model"]["wavlm_stream"]["model"] = to_pp_layout(
                self.params["model"]["wavlm_stream"]["model"], n_layers
            )
            if self.trainable_mask is not None:
                # the mask tree must match the converted param structure
                frozen, always, stacked_freeze = self._freeze_spec
                self.trainable_mask = make_trainable_mask(
                    self.params, frozen, always,
                    stacked_layer_freeze=stacked_freeze or None,
                )
            print(
                f"pipeline parallelism: {n_layers} WavLM layers over "
                f"pipe={_pp.pipe_axis_size(self.mesh)} stages"
            )

    def _init_variables(self, model_config, init_rngs, dummy):
        """Initialize the variable tree without the ~330 s relay compile.

        Three paths (rade_tpu/utils/fast_init.py):
        - ``fast_init=True``: eval_shape + host materialization (~10 s) —
          structurally exact, values NOT a real init; for benchmarks and
          compile/layout checks only.
        - default on an accelerator backend: run the REAL initializer on the
          host CPU backend (bit-identical values — threefry is
          backend-deterministic; the Pallas-kernel twin model shares the
          same param structure) and transfer once.
        - CPU default backend (tests, dry runs) or any failure: plain
          on-device init, the original behavior.
        """
        from rade_tpu.utils.fast_init import cpu_init, shape_init

        if self._init_variables_override is not None:
            return self._init_variables_override
        if self.fast_init:
            variables = shape_init(self.model, init_rngs, dummy, seed=self.seed)
            return jax.device_put(variables)
        try:
            if jax.default_backend() != "cpu":
                init_model = self.model
                if model_config.get("use_pallas_scan") or model_config.get(
                    "use_pallas_resblock"
                ):
                    # TPU-only kernels can't execute on the CPU backend; the
                    # XLA twin has the identical parameter structure
                    init_model = build_model(
                        {
                            **model_config,
                            "use_pallas_scan": False,
                            "use_pallas_resblock": False,
                        }
                    )
                variables = cpu_init(init_model, init_rngs, dummy)
                # commit to the accelerator: params feed jit'd eval/train
                # steps, and CPU-committed args would pin those to CPU
                return jax.device_put(variables, jax.local_devices()[0])
        except Exception as e:
            print(f"cpu_init fallback -> on-device init ({type(e).__name__}: {e})")
        return self.model.init(init_rngs, dummy, train=False)

    def _load_ssl_pretrained(self, model_config) -> None:
        """Splice pretrained SSL weights into the fresh init.

        The reference loads wavlm-large / fairseq ``xlsr2_300m.pt`` at model
        construction (`DualStreamSEMamba.py:295-317`,
        `xlsr_mamba_model.py:21-43`); here the model_config keys
        ``wavlm_pretrained`` (HF checkpoint dir) or ``ssl_checkpoint``
        (fairseq/HF torch file) do the same at Experiment build time.
        """
        path = model_config.get("wavlm_pretrained") or model_config.get(
            "ssl_checkpoint"
        )
        if not path:
            return
        if not Path(path).exists():
            # A typo'd path must not silently train the SSL stage from
            # random init (the reference crashes on a missing checkpoint).
            print(
                f"WARNING: ssl_checkpoint/wavlm_pretrained '{path}' does not "
                "exist — the SSL frontend keeps its RANDOM initialization"
            )
            return
        wcfg = getattr(self.model, "wavlm_cfg", None)
        if wcfg is None:
            print(f"ssl_checkpoint set but {self.cfg.architecture} has no SSL stage")
            return
        from rade_tpu.nn.wavlm_convert import load_pretrained, load_xlsr_checkpoint
        from rade_tpu.train.checkpoint import merge_matching

        converted = (
            load_pretrained(path, wcfg)
            if Path(path).is_dir()
            else load_xlsr_checkpoint(path, wcfg)
        )
        # merge_matching, not a strict tree.map: the live tree may carry
        # leaves the checkpoint lacks (LoRA pairs when use_lora is on) and a
        # strict zip would crash; shape mismatches keep init rather than
        # silently installing wrong-shaped tensors.
        stats: dict = {}
        mp = self.params["model"]
        if "wavlm_stream" in mp:  # DualStreamSEMamba: frontend wraps the model
            mp["wavlm_stream"]["model"] = merge_matching(
                mp["wavlm_stream"]["model"], converted, stats
            )
        elif "ssl_model" in mp:  # XLSR-Mamba / XLSR-Conformer
            mp["ssl_model"] = merge_matching(mp["ssl_model"], converted, stats)
        else:
            print("ssl pretrained: no wavlm_stream/ssl_model subtree found")
            return
        loaded, kept = stats.get("loaded", 0), stats.get("kept", 0)
        print(
            f"loaded SSL pretrained weights from {path}: {loaded} tensors"
            + (f" ({kept} kept init: LoRA/new params)" if kept else "")
        )
        if loaded == 0:
            print(
                "WARNING: ssl pretrained load matched ZERO tensors — wrong "
                "variant for this config? SSL stage keeps random init"
            )

    def load_weights(self, path, strict: bool = True) -> None:
        """Warm-start from a checkpoint of params(+stats).

        Accepts either checkpoint layout (reduced tree or full train state,
        via `load_eval_weights`).  strict=False mirrors the reference's
        `load_state_dict(strict=False)` (`src/main.py:245-258`): only
        structurally-matching leaves load, everything else keeps its init.
        """
        from flax import serialization

        from rade_tpu.train.checkpoint import load_eval_weights, merge_matching

        params_template = {
            "model": self.params["model"],
            "loss": self.params["loss"],
        }
        try:
            self.params, self.batch_stats = load_eval_weights(
                path, params_template, self.batch_stats
            )
            return
        except Exception:
            if strict:
                raise
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        if "params" in raw:  # full train state — prefer EMA weights, like
            # the strict path / the reference's EMA-model-for-eval semantics
            src = raw.get("ema_params") or raw.get("params", {})
            stats_raw = raw.get("batch_stats", {})
        else:
            src = {"model": raw.get("model", {}), "loss": raw.get("loss", {})}
            stats_raw = raw.get("batch_stats", {})
        src = _bridge_wavlm_layout(src, params_template)
        self.params = merge_matching(params_template, src)
        self.batch_stats = merge_matching(self.batch_stats, stats_raw)
        # report which top-level model subtrees failed to (fully) match, so a
        # silent partial warm-start is at least a visible one
        unmatched = _unmatched_subtrees(
            params_template.get("model", {}), self.params.get("model", {})
        )
        if unmatched:
            print(
                f"load_weights(strict=False): subtrees kept at init "
                f"(no structural match in {path}): {sorted(unmatched)}"
            )

    def bn_update(self, batcher, n_batches: Optional[int] = None) -> None:
        """Recompute BN running stats over the train set (torch `bn_update`).

        Extracts exact per-batch statistics from flax's EMA update
        (batch_stat = (new - m*old) / (1-m)) and cumulative-averages them,
        matching torchcontrib's SWA bn_update used at `src/main.py:671-673`
        (which consumes the FULL train loader — so does the default here).

        The EMA momentum `m` is not hardcoded: it is calibrated per stats
        leaf on the first batch by applying the update from two offset
        running-stat trees (new' - new == m, since flax's update is linear
        in the old value) — correct for any per-module BN momentum.
        """
        import jax

        model = self.model
        params = self.state.params if self.state is not None else self.params
        rng = jax.random.fold_in(self.rng, 99)
        acc = None
        count = 0
        momentum = None

        wstream = params["model"].get("wavlm_stream", {})
        if "layers_pipe" in wstream.get("model", {}):
            # pp layout: the WavLM stream runs functionally; its value does
            # not influence any BatchNorm (BN lives in the sinc stream), so
            # the deterministic forward is used
            from rade_tpu.nn.wavlm_pp import wavlm_features_pp
            from rade_tpu.parallel import pp as _pp

            def wavlm_fn(xb):
                return wavlm_features_pp(
                    wstream, xb, model.wavlm_cfg,
                    mesh=_pp.active_mesh(),
                    n_micro=int(
                        getattr(self.cfg.parallel, "pipeline_microbatches", 0)
                    ),
                    train=False,
                )
        else:
            wavlm_fn = None

        # jit: one program per batch instead of per-op eager dispatch — much
        # faster, and REQUIRED under FSDP/tensor sharding: eager ops on
        # sharded params each enqueue their own all-gather mini-programs,
        # whose rendezvous order can deadlock the in-process CPU communicator
        @jax.jit
        def apply_stats(cur, xb):
            kw = {}
            if wavlm_fn is not None:
                kw["wavlm_features"] = wavlm_fn(xb)
            _, upd = model.apply(
                {"params": params["model"], "batch_stats": cur},
                xb, train=True,
                rngs={"dropout": rng, "freq_aug": rng},
                mutable=["batch_stats"], **kw,
            )
            return upd["batch_stats"]

        for i, (xb, yb) in enumerate(batcher.epoch(0)):
            if n_batches is not None and i >= n_batches:
                break
            cur = self.state.batch_stats if self.state is not None else self.batch_stats
            new = apply_stats(cur, xb)
            if momentum is None:
                shifted = apply_stats(jax.tree.map(lambda s: s + 1.0, cur), xb)
                momentum = jax.tree.map(lambda a, b: a - b, shifted, new)
            batch_stat = jax.tree.map(
                lambda n, old, m: (n - m * old) / jnp.maximum(1.0 - m, 1e-6),
                new, cur, momentum,
            )
            acc = batch_stat if acc is None else jax.tree.map(
                jnp.add, acc, batch_stat
            )
            count += 1
        if acc is None:
            return
        fresh = jax.tree.map(lambda s: s / count, acc)
        if self.state is not None:
            self.state = self.state.replace(batch_stats=fresh)
        else:
            self.batch_stats = fresh

    # ------------------------------------------------------------------ setup
    def setup_training(self, steps_per_epoch: int) -> TrainState:
        cfg = self.cfg
        accum = max(1, cfg.training.accumulation_steps)
        total_steps = cfg.num_epochs * steps_per_epoch
        self.tx = make_optimizer(
            cfg.optim, cfg.training, total_steps, cfg.training.grad_clip_norm,
            trainable_mask=self.trainable_mask,
        )
        # the backbone-group schedule, kept for scalar logging (same function
        # the optimizer group runs on)
        self.lr_schedule = make_lr_schedule(cfg.optim, cfg.training, total_steps)
        # donate the state: old params/EMA/opt buffers are reused in place,
        # halving peak state memory on the chip
        self.train_step = jax.jit(
            make_train_step(
                self.model, cfg, self.tx, trainable_mask=self.trainable_mask
            ),
            donate_argnums=(0,),
        )
        state = TrainState.create(
            params=self.params,
            batch_stats=self.batch_stats,
            tx=self.tx,
            rng=jax.random.fold_in(self.rng, 7),
            use_ema=cfg.training.use_ema,
            use_swa=cfg.training.use_swa,
            trainable_mask=self.trainable_mask,
        )
        from rade_tpu.parallel.tp import (
            describe_sharding, model_axis_size, shard_tree,
        )

        from rade_tpu.parallel.pp import pipe_axis_size

        fsdp = bool(getattr(cfg.parallel, "fsdp", False))
        if (
            model_axis_size(self.mesh) > 1 or pipe_axis_size(self.mesh) > 1
            or fsdp
        ):
            if model_axis_size(self.mesh) > 1:
                print(describe_sharding(self.params, self.mesh))
            # 2-D/3-D mesh: Megatron-style sharding of the SSL encoder
            # weights over `model` and/or the stacked pipeline layers over
            # `pipe` (plus their optimizer/EMA/SWA mirrors); everything
            # unmatched stays replicated.  `fsdp` additionally ZeRO-shards
            # every large leaf over `data` (parallel/tp.py::fsdp_spec).
            # The jit'd step picks the shardings up from the donated state
            # and GSPMD inserts the collectives.
            self.state = shard_tree(
                state, self.mesh, fsdp=fsdp,
                fsdp_min_size=int(getattr(cfg.parallel, "fsdp_min_size", 16384)),
            )
        else:
            self.state = jax.device_put(state, NamedSharding(self.mesh, P()))
        return self.state

    # ------------------------------------------------------------- data setup
    def build_loaders(self, database_path: Path):
        cfg = self.cfg
        db = Path(database_path)
        track = cfg.track
        prefix = f"ASVspoof2019.{track}"
        proto_dir = db / f"ASVspoof2019_{track}_cm_protocols"
        train_proto = (
            Path(cfg.data.custom_train_protocol)
            if cfg.data.custom_train_protocol
            else proto_dir / f"{prefix}.cm.train.trn.txt"
        )
        dev_proto = proto_dir / f"{prefix}.cm.dev.trl.txt"
        eval_proto = proto_dir / f"{prefix}.cm.eval.trl.txt"

        labels, train_files = parse_protocol_labeled(train_proto)
        dev_labels, dev_files = parse_protocol_labeled(dev_proto)
        eval_files = parse_protocol_eval(eval_proto)

        # with on-device augmentation the host pipeline serves clean audio
        # and the jit'd step applies RawBoost/codec on the TPU
        host_aug = not cfg.data.on_device_aug
        algo = cfg.data.rawboost_algo if (cfg.data.use_rawboost and host_aug) else 0
        train_ds = TrainDataset(
            train_files, labels, db / f"ASVspoof2019_{track}_train",
            algo=algo, use_codec=cfg.data.use_codec_aug and host_aug,
            codec_p=cfg.data.codec_p, rawboost_p=cfg.data.rawboost_p,
            cut=self.nb_samp, seed=self.seed,
        )
        dev_ds = EvalDataset(dev_files, db / f"ASVspoof2019_{track}_dev", cut=self.nb_samp)
        eval_ds = EvalDataset(eval_files, db / f"ASVspoof2019_{track}_eval", cut=self.nb_samp)
        native = bool(getattr(cfg.data, "native_loader", True))
        return (
            TrainBatcher(
                train_ds, cfg.batch_size, seed=self.seed,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
                native=native,
            ),
            EvalBatcher(dev_ds, cfg.test.batch_size, native=native),
            EvalBatcher(eval_ds, cfg.test.batch_size, native=native),
            dev_proto,
            eval_proto,
        )

    def build_compressed_eval(self, database_path: Path):
        """EvalBatcher over the codec-COMPRESSED 2019 eval protocol.

        The second column of the reference's headline table
        (`/root/reference/README.md:92`: 4.03 % "compressed") — the same
        eval trials, each band-limited by a deterministic per-utterance
        codec-sim draw (data/datasets.py::EvalDataset codec_sim).
        """
        cfg = self.cfg
        db = Path(database_path)
        track = cfg.track
        proto_dir = db / f"ASVspoof2019_{track}_cm_protocols"
        eval_proto = proto_dir / f"ASVspoof2019.{track}.cm.eval.trl.txt"
        eval_files = parse_protocol_eval(eval_proto)
        ds = EvalDataset(
            eval_files, db / f"ASVspoof2019_{track}_eval", cut=self.nb_samp,
            codec_sim=True, codec_seed=cfg.test.codec_seed,
            codec_inner_p=cfg.test.codec_inner_p,
        )
        return EvalBatcher(ds, cfg.test.batch_size), eval_proto

    # ---------------------------------------------------------------- running
    # --------------------------------------------- device-resident data cache
    def _use_device_cache(self) -> bool:
        d = self.cfg.data
        host_aug = not d.on_device_aug and (d.use_rawboost or d.use_codec_aug)
        return bool(d.device_cache) and not host_aug and jax.process_count() == 1

    def _build_device_cache(self, batcher: TrainBatcher):
        """Upload the clean, deterministically padded train set to HBM once.

        FLAC/WAV sources decode as int16/32768, so the cache is stored as
        raw int16 whenever that round-trip is exact — LOSSLESS at half the
        HBM (the full 25,380-utterance LA train set is 3.3 GB as int16 vs
        6.6 GB as f32, i.e. it fits the default 4 GB budget next to the
        training state).  The f32 scale happens on device after the batch
        gather, fused into the step.  Float-native sources (.npy synthetic
        sets) that don't round-trip exactly stay f32.
        """
        ds = batcher.dataset
        n, t = len(ds), self.nb_samp
        gib16 = n * t * 2 / 1e9
        if gib16 > float(self.cfg.data.device_cache_max_gb):
            print(
                f"device_cache: train set {gib16:.1f} GB (int16) exceeds "
                f"device_cache_max_gb={self.cfg.data.device_cache_max_gb} — "
                "falling back to the host batch pipeline"
            )
            return None
        xs = np.empty((n, t), np.float32)
        ys = np.empty((n,), np.int32)
        for i in range(n):
            xs[i], ys[i] = ds.load_clean(i)
        xi = np.rint(xs * np.float32(32768.0))
        lossless = (
            xi.min() >= -32768.0
            and xi.max() <= 32767.0
            and np.array_equal(xi * np.float32(1.0 / 32768.0), xs)
        )
        if lossless:
            xs = xi.astype(np.int16)
        elif n * t * 4 / 1e9 > float(self.cfg.data.device_cache_max_gb):
            print(
                f"device_cache: non-int16 train set {n * t * 4 / 1e9:.1f} GB "
                f"(f32) exceeds device_cache_max_gb="
                f"{self.cfg.data.device_cache_max_gb} — falling back to the "
                "host batch pipeline"
            )
            return None
        print(
            f"device_cache: {n} utts x {t} samples as "
            f"{'int16 (lossless)' if lossless else 'float32'} = "
            f"{xs.nbytes / 1e9:.2f} GB HBM"
        )
        rep = NamedSharding(self.mesh, P())
        return jax.device_put(xs, rep), jax.device_put(ys, rep)

    def _make_cached_step(self):
        from rade_tpu.train.step import make_train_step

        base = make_train_step(
            self.model, self.cfg, self.tx, trainable_mask=self.trainable_mask
        )
        sharding = self._batch_sharding

        def cached(state, x_all, y_all, idx, shift, ws):
            xb = jnp.take(x_all, idx, axis=0)  # (accum, per, T) device gather
            yb = jnp.take(y_all, idx, axis=0)
            # per-sample circular time shift: the on-device stand-in for the
            # host `pad_random` crop (the cache holds deterministic padding)
            a, b, t = xb.shape
            flat = xb.reshape(a * b, t)
            rolled = jax.vmap(jnp.roll)(flat, shift.reshape(-1))
            xb = rolled.reshape(a, b, t)
            if xb.dtype == jnp.int16:
                # int16 cache (lossless FLAC/WAV storage): gather + roll on
                # the 2-byte rows, scale to f32 last (fused by XLA)
                xb = xb.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
            xb = jax.lax.with_sharding_constraint(xb, sharding)
            yb = jax.lax.with_sharding_constraint(yb, sharding)
            return base(state, xb, yb, ws)

        return jax.jit(cached, donate_argnums=(0,))

    def _train_epoch_cached(self, batcher: TrainBatcher, epoch: int) -> float:
        accum = max(1, self.cfg.training.accumulation_steps)
        x_all, y_all = self._device_cache
        if self._cached_step is None:
            self._cached_step = self._make_cached_step()
        shift_rng = np.random.RandomState(
            (self.seed * 2654435761 + 97 * epoch) % (2**31 - 1)
        )
        t = self.nb_samp
        losses = []
        group: list = []

        def flush():
            n_valid = len(group)
            while len(group) < accum:  # trailing partial group, zero-weighted
                group.append(np.zeros_like(group[0]))
            ws = np.zeros((accum,), np.float32)
            ws[:n_valid] = 1.0
            idx = np.stack(group)
            shift = shift_rng.randint(0, t, size=idx.shape).astype(np.int32)
            self.state, metrics = self._cached_step(
                self.state, x_all, y_all, jnp.asarray(idx),
                jnp.asarray(shift), jnp.asarray(ws),
            )
            losses.append(metrics["loss"])
            group.clear()

        for idxs in batcher.epoch_indices(epoch):
            group.append(idxs)
            if len(group) == accum:
                flush()
        if group:
            flush()
        if not losses:
            return float("nan")
        return float(np.mean(jax.device_get(losses)))

    def train_one_epoch(self, batcher: TrainBatcher, epoch: int) -> float:
        """Group micro-batches into macro-batches of `accum` and step.

        Profiling: set RADE_PROFILE_DIR to capture a jax.profiler trace of
        this epoch's first few steps (tracing parity — SURVEY.md §5; the
        reference has no profiler at all).
        """
        import os

        profile_dir = os.environ.get("RADE_PROFILE_DIR")

        if self._use_device_cache():
            if self._device_cache is None:  # False = tried and fell back
                self._device_cache = self._build_device_cache(batcher) or False
            if self._device_cache:
                # profiling must also cover the cached fast path
                if profile_dir and epoch == 0:
                    jax.profiler.start_trace(profile_dir)
                try:
                    return self._train_epoch_cached(batcher, epoch)
                finally:
                    if profile_dir and epoch == 0:
                        jax.tree.map(
                            lambda x: x.block_until_ready(), self.state.params
                        )
                        jax.profiler.stop_trace()

        if profile_dir and epoch == 0:
            jax.profiler.start_trace(profile_dir)
        accum = max(1, self.cfg.training.accumulation_steps)
        losses = []
        micro_iter = prefetch(batcher.epoch(epoch), depth=4)
        group_x, group_y = [], []

        def run_group():
            from rade_tpu.parallel.multihost import shard_host_batch

            n_valid = len(group_x)
            # pad the trailing partial group to `accum` with zero-weight
            # micro-batches: the reference takes a partial optimizer step on
            # the last loader batch (`src/main.py:1100`), with grads still
            # divided by the full accumulation_steps
            while len(group_x) < accum:
                group_x.append(np.zeros_like(group_x[0]))
                group_y.append(np.zeros_like(group_y[0]))
            ws = np.zeros((accum,), np.float32)
            ws[:n_valid] = 1.0
            gb = self.cfg.batch_size  # global micro-batch
            xs = shard_host_batch(
                self._batch_sharding, np.stack(group_x),
                (accum, gb) + group_x[0].shape[1:],
            )
            ys = shard_host_batch(
                self._batch_sharding, np.stack(group_y), (accum, gb)
            )
            self.state, metrics = self.train_step(self.state, xs, ys, jnp.asarray(ws))
            losses.append(metrics["loss"])
            group_x.clear()
            group_y.clear()

        for xb, yb in micro_iter:
            group_x.append(xb)
            group_y.append(yb)
            if len(group_x) == accum:
                run_group()
        if group_x:  # trailing partial group -> partial optimizer step
            run_group()
        if profile_dir and epoch == 0:
            jax.tree.map(lambda x: x.block_until_ready(), self.state.params)
            jax.profiler.stop_trace()
        if not losses:
            return float("nan")
        return float(np.mean(jax.device_get(losses)))

    def score_split(self, batcher: EvalBatcher, trial_path, out_path, use_ema=True):
        if self.state is not None:
            params = self.state.eval_params if use_ema else self.state.params
            batch_stats = self.state.batch_stats
        else:
            params, batch_stats = self.params, self.batch_stats
        if jax.process_count() > 1:
            # pull the replicated copies onto the local eval mesh — cached
            # per (state, ema-flag): the round-trip through host memory is
            # ~1.3 GB for WavLM-Large, so repeated score_split calls on the
            # same state (dev + eval + diag in one epoch) pay it once
            cache_key = (
                int(jax.device_get(self.state.step)) if self.state is not None else -1,
                use_ema,
            )
            if getattr(self, "_eval_cache_key", None) != cache_key:
                rep = NamedSharding(self._eval_mesh, P())
                self._eval_cache = (
                    jax.device_put(jax.device_get(params), rep),
                    jax.device_put(jax.device_get(batch_stats), rep),
                )
                self._eval_cache_key = cache_key
            params, batch_stats = self._eval_cache
        produce_evaluation_file(
            self.eval_step, params, batch_stats, batcher, trial_path, out_path,
            put_batch=lambda x: jax.device_put(x, self._eval_sharding),
        )


def run_training(
    cfg: ExperimentConfig,
    database_path,
    output_dir,
    config_path="config.conf",
    seed: int = 1234,
    comment: str = "",
    start_epoch: int = 0,
    resume_path: Optional[str] = None,
    log_fn=print,
) -> Dict[str, Any]:
    """Full training run; returns summary metrics."""
    exp = Experiment(cfg, seed=seed)
    trn, dev, evl, dev_proto, eval_proto = exp.build_loaders(Path(database_path))
    # compressed-protocol eval (test_config.eval_compressed): report the
    # reference's second headline column alongside the clean EER
    evl_cmp = (
        exp.build_compressed_eval(Path(database_path))[0]
        if cfg.test.eval_compressed
        else None
    )

    accum = max(1, cfg.training.accumulation_steps)
    # ceil: the trailing partial accumulation group takes an optimizer step too
    steps_per_epoch = max(1, -(-len(trn) // accum))
    state = exp.setup_training(steps_per_epoch)
    if resume_path:
        from rade_tpu.train.checkpoint import restore_state

        exp.state = restore_state(resume_path, state)
        log_fn(f"resumed full train state from {resume_path}")

    tag = cfg.model_tag(config_path, comment)
    if jax.process_count() > 1 and jax.process_index() != 0:
        # multi-host: secondary processes write to their own dirs so shared
        # filesystems aren't clobbered (artifacts are identical on all hosts)
        tag = f"{tag}.proc{jax.process_index()}"
    run_dir = Path(output_dir) / tag
    weights = CheckpointManager(run_dir / "weights")
    metrics_dir = run_dir / "metrics"
    metrics_dir.mkdir(parents=True, exist_ok=True)
    (run_dir / "config.conf").write_text(json.dumps(cfg.raw, indent=2))
    metric_log = open(run_dir / "metric_log.txt", "a")
    metric_log.write("=" * 5 + "\n")
    # scalar time-series (the TensorBoard-equivalent observability artifact:
    # reference writes these scalars to TB at `src/main.py:567-569,666-667`);
    # one JSON object per epoch, plottable with tools/plot_metrics.py and
    # consumed by tools/autopilot.py
    scalars_path = metrics_dir / "scalars.jsonl"
    scalars_log = open(scalars_path, "a")

    def write_scalars(row: Dict[str, Any]) -> None:
        scalars_log.write(json.dumps(row) + "\n")
        scalars_log.flush()

    asv_path = cfg.asv_score_path
    best_dev_eer, best_eval_eer, best_eval_tdcf = 100.0, 100.0, 1.0
    # eval numbers at the most recent new-best-DEV epoch: reported in the
    # final metric_log line alongside SWA, mirroring the reference's dual
    # best.pth/swa.pth reporting (`src/main.py:602-687`) — on a
    # still-improving trajectory SWA averages toward early weights and
    # summarizing the run by SWA alone misrepresents it (round-4 verdict:
    # AnchorHard v2 ended `swa_eval_eer=56.6` vs best dev 42.1)
    best_epoch_eval: Dict[str, Any] = {}
    history = []

    for epoch in range(start_epoch, cfg.num_epochs):
        t0 = time.time()
        loss = exp.train_one_epoch(trn, epoch)
        train_seconds = time.time() - t0
        dev_score = metrics_dir / f"dev_score_ep{epoch}.txt"
        exp.score_split(dev, dev_proto, dev_score)
        dev_eer, dev_tdcf = calculate_tdcf_eer(
            str(dev_score), asv_path,
            str(metrics_dir / f"dev_t-DCF_EER_{epoch:03d}epo.txt"), printout=False,
        )
        dt = time.time() - t0
        log_fn(
            f"epoch {epoch:03d} loss {loss:.5f} dev_eer {dev_eer:.3f}% "
            f"dev_tdcf {dev_tdcf:.5f} ({dt:.1f}s)"
        )
        metric_log.write(
            f"{epoch:03d}: loss={loss:.5f} dev_eer={dev_eer:.4f} dev_tdcf={dev_tdcf:.5f}\n"
        )
        metric_log.flush()
        history.append({"epoch": epoch, "loss": loss, "dev_eer": dev_eer, "dev_tdcf": dev_tdcf})

        eval_eer = eval_tdcf = eval_eer_cmp = eval_tdcf_cmp = None
        if dev_eer < best_dev_eer:
            best_dev_eer = dev_eer
            if cfg.training.save_best_ckpt:
                weights.save_best(exp.state, epoch, dev_eer)
            if cfg.eval_all_best:
                eval_score = run_dir / cfg.eval_output
                exp.score_split(evl, eval_proto, eval_score)
                eval_eer, eval_tdcf = calculate_tdcf_eer(
                    str(eval_score), asv_path,
                    str(metrics_dir / f"t-DCF_EER_{epoch:03d}epo.txt"), printout=False,
                )
                log_fn(f"  eval_eer {eval_eer:.3f}% eval_tdcf {eval_tdcf:.5f}")
                if evl_cmp is not None:
                    cmp_score = run_dir / ("compressed_" + cfg.eval_output)
                    exp.score_split(evl_cmp, eval_proto, cmp_score)
                    eval_eer_cmp, eval_tdcf_cmp = calculate_tdcf_eer(
                        str(cmp_score), asv_path,
                        str(metrics_dir / f"t-DCF_EER_compressed_{epoch:03d}epo.txt"),
                        printout=False,
                    )
                    log_fn(
                        f"  compressed eval_eer {eval_eer_cmp:.3f}% "
                        f"eval_tdcf {eval_tdcf_cmp:.5f}"
                    )
                if eval_tdcf < best_eval_tdcf:
                    best_eval_tdcf, best_eval_eer = eval_tdcf, eval_eer
                    weights.save_named(exp.state, "best")
                best_epoch_eval = {
                    "epoch": epoch,
                    "eval_eer": eval_eer,
                    "eval_eer_compressed": eval_eer_cmp,
                }
            # SWA snapshot on every new-best epoch (reference `main.py:643-645`);
            # jitted: one fused kernel instead of ~10^3 eager per-leaf dispatches
            if cfg.training.use_swa:
                exp.state = _jit_swa_snapshot(exp.state)

        step_now = int(jax.device_get(exp.state.step))
        n_utts = len(trn) * cfg.batch_size
        write_scalars({
            "epoch": epoch,
            "step": step_now,
            "loss": loss,
            "dev_eer": dev_eer,
            "dev_tdcf": dev_tdcf,
            "eval_eer": eval_eer,
            "eval_tdcf": eval_tdcf,
            "eval_eer_compressed": eval_eer_cmp,
            "eval_tdcf_compressed": eval_tdcf_cmp,
            "lr": float(exp.lr_schedule(max(0, step_now - 1))),
            "train_seconds": round(train_seconds, 3),
            "utt_per_sec": round(n_utts / max(train_seconds, 1e-9), 3),
            "best_dev_eer": best_dev_eer,
            "best_eval_eer": best_eval_eer,
            "best_eval_tdcf": best_eval_tdcf,
            "time": time.time(),
        })

        ckpt_every = cfg.training.checkpoint_interval
        if ckpt_every and epoch % ckpt_every == 0:
            weights.save_periodic(exp.state, epoch)

        # graceful early stop: touch <run_dir>/STOP and the run concludes at
        # the next epoch boundary WITH the full final phase (SWA swap + BN
        # update + eval + final metric_log line + 2021-DF auto-eval) — the
        # reference can only be killed, losing its end-of-run artifacts; on
        # this hardware a hard kill additionally wedges the TPU relay
        if (run_dir / "STOP").exists():
            log_fn(f"STOP file found at epoch {epoch} — concluding run early")
            metric_log.write(f"stopped_early: epoch={epoch}\n")
            metric_log.flush()
            break

        # optional per-attack diagnostics on the full eval set
        # (reference `main.py:577-600`, eval_diag_interval)
        diag = cfg.training.eval_diag_interval
        if diag and epoch % diag == 0:
            from rade_tpu.tools.analyze_breakdown import breakdown

            diag_score = metrics_dir / f"diag_eval_ep{epoch}.txt"
            exp.score_split(evl, eval_proto, diag_score)
            _, per_attack = breakdown(str(diag_score))
            worst = {k: v[0] for k, v in per_attack.items() if k in ("A17", "A18", "A19")}
            log_fn(f"  diag per-attack EER: {worst}")

    # final: SWA swap + BN update + eval (reference `main.py:671-687`)
    final_bits = []
    if (
        cfg.training.use_swa
        and exp.state.swa_params is not None
        and int(jax.device_get(exp.state.n_swa)) > 0
    ):
        exp.state = exp.state.replace(params=exp.state.swa_params, ema_params=None)
        # full train loader, like torchcontrib's bn_update (`src/main.py:671-673`)
        exp.bn_update(trn)
        # saved AFTER the swap + BN update, like the reference's swa.pth:
        # the file's params ARE the averaged weights
        weights.save_named(exp.state, "swa")
        final_score = run_dir / ("swa_" + cfg.eval_output)
        exp.score_split(evl, eval_proto, final_score, use_ema=False)
        swa_eer, swa_tdcf = calculate_tdcf_eer(
            str(final_score), asv_path, str(metrics_dir / "t-DCF_EER_swa.txt"), printout=False
        )
        log_fn(f"SWA eval_eer {swa_eer:.3f}% eval_tdcf {swa_tdcf:.5f}")
        final_bits.append(f"swa_eval_eer={swa_eer:.4f}")
        if evl_cmp is not None:
            cmp_final = run_dir / ("swa_compressed_" + cfg.eval_output)
            exp.score_split(evl_cmp, eval_proto, cmp_final, use_ema=False)
            swa_eer_c, swa_tdcf_c = calculate_tdcf_eer(
                str(cmp_final), asv_path,
                str(metrics_dir / "t-DCF_EER_swa_compressed.txt"), printout=False,
            )
            log_fn(
                f"SWA compressed eval_eer {swa_eer_c:.3f}% "
                f"eval_tdcf {swa_tdcf_c:.5f}"
            )
            final_bits.append(f"swa_eval_eer_compressed={swa_eer_c:.4f}")
    # best-epoch numbers ALWAYS accompany the SWA summary (reference's dual
    # best.pth/swa.pth reporting): on a still-improving run SWA lags best
    final_bits.append(f"best_dev_eer={best_dev_eer:.4f}")
    if best_epoch_eval:
        final_bits.append(f"best_epoch={best_epoch_eval['epoch']}")
        if best_epoch_eval.get("eval_eer") is not None:
            final_bits.append(
                f"best_epoch_eval_eer={best_epoch_eval['eval_eer']:.4f}"
            )
        if best_epoch_eval.get("eval_eer_compressed") is not None:
            final_bits.append(
                "best_epoch_eval_eer_compressed="
                f"{best_epoch_eval['eval_eer_compressed']:.4f}"
            )
    metric_log.write("final: " + " ".join(final_bits) + "\n")
    metric_log.flush()

    # optional cross-domain 2021-DF auto-eval (reference `main.py:698-796`,
    # which calls a module the reference ships without)
    if (
        cfg.auto_eval_2021_df
        and cfg.database_path_2021
        and Path(cfg.database_path_2021).exists()
    ):
        try:
            from rade_tpu.data.datasets import EvalDataset
            from rade_tpu.data.protocols import parse_protocol_2021
            from rade_tpu.evaluate.eval2021 import write_codec_breakdown_report
            from rade_tpu.evaluate.scorer import produce_evaluation_file_2021

            db21 = Path(cfg.database_path_2021)
            trial21 = db21 / "ASVspoof2021.DF.cm.eval.trl.txt"
            files21 = (
                parse_protocol_2021(trial21)
                if trial21.exists()
                else parse_protocol_2021(cfg.key_file_2021)
            )
            ds21 = EvalDataset(files21, db21, cut=exp.nb_samp, zero_pad_on_error=True)
            from rade_tpu.data.pipeline import EvalBatcher as _EB

            score21 = run_dir / "eval_2021df_scores.txt"
            produce_evaluation_file_2021(
                exp.eval_step, exp.state.eval_params, exp.state.batch_stats,
                _EB(ds21, cfg.test.batch_size), files21, score21,
            )
            if cfg.key_file_2021 and Path(cfg.key_file_2021).exists():
                eer21 = write_codec_breakdown_report(
                    str(score21), cfg.key_file_2021,
                    str(run_dir / "report_2021df_codec.md"),
                )
                log_fn(f"2021-DF EER {eer21:.3f}%")
        except Exception as e:  # cross-domain eval is best-effort, like the reference
            log_fn(f"2021-DF auto-eval failed: {e}")

    metric_log.close()
    scalars_log.close()
    return {
        "best_dev_eer": best_dev_eer,
        "best_eval_eer": best_eval_eer,
        "best_eval_tdcf": best_eval_tdcf,
        "history": history,
        "run_dir": str(run_dir),
    }
