"""The fused train step: mixup + forward + loss + FGM + accumulation + EMA.

One jit-compiled function reproducing the reference's `train_epoch` inner loop
(`/root/reference/src/main.py:998-1126`) as a single XLA program per optimizer
step:

- consumes a macro-batch ``(accum_steps, micro_bs, T)`` and `lax.scan`s over
  micro-batches, accumulating gradients (= the reference's loss/accum +
  backward-sum semantics);
- mixup draws a Beta(alpha, alpha) lambda and a permutation per micro-batch
  (`main.py:1038-1046`);
- FGM perturbs the parameters whose path contains ``fgm_emb_name`` by
  eps * g/||g|| (per-leaf norm), runs a second forward/backward on the same
  mixed batch, adds the gradients, and restores (`main.py:74-100, 1080-1098`)
  — expressed as two `jax.grad` calls, no mutation;
- the adversarial forward also advances BN running stats, as torch train-mode
  does;
- gradient clip (global norm 3.0) -> AdamW update -> EMA update
  (`ema = d*ema + (1-d)*p`) per optimizer step;
- bf16 on TPU replaces AMP+GradScaler (no loss scaling needed).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rade_tpu.config import ExperimentConfig
from rade_tpu import losses as L
from .optim import apply_mask
from .state import TrainState


def cast_tree(tree, dtype):
    """Cast float leaves (params/stats/inputs) to the compute dtype."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def _fgm_mask(params, emb_name: str):
    def match(path, _):
        keys = "/".join(str(getattr(k, "key", getattr(k, "name", ""))) for k in path)
        return 1.0 if emb_name in keys else 0.0

    return jax.tree_util.tree_map_with_path(match, params)


def make_loss_fn(model, cfg: ExperimentConfig) -> Tuple[Callable, Callable]:
    """Returns ``(prep_inputs, loss_fn)``.

    ``prep_inputs(x, y, aug_rng, mixup_rng) -> (x_in, y_a, y_b, lam)`` runs
    the on-device augmentation + mixup — param-independent input work that
    must NOT sit inside the differentiated region: with FGM both passes
    attack the same (augmented, mixed) batch (`main.py:1087` reuses the
    batch), so hoisting it out of ``loss_fn`` halves the RawBoost/codec
    FIR work per micro-batch and keeps it out of remat recomputes.

    ``loss_fn(params, batch_stats, x_in, y_a, y_b, lam, rngs) ->
    (loss, (new_batch_stats, logits))`` is the differentiated part.
    """
    tc = cfg.training
    pp_micro = int(getattr(cfg.parallel, "pipeline_microbatches", 0))

    def _maybe_pp_features(model_params, x_in, train, rng=None):
        """Pipeline-parallel WavLM stream: when the params are in the
        stacked pp layout (Experiment converts them when the mesh has a
        pipe axis), compute the stream functionally outside the module —
        differentiable, so FGM/grads flow through it unchanged."""
        wstream = (
            model_params.get("wavlm_stream")
            if isinstance(model_params, dict) else None
        )
        if wstream is None or "layers_pipe" not in wstream.get("model", {}):
            return None
        from rade_tpu.nn.wavlm_pp import wavlm_features_pp
        from rade_tpu.parallel import pp as _pp

        return wavlm_features_pp(
            wstream, x_in, model.wavlm_cfg,
            mesh=_pp.active_mesh(), n_micro=pp_micro,
            train=train, rng=rng,
        )

    def compute(logits, feats, loss_params, targets_soft, y_hard):
        if tc.use_ocsoftmax:
            # OC-Softmax consumes hard labels; mixup mixes the two losses outside
            base = L.ocsoftmax_loss(
                loss_params, feats, y_hard,
                tc.ocsoftmax_r_real, tc.ocsoftmax_r_fake, tc.ocsoftmax_alpha,
            )
        elif tc.use_focal_loss:
            base = L.focal_loss_soft(logits, targets_soft, tc.focal_alpha, tc.focal_gamma)
        else:
            base = L.weighted_cross_entropy_soft(
                logits, targets_soft, y_hard, label_smoothing=tc.label_smoothing
            )
        if tc.use_supcon:
            feats_n = feats / (jnp.linalg.norm(feats, axis=1, keepdims=True) + 1e-12)
            base = base + tc.lambda_supcon * L.supcon_loss(feats_n, y_hard)
        return base

    def prep_inputs(x, y, aug_rng, mixup_rng):
        if cfg.data.on_device_aug:
            from rade_tpu.augment.rawboost_jax import augment_batch

            x = augment_batch(aug_rng, x, cfg.data)
        if tc.use_mixup and x.shape[0] > 1:
            k_lam, k_perm = jax.random.split(mixup_rng)
            lam = jax.random.beta(k_lam, tc.mixup_alpha, tc.mixup_alpha)
            perm = jax.random.permutation(k_perm, x.shape[0])
            x_in = lam * x + (1.0 - lam) * x[perm]
            y_a, y_b = y, y[perm]
        else:
            lam = jnp.float32(1.0)
            x_in, y_a, y_b = x, y, y
        return x_in, y_a, y_b, lam

    def loss_fn(params, batch_stats, x_in, y_a, y_b, lam, rngs, sinc_features=None,
                extractor_features=None):
        n_cls = 2
        model_params = params["model"]
        bs_in = batch_stats
        if tc.mixed_precision:
            # bf16 compute, f32 master weights: the cast is inside the graph,
            # so grads land on the f32 params (no loss scaler needed for bf16).
            # batch_stats must be cast too — f32 BN stats would promote every
            # post-BN tensor back to f32 (profiled: the SincNet conv stack ran
            # f32 until this cast).
            model_params = cast_tree(model_params, jnp.bfloat16)
            bs_in = cast_tree(batch_stats, jnp.bfloat16)
            x_in = x_in.astype(jnp.bfloat16)
        variables = {"params": model_params, "batch_stats": bs_in}
        mutable = False if tc.freeze_bn else ["batch_stats"]
        extra = {} if sinc_features is None else {"sinc_features": sinc_features}
        if extractor_features is not None:
            extra["wavlm_extractor_features"] = extractor_features
        wf = _maybe_pp_features(
            model_params, x_in, train=True,
            rng=jax.random.fold_in(rngs["dropout"], 17),
        )
        if wf is not None:
            extra["wavlm_features"] = wf
        out = model.apply(
            variables, x_in,
            train=True, freq_aug=cfg.freq_aug, freeze_bn=tc.freeze_bn,
            rngs=rngs, mutable=mutable, **extra,
        )
        if mutable:
            (feats, logits), updates = out
            # keep running stats in f32 across scan iterations
            new_bs = cast_tree(updates["batch_stats"], jnp.float32)
        else:
            feats, logits = out
            new_bs = batch_stats
        feats = feats.astype(jnp.float32)
        logits = logits.astype(jnp.float32)

        t_a = jax.nn.one_hot(y_a, n_cls, dtype=logits.dtype)
        t_b = jax.nn.one_hot(y_b, n_cls, dtype=logits.dtype)
        loss_a = compute(logits, feats, params.get("loss", {}), t_a, y_a)
        loss_b = compute(logits, feats, params.get("loss", {}), t_b, y_b)
        loss = lam * loss_a + (1.0 - lam) * loss_b
        return loss, (new_bs, logits)

    return prep_inputs, loss_fn


def make_train_step(
    model,
    cfg: ExperimentConfig,
    tx: optax.GradientTransformation,
    trainable_mask=None,
) -> Callable[[TrainState, jax.Array, jax.Array], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the jit-able one-optimizer-step function over a macro-batch.

    ``trainable_mask`` (the STATIC 1/0 python-float tree from
    `make_trainable_mask`, not the traced copy in the state) restricts
    differentiation to trainable leaves: `jax.grad` then never emits the
    frozen params' weight-gradient matmuls, so XLA prunes e.g. the whole
    WavLM-base dW computation under LoRA and the entire (frozen) CNN
    feature-extractor backward — in BOTH FGM passes.  Frozen grads are
    structural zeros.
    """
    tc = cfg.training
    prep_inputs, loss_fn = make_loss_fn(model, cfg)

    # FGM frontend sharing: the perturbation targets `fgm_emb_name`
    # (feature_projection — inside the WavLM stream), so the SincNet stream's
    # activations are IDENTICAL in both passes.  Compute them once per
    # micro-batch with jax.vjp and feed both passes; the sinc parameter
    # gradient is exact from one backward with the two cotangents summed
    # (VJP is linear in the cotangent).  Needs freeze_bn (no running-stat
    # side effects to replay), a model that accepts `sinc_features`, and
    # freq_aug OFF: the reference's FGM second forward re-draws the random
    # sinc filter-band mask (`src/main.py:1087` -> `AASIST.py:391-396`), so
    # with freq_aug the two passes see different sinc activations and
    # sharing would silently reuse the first pass's mask.
    # Pallas res-block chain in training (custom VJP with XLA-recompute
    # backward, kernels/resblock_grad.py): legal whenever freeze_bn pins the
    # sinc stream to its eval-mode function.  Unlike frontend sharing this
    # stays recipe-exact UNDER freq_aug too — each pass draws its own
    # filter-band mask and runs its own fast forward.
    fast_sinc = (
        bool(cfg.model_config.get("use_pallas_resblock_training"))
        and tc.freeze_bn
        and "DualStreamSEMamba" in cfg.architecture
    )
    share_frontend = (
        tc.use_fgm
        and tc.fgm_share_frontend
        and tc.freeze_bn
        and not cfg.freq_aug
        and "DualStreamSEMamba" in cfg.architecture
        and not fast_sinc
    )
    if fast_sinc:
        from rade_tpu.models.dual_stream_se_mamba import sinc_encoder_train_fast

        _sinc_ch = int(cfg.model_config.get("sinc_channels", 70))
        # value "native" selects the all-Pallas block backward
        # (kernels/resblock_packed_vjp.py); any other truthy value keeps the
        # XLA-recompute VJP (kernels/resblock_grad.py)
        _sinc_bwd = (
            "native"
            if str(cfg.model_config.get("use_pallas_resblock_training"))
            .lower() == "native"
            else "recompute"
        )
    if share_frontend:
        from rade_tpu.models.dual_stream_se_mamba import SincNetEncoder

        sinc_mod = SincNetEncoder(
            sinc_channels=int(cfg.model_config.get("sinc_channels", 70)),
            remat=bool(cfg.model_config.get("sinc_remat", False)),
        )

    # FGM extractor sharing: the WavLM CNN feature extractor sits UPSTREAM
    # of the perturbed `feature_projection` and has no dropout/RNG, so when
    # its params are frozen its output is bit-identical in both FGM passes —
    # compute it once per micro-batch and feed both.  Unlike
    # fgm_share_frontend this stays recipe-exact under freq_aug (the
    # filter-band mask only touches the sinc stream).  Engaged only on the
    # trainable-mask path with the WHOLE extractor subtree masked to zero
    # (true in every supported recipe — the reference always freezes the
    # extractor, `src/models/DualStreamSEMamba.py:338-370`), and never under
    # the pipeline-parallel layout (the pp path computes the full WavLM
    # stream functionally via wavlm_features_pp).
    def _ext_mask_subtree(tree):
        try:
            return tree["model"]["wavlm_stream"]["model"]["feature_extractor"]
        except (KeyError, TypeError):
            return None

    _ext_mask = (
        _ext_mask_subtree(trainable_mask) if trainable_mask is not None else None
    )
    # _fgm_mask matches emb_name as a substring of the joined param path, so
    # sharing is invalid if emb_name could select an extractor leaf (the
    # perturbation would then change the "shared" activations)
    _ext_path_probe = "/".join(
        ["model", "wavlm_stream", "model", "feature_extractor"]
        + [f"conv_layers_{i}_conv" for i in range(8)]
        + [f"conv_layers_{i}_layer_norm" for i in range(8)]
        + ["kernel", "bias", "scale"]
    )
    share_extractor = (
        tc.use_fgm
        and tc.fgm_share_extractor
        and "DualStreamSEMamba" in cfg.architecture
        and int(getattr(cfg.parallel, "pipeline_axis", 1)) <= 1
        and tc.fgm_emb_name not in _ext_path_probe
        and _ext_mask is not None
        and all(
            float(np.max(np.asarray(m))) == 0.0
            for m in jax.tree_util.tree_leaves(_ext_mask)
        )
    )
    if share_extractor:
        from rade_tpu.nn.wavlm import WavLMFeatureEncoder

        _ext_mod = WavLMFeatureEncoder(model.wavlm_cfg)

        def _ext_fwd(params, x_c):
            p_ext = params["model"]["wavlm_stream"]["model"]["feature_extractor"]
            if tc.mixed_precision:
                p_ext = cast_tree(p_ext, jnp.bfloat16)
                x_c = x_c.astype(jnp.bfloat16)
            # frozen subtree: no cotangent needed, plain forward
            return jax.lax.stop_gradient(_ext_mod.apply({"params": p_ext}, x_c))

    if trainable_mask is None:
        _vg = jax.value_and_grad(loss_fn, has_aux=True)

        def grad_fn(params, *args, ext=None):
            return _vg(params, *args, extractor_features=ext)

        def grad_fn_sf(params, batch_stats, x_in, y_a, y_b, lam, rngs, sf,
                       ext=None):
            (out, aux), (g_p, g_sf) = jax.value_and_grad(
                loss_fn, argnums=(0, 7), has_aux=True
            )(params, batch_stats, x_in, y_a, y_b, lam, rngs, sf,
              extractor_features=ext)
            return (out, aux), g_p, g_sf
    else:
        # per-layer VECTOR mask leaves (stacked scan/pp layouts with
        # wavlm_freeze_layers > 0) are differentiated whenever any layer
        # lane is trainable; apply_mask zeroes the frozen lanes afterwards
        mask_leaves = [
            bool(np.any(np.asarray(m) > 0))
            for m in jax.tree_util.tree_leaves(trainable_mask)
        ]

        def _masked_grads(params, args, sf, ext=None):
            """grads wrt trainable leaves (+ sf cotangent when sf is given)."""
            flat, treedef = jax.tree_util.tree_flatten(params)
            assert len(flat) == len(mask_leaves)
            t_idx = [i for i, t in enumerate(mask_leaves) if t]

            def wrt(t_leaves, sf_in, frozen_flat):
                leaves = list(frozen_flat)
                for i, v in zip(t_idx, t_leaves):
                    leaves[i] = v
                return loss_fn(
                    jax.tree_util.tree_unflatten(treedef, leaves), *args,
                    sinc_features=sf_in, extractor_features=ext,
                )

            argnums = 0 if sf is None else (0, 1)
            out, g = jax.value_and_grad(wrt, argnums=argnums, has_aux=True)(
                [flat[i] for i in t_idx], sf, flat
            )
            g_t, g_sf = (g, None) if sf is None else g
            g_flat = [jnp.zeros_like(p) for p in flat]
            for i, gi in zip(t_idx, g_t):
                g_flat[i] = gi
            return out, jax.tree_util.tree_unflatten(treedef, g_flat), g_sf

        def grad_fn(params, *args, ext=None):
            out, grads, _ = _masked_grads(params, args, None, ext)
            return out, grads

        def grad_fn_sf(params, *args_sf, ext=None):
            *args, sf = args_sf
            return _masked_grads(params, tuple(args), sf, ext)

    def _perturb_adv(params, grads):
        fmask = _fgm_mask(params, tc.fgm_emb_name)

        def perturb(p, m, g):
            norm = jnp.linalg.norm(g)
            delta = jnp.where(norm > 0, tc.fgm_epsilon * g / (norm + 1e-12), 0.0)
            return p + m * delta

        return jax.tree.map(perturb, params, fmask, grads)

    def micro_step(params, batch_stats, x, y, rng, token):
        # `token` (f32 scalar) serializes the opaque custom-VJP sinc chains
        # ACROSS micro-batches on the fast_sinc path: each micro-batch's
        # sinc forward waits on the previous micro-batch's sinc pullback,
        # so at most one packed chain (fwd or recompute-bwd) is live at a
        # time while the WavLM work still overlaps freely.  Unused (passed
        # through) on the other paths.
        rng, k_drop, k_freq, k_mix, k_drop2, k_freq2, k_aug = jax.random.split(rng, 7)
        # aug + mixup once, outside the differentiated region: FGM attacks
        # the same (augmented, mixed) batch (`main.py:1087`)
        x_in, y_a, y_b, lam = prep_inputs(x, y, k_aug, k_mix)
        # frozen WavLM CNN extractor: one forward feeds both FGM passes
        ext = _ext_fwd(params, x_in) if share_extractor else None

        if fast_sinc:
            def sinc_fwd_fast(sp, key, x_c):
                bs_c = batch_stats["sinc_stream"]
                if tc.mixed_precision:
                    sp = cast_tree(sp, jnp.bfloat16)
                    bs_c = cast_tree(bs_c, jnp.bfloat16)
                    x_c = x_c.astype(jnp.bfloat16)
                return sinc_encoder_train_fast(
                    sp, bs_c, x_c,
                    freq_key=key if cfg.freq_aug else None,
                    sinc_channels=_sinc_ch,
                    backward=_sinc_bwd,
                )

            sp0 = params["model"]["sinc_stream"]
            # barrier ONLY the sinc chain's input copy — the WavLM/model
            # passes keep the unbarriered x_in and overlap across
            # micro-batches as before
            x_sinc, token = jax.lax.optimization_barrier((x_in, token))
            del token  # re-derived from this micro-batch's d_sinc below
            sf, sinc_vjp = jax.vjp(
                lambda sp: sinc_fwd_fast(sp, k_freq, x_sinc), sp0
            )
            rngs = {"dropout": k_drop}
            (loss, (batch_stats, _)), grads, g_sf = grad_fn_sf(
                params, batch_stats, x_in, y_a, y_b, lam, rngs, sf, ext=ext
            )
            if tc.use_fgm:
                params_adv = _perturb_adv(params, grads)
                if cfg.freq_aug:
                    # the adversarial pass re-draws the sinc filter-band mask
                    # (reference src/main.py:1087 -> AASIST.py:391-396).
                    # Pull pass 1's sinc cotangent back NOW and barrier the
                    # pass-2 input on it: the custom-VJP chain is opaque to
                    # XLA, and without the barrier both passes' packed
                    # forwards + recompute backwards get scheduled
                    # concurrently (~7 GB of extra peak HBM -> OOM at bs=16)
                    (d1,) = sinc_vjp(g_sf)
                    x_in2, d1 = jax.lax.optimization_barrier((x_sinc, d1))
                    sf2, sinc_vjp2 = jax.vjp(
                        lambda sp: sinc_fwd_fast(sp, k_freq2, x_in2), sp0
                    )
                else:
                    sf2, sinc_vjp2 = sf, None
                rngs_adv = {"dropout": k_drop2}
                (adv_loss, (batch_stats, _)), adv_grads, g_sf2 = grad_fn_sf(
                    params_adv, batch_stats, x_in, y_a, y_b, lam, rngs_adv, sf2,
                    ext=ext,
                )
                grads = jax.tree.map(jnp.add, grads, adv_grads)
                loss = loss + adv_loss
                if sinc_vjp2 is None:
                    (d_sinc,) = sinc_vjp(g_sf + g_sf2)  # VJP linear in cotangent
                else:
                    (d2,) = sinc_vjp2(g_sf2)
                    d_sinc = jax.tree.map(jnp.add, d1, d2)
            else:
                (d_sinc,) = sinc_vjp(g_sf)
            token = jnp.ravel(
                jax.tree_util.tree_leaves(d_sinc)[0]
            )[0].astype(jnp.float32)
            d_sinc = jax.tree.map(jnp.add, grads["model"]["sinc_stream"], d_sinc)
            grads = {
                **grads, "model": {**grads["model"], "sinc_stream": d_sinc},
            }
            return loss, grads, batch_stats, rng, token

        if share_frontend:
            def sinc_fwd(sp):
                bs_c = batch_stats["sinc_stream"]
                x_c = x_in
                if tc.mixed_precision:
                    sp = cast_tree(sp, jnp.bfloat16)
                    bs_c = cast_tree(bs_c, jnp.bfloat16)
                    x_c = x_c.astype(jnp.bfloat16)
                return sinc_mod.apply(
                    {"params": sp, "batch_stats": bs_c}, x_c,
                    train=True, freq_aug=cfg.freq_aug, freeze_bn=True,
                    rngs={"freq_aug": k_freq},
                )

            sf, sinc_vjp = jax.vjp(sinc_fwd, params["model"]["sinc_stream"])
            rngs = {"dropout": k_drop}
            (loss, (batch_stats, _)), grads, g_sf = grad_fn_sf(
                params, batch_stats, x_in, y_a, y_b, lam, rngs, sf, ext=ext
            )
            params_adv = _perturb_adv(params, grads)
            rngs_adv = {"dropout": k_drop2}
            (adv_loss, (batch_stats, _)), adv_grads, g_sf2 = grad_fn_sf(
                params_adv, batch_stats, x_in, y_a, y_b, lam, rngs_adv, sf,
                ext=ext,
            )
            grads = jax.tree.map(jnp.add, grads, adv_grads)
            (d_sinc,) = sinc_vjp(g_sf + g_sf2)
            d_sinc = jax.tree.map(
                jnp.add, grads["model"]["sinc_stream"], d_sinc
            )
            grads = {
                **grads, "model": {**grads["model"], "sinc_stream": d_sinc},
            }
            return loss + adv_loss, grads, batch_stats, rng, token

        rngs = {"dropout": k_drop, "freq_aug": k_freq}
        (loss, (batch_stats, _)), grads = grad_fn(
            params, batch_stats, x_in, y_a, y_b, lam, rngs, ext=ext
        )
        if tc.use_fgm:
            params_adv = _perturb_adv(params, grads)
            rngs_adv = {"dropout": k_drop2, "freq_aug": k_freq2}
            (adv_loss, (batch_stats, _)), adv_grads = grad_fn(
                params_adv, batch_stats, x_in, y_a, y_b, lam, rngs_adv, ext=ext
            )
            grads = jax.tree.map(jnp.add, grads, adv_grads)
            loss = loss + adv_loss
        return loss, grads, batch_stats, rng, token

    def train_step(
        state: TrainState, xb: jax.Array, yb: jax.Array, wb: jax.Array = None
    ):
        """xb: (accum, micro_bs, T); yb: (accum, micro_bs); wb: (accum,) or None.

        `wb` marks valid micro-batches (1.0) vs padding (0.0).  The trailing
        partial accumulation group of an epoch is padded to `accum` and run
        with zero weights on the padding, reproducing the reference's partial
        optimizer step on the last loader batch (`src/main.py:1100`
        ``do_step = ... or (i + 1 == len(trn_loader))`` with grads still
        divided by the full accumulation_steps).
        """
        accum = xb.shape[0]
        rng, step_rng = jax.random.split(state.rng)
        if wb is None:
            wb = jnp.ones((accum,), jnp.float32)

        def body(carry, inp):
            grad_acc, batch_stats, rng, token = carry
            x, y, w = inp
            loss, grads, new_bs, rng, token = micro_step(
                state.params, batch_stats, x, y, rng, token
            )
            grads = jax.tree.map(lambda a, g: a + w * g / accum, grad_acc, grads)
            # padded micro-batches must not advance BN running stats
            batch_stats = jax.tree.map(
                lambda n, o: jnp.where(w > 0, n, o), new_bs, batch_stats
            )
            return (grads, batch_stats, rng, token), w * loss

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        # unrolling the micro-batch loop lets XLA schedule across micro-batches
        # and drops the while-loop's stacked-residual reverse in the backward;
        # accum is small (2-4) so code-size stays bounded
        (grads, batch_stats, _, _), losses = jax.lax.scan(
            body,
            (zero_grads, state.batch_stats, step_rng, jnp.zeros((), jnp.float32)),
            (xb, yb, wb),
            unroll=True,
        )

        if state.trainable_mask is not None:
            grads = apply_mask(grads, state.trainable_mask)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if state.trainable_mask is not None:
            # belt-and-braces: frozen params never move even via weight decay
            params = jax.tree.map(
                lambda new, old, m: jnp.where(m > 0, new, old),
                params, state.params, state.trainable_mask,
            )

        ema_params = state.ema_params
        if ema_params is not None:
            d = tc.ema_decay

            def ema_upd(e, p, m=1.0):
                # frozen leaves: ema starts as a copy of params
                # (TrainState.create) and the param never moves, so
                # d*e+(1-d)*p == e exactly — skip the HBM traffic.
                # Per-layer vector masks (stacked layouts): frozen lanes
                # keep e, trainable lanes average.
                if np.ndim(m) > 0:
                    keep = jnp.asarray(np.asarray(m) > 0)
                    return jnp.where(keep, d * e + (1.0 - d) * p, e)
                return d * e + (1.0 - d) * p if float(m) > 0 else e

            # reference EMA wraps the model only; loss params (OC-Softmax
            # center) stay live for scoring (torch AveragedModel(model))
            if trainable_mask is not None:
                ema_model = jax.tree.map(
                    ema_upd, ema_params["model"], params["model"],
                    trainable_mask["model"],
                )
            else:
                ema_model = jax.tree.map(ema_upd, ema_params["model"], params["model"])
            ema_params = {"model": ema_model, "loss": params.get("loss", {})}

        new_state = state.replace(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            ema_params=ema_params,
            step=state.step + 1,
            rng=rng,
        )
        metrics = {"loss": jnp.sum(losses) / jnp.maximum(jnp.sum(wb), 1.0)}
        return new_state, metrics

    return train_step


def make_eval_step(model, cfg: ExperimentConfig) -> Callable:
    """jit-able scorer: higher score => bona-fide.

    Score = logits[:, 1], or the OC-Softmax center cosine when that loss is in
    use (`/root/reference/src/main.py:978-984`).
    """
    use_oc = cfg.training.use_ocsoftmax
    use_bf16 = cfg.training.mixed_precision
    # Pallas fused res-block scoring path (flagship sinc stream only):
    # the XLA res-block stack is ~50% of inference (docs/BENCH_NOTES.md)
    use_fast_sinc = bool(cfg.model_config.get("use_pallas_resblock")) and (
        "DualStreamSEMamba" in cfg.architecture
    )
    sinc_channels = int(cfg.model_config.get("sinc_channels", 70))
    pp_micro = int(getattr(cfg.parallel, "pipeline_microbatches", 0))

    def eval_step(params, batch_stats, x):
        model_params = params["model"]
        if use_bf16:
            model_params = cast_tree(model_params, jnp.bfloat16)
            batch_stats = cast_tree(batch_stats, jnp.bfloat16)
            x = x.astype(jnp.bfloat16)
        variables = {"params": model_params, "batch_stats": batch_stats}
        wstream = (
            model_params.get("wavlm_stream")
            if isinstance(model_params, dict) else None
        )
        if wstream is not None and "layers_pipe" in wstream.get("model", {}):
            # pipeline-parallel (pp-layout) WavLM stream — functional path;
            # falls back to an in-chip sequential scan on pipe-less meshes
            from rade_tpu.nn.wavlm_pp import wavlm_features_pp
            from rade_tpu.parallel import pp as _pp

            wf = wavlm_features_pp(
                wstream, x, model.wavlm_cfg,
                mesh=_pp.active_mesh(), n_micro=pp_micro, train=False,
            )
            if use_fast_sinc:
                from rade_tpu.models.dual_stream_se_mamba import (
                    sinc_encoder_fast,
                )

                sf = sinc_encoder_fast(
                    model_params["sinc_stream"], batch_stats["sinc_stream"],
                    x, sinc_channels=sinc_channels,
                )
                feats, logits = model.apply(
                    variables, x, train=False,
                    wavlm_features=wf, sinc_features=sf,
                )
            else:
                feats, logits = model.apply(
                    variables, x, train=False, wavlm_features=wf
                )
            feats = feats.astype(jnp.float32)
            logits = logits.astype(jnp.float32)
            if use_oc:
                return L.ocsoftmax_scores(params["loss"], feats)
            return logits[:, 1]
        if use_fast_sinc:
            from rade_tpu.models.dual_stream_se_mamba import sinc_encoder_fast

            sf = sinc_encoder_fast(
                model_params["sinc_stream"], batch_stats["sinc_stream"], x,
                sinc_channels=sinc_channels,
            )
            feats, logits = model.apply(
                variables, x, train=False, sinc_features=sf
            )
        else:
            feats, logits = model.apply(variables, x, train=False)
        feats = feats.astype(jnp.float32)
        logits = logits.astype(jnp.float32)
        if use_oc:
            return L.ocsoftmax_scores(params["loss"], feats)
        return logits[:, 1]

    return eval_step
